package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** r15 adaptive hot-bucket governance (VERDICT r14 item 4): the text-side
  * banded dedup joins salt BY DEFAULT — but only after a cheap histogram
  * probe says a bucket is actually hot, so a clean corpus keeps the
  * unsalted symmetric plan and a degenerate pileup corpus completes with
  * default args instead of serializing one quadratic task. */
class DedupAdaptiveSaltSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .appName("graft-dedup-adaptive-salt-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("no hot bucket: the adaptive default preserves the unsalted plan and pair set") {
    val s = spark; import s.implicits._
    val docs = (1 to 300)
      .map(i => (i.toLong, s"unique doc $i with words ${i % 7} ${i % 11} ${i % 13}"))
      .toDF("doc_id", "text")
    val adaptive = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
    assert(!adaptive.queryExecution.executedPlan.toString.contains("__salt"),
      "a clean corpus must keep the unsalted symmetric join")
    val base = Dedup.minhashCandidatePairs(docs, "doc_id", "text", maxBucket = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val got = adaptive.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === base, "adaptive (unsalted branch) must emit the identical pair set")
    // simhash: same discipline
    val shAdaptive = Dedup.simhashCandidatePairs(docs, "doc_id", "text")
    assert(!shAdaptive.queryExecution.executedPlan.toString.contains("__salt"))
    val shBase = Dedup.simhashCandidatePairs(docs, "doc_id", "text", maxBucket = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(shAdaptive.select("id_a", "id_b").as[(Long, Long)].collect().toSet === shBase)
  }

  test("a beyond-threshold identical-band class completes with DEFAULT args, pair set exact") {
    val s = spark; import s.implicits._
    // 5000 identical docs — one signature class, every band the same
    // bucket, population > DefaultHotBucket (4096): the r14 default would
    // put the whole 12.5M-pair clique in one task; the adaptive default
    // must take the salted plan and still emit every clique pair exactly
    // once (first-collision reporting is candidate-preserving)
    val n = 5000
    assert(n > Dedup.DefaultHotBucket)
    val docs = ((1 to n).map(i => (i.toLong, "the same boilerplate text block")) ++
      (n + 1 to n + 40).map(i => (i.toLong, s"unique tail doc $i ${i % 5}")))
      .toDF("doc_id", "text")
    val adaptive = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
      numHashes = 16, bands = 2)
    assert(adaptive.queryExecution.executedPlan.toString.contains("__salt"),
      "a hot bucket must flip the adaptive default to the salted plan")
    val cliquePairs = adaptive
      .where(col("id_a") <= n && col("id_b") <= n).count()
    assert(cliquePairs === n.toLong * (n - 1) / 2,
      "every within-class pair must surface exactly once under salting")
  }
}
