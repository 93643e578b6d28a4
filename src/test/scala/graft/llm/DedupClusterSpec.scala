package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components cluster resolution over dup-pair graphs:
  * transitive closure, min-id labels, representative selection. */
class DedupClusterSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .appName("graft-dedup-cluster-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def pairsDf(pairs: (Long, Long)*) = {
    val s = spark; import s.implicits._
    pairs.toDF("id_a", "id_b")
  }

  private def components(pairs: (Long, Long)*): Map[Long, Long] =
    Dedup.connectedComponents(pairsDf(pairs: _*)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain propagates the min label across its full diameter") {
    // 9-8, 8-7, ..., 1-0: diameter 9 forces multiple propagation rounds
    val chain = (1L to 9L).map(i => (i - 1, i))
    val got = components(chain: _*)
    assert(got === (0L to 9L).map(_ -> 0L).toMap)
  }

  test("two cliques merge through a single bridge edge") {
    val cliqueA = Seq((10L, 11L), (10L, 12L), (11L, 12L))
    val cliqueB = Seq((20L, 21L), (20L, 22L), (21L, 22L))
    val separate = components(cliqueA ++ cliqueB: _*)
    assert(separate === Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
    val bridged = components(cliqueA ++ cliqueB :+ ((12L, 20L)): _*)
    assert(bridged === Seq(10L, 11L, 12L, 20L, 21L, 22L).map(_ -> 10L).toMap)
  }

  test("pair order and multiplicity do not matter") {
    val got = components((5L, 3L), (3L, 5L), (5L, 3L), (4L, 5L))
    assert(got === Map(3L -> 3L, 4L -> 3L, 5L -> 3L))
  }

  test("dedupByPairs keeps one representative per cluster plus all singletons") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "c"), (6L, "c"))
      .toDF("doc_id", "text")
    val pairs = Dedup.exactDupPairs(docs, "doc_id", "text")
    val kept = Dedup.dedupByPairs(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 4L, 5L)) // min of {1,2,3}, singleton 4, min of {5,6}
  }

  test("dedupByPairsBest keeps the highest-scoring doc per cluster, id tie-break") {
    val s = spark; import s.implicits._
    // cluster {1,2,3}: scores 5,9,9 -> winner 2 (score desc, id asc);
    // singleton 4 always kept; cluster {5,6}: scores 1,7 -> winner 6
    val docs = Seq((1L, "a", 5L), (2L, "a", 9L), (3L, "a", 9L),
      (4L, "b", 0L), (5L, "c", 1L), (6L, "c", 7L))
      .toDF("doc_id", "text", "score")
    val pairs = Dedup.exactDupPairs(docs, "doc_id", "text")
    val kept = Dedup.dedupByPairsBest(docs, "doc_id", pairs, "score")
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(2L, 4L, 6L))
    // deterministic under repartitioning
    val again = Dedup.dedupByPairsBest(docs.repartition(5), "doc_id",
        Dedup.exactDupPairs(docs.repartition(5), "doc_id", "text"), "score")
      .select("doc_id").as[Long].collect().sorted
    assert(again === kept)
  }

  test("random graphs match an in-memory union-find (deterministic seed)") {
    val rnd = new scala.util.Random(0xD5EF)
    for (_ <- 1 to 3) {
      val n = 80
      val edges = Seq.fill(100)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // in-memory union-find oracle
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(Math.max(ra, rb)) = Math.min(ra, rb)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> {
          // component min among nodes that appear in edges
          val root = find(id.toInt)
          edges.flatMap(e => Seq(e._1, e._2)).filter(v => find(v.toInt) == root).min
        }).toMap
      assert(components(edges: _*) === want)
    }
  }

  test("empty pair set resolves to an empty label table and keeps every doc") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val noPairs = pairsDf()
    assert(Dedup.connectedComponents(noPairs).count() === 0)
    assert(Dedup.dedupByPairs(docs, "doc_id", noPairs).count() === 2)
  }

  test("text-side hot-bucket salting is candidate-preserving (minhash + simhash)") {
    val s = spark; import s.implicits._
    // a boilerplate pileup (many identical docs -> one signature class per
    // band) plus a varied tail; salted and unsalted pair sets must agree
    val docs = ((1 to 120).map(i => (i.toLong, "the same boilerplate text block")) ++
      (121 to 200).map(i => (i.toLong, s"unique doc $i with words ${i % 7} ${i % 11}")))
      .toDF("doc_id", "text")
    val mUnsalted = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val mSalted = Dedup.minhashCandidatePairs(docs, "doc_id", "text", maxBucket = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(mUnsalted.nonEmpty && mSalted === mUnsalted,
      "salted minhash banding must emit the identical pair set")
    // the pileup class is a full clique, each pair exactly once
    assert(mSalted.count { case (a, b) => a <= 120 && b <= 120 } === 120 * 119 / 2)
    val sUnsalted = Dedup.simhashCandidatePairs(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sSalted = Dedup.simhashCandidatePairs(docs, "doc_id", "text", maxBucket = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sUnsalted.nonEmpty && sSalted === sUnsalted,
      "salted simhash blocking must emit the identical pair set")
  }
}
