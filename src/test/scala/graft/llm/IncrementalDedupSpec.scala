package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Incremental near-dedup against a persisted band index: exact copies
  * always flag, the batch check agrees with the cross-corpus LSH pairs,
  * and a bucketed at-rest index joins with ONLY the batch side
  * shuffling — the 100-TB contract (the corpus text is never re-read,
  * the index never re-shuffles). */
class IncrementalDedupSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    val wh = Files.createTempDirectory("graft_warehouse_inc").toString
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", false)
      .appName("graft-incdedup-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs = spark.read.parquet(s"$dir/documents.parquet")
    .where(length(trim(col("text"))) > 0)

  test("exact copies of indexed docs are flagged dup; fresh-token docs mostly novel") {
    val s = spark; import s.implicits._
    val index = Dedup.bandIndex(docs, "doc_id", "text", numHashes = 64, bands = 4)
    val copies = docs.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val res = Dedup.nearDupAgainstIndex(copies, index, "doc_id", "text",
      numHashes = 64, bands = 4)
    assert(res.count() === copies.count())
    // an exact copy collides in EVERY band, and its original is indexed
    val notDup = res.where(!col("dup")).count()
    assert(notDup === 0, s"$notDup exact copies escaped the index check")
    // dup_of is an indexed doc, never a batch doc
    val badRef = res.where(col("dup_of") >= 1000000L).count()
    assert(badRef === 0)
  }

  test("batch check agrees with the cross-corpus LSH pair set") {
    val s = spark; import s.implicits._
    val batch = docs.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val index = Dedup.bandIndex(docs, "doc_id", "text", numHashes = 64, bands = 4)
    val viaIndex = Dedup.nearDupAgainstIndex(batch, index, "doc_id", "text",
        numHashes = 64, bands = 4)
      .where(col("dup")).select("doc_id").as[Long].collect().toSet
    val viaCross = Dedup.minhashCrossPairs(batch, docs, "doc_id", "text",
        numHashes = 64, bands = 4)
      .select("id_a").as[Long].collect().toSet
    assert(viaIndex === viaCross,
      "index-based dup set must equal the cross-corpus LSH collision set")
  }

  test("bucketed at-rest index joins with one exchange (batch side only)") {
    Dedup.bandIndex(docs, "doc_id", "text", numHashes = 64, bands = 4)
      .write.mode("overwrite").bucketBy(8, "band", "bucket")
      .saveAsTable("corpus_band_index")
    val index = spark.table("corpus_band_index")
    val batch = docs.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val res = Dedup.nearDupAgainstIndex(batch, index, "doc_id", "text",
        numHashes = 64, bands = 4)
      val plan = res.queryExecution.executedPlan.toString
      // the (band, bucket) join must not re-shuffle the bucketed index:
      // no Exchange may sit between the index table's scan and the join
      val scanIdx = plan.indexOf("corpus_band_index")
      assert(scanIdx >= 0, s"index scan missing from plan:\n$plan")
      val above = plan.substring(0, scanIdx)
      val joinIdx = above.lastIndexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a sort-merge join over the index:\n$plan")
      // walk the plan text between the join and the index scan along the
      // index side: the scan is the LAST child printed, so the segment
      // after the BATCH subtree must hold no Exchange feeding the scan
      val segment = plan.substring(joinIdx, scanIdx)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(segment).size
      assert(exchanges === 1,
        s"expected exactly one exchange (batch side) between join and index scan, got $exchanges:\n$segment")
      assert(res.where(col("dup")).count() === batch.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
