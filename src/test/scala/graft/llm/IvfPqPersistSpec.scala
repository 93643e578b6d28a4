package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** IVF-PQ index at rest: model round-trips exactly, search from the
  * persisted index returns the in-memory search's pairs, and the
  * probe-union cell filter lands as PARTITION PRUNING on the loaded
  * codes — the property that makes query cost independent of corpus
  * size at rest. */
class IvfPqPersistSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var idx: java.nio.file.Path = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .appName("graft-ivfpq-persist-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    idx = java.nio.file.Files.createTempDirectory("ivfpq_persist_spec")
  }

  override def afterAll(): Unit = {
    if (idx != null) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(idx).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    if (spark != null) spark.stop()
  }

  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("write/load round-trips the model and codes exactly") {
    val model = Ann.ivfPqTrain(emb)
    val codes = Ann.ivfPqEncode(model, emb)
    Ann.ivfPqWriteIndex(model, codes, idx.toString)
    val (m2, c2) = Ann.ivfPqLoadIndex(spark, idx.toString)
    assert(m2.cents.length === model.cents.length)
    for (c <- model.cents.indices)
      assert(java.util.Arrays.equals(m2.cents(c), model.cents(c)),
        s"centroid $c differs after round-trip")
    assert(m2.codebooks.length === model.codebooks.length)
    for (j <- model.codebooks.indices; k <- model.codebooks(j).indices)
      assert(java.util.Arrays.equals(m2.codebooks(j)(k), model.codebooks(j)(k)),
        s"codeword ($j,$k) differs after round-trip")
    val s = spark; import s.implicits._
    val before = codes.as[(Long, Int, Array[Byte])].collect()
      .map { case (id, cell, code) => (id, cell, code.toSeq) }.toSet
    val after = c2.as[(Long, Int, Array[Byte])].collect()
      .map { case (id, cell, code) => (id, cell, code.toSeq) }.toSet
    assert(after === before)
  }

  test("search from the persisted index equals the in-memory search") {
    val model = Ann.ivfPqTrain(emb)
    val codes = Ann.ivfPqEncode(model, emb)
    val (m2, c2) = Ann.ivfPqLoadIndex(spark, idx.toString)
    val panel = emb.where(col("vec_id") < 50)
    val mem = Ann.ivfPqSearch(model, codes, panel, 5)
      .select("q_id", "c_id", "rank").collect().map(_.toSeq).toSet
    val disk = Ann.ivfPqSearch(m2, c2, panel, 5)
      .select("q_id", "c_id", "rank").collect().map(_.toSeq).toSet
    assert(disk === mem)
  }

  test("frozen-model append: search equals a full rebuild under the same model") {
    val s = spark; import s.implicits._
    val base = emb.where(col("vec_id") % 2 === 0)
    val delta = emb.where(col("vec_id") % 2 === 1)
    val dir2 = java.nio.file.Files.createTempDirectory("ivfpq_append_spec")
    try {
      // build + persist on the BASE half only; the model freezes here
      val model = Ann.ivfPqTrain(base)
      Ann.ivfPqWriteIndex(model, Ann.ivfPqEncode(model, base), dir2.toString)
      // daily-ingest twin: append the delta with the index's own model
      Ann.ivfPqAppendIndex(spark, dir2.toString, delta)
      val (mA, cA) = Ann.ivfPqLoadIndex(spark, dir2.toString)
      // the rebuilt-from-scratch comparison uses the SAME frozen model
      val full = Ann.ivfPqEncode(model, emb)
      val panel = emb.where(col("vec_id") < 50)
      val appended = Ann.ivfPqSearch(mA, cA, panel, 5)
        .select("q_id", "c_id", "rank").collect().map(_.toSeq).toSet
      val rebuilt = Ann.ivfPqSearch(model, full, panel, 5)
        .select("q_id", "c_id", "rank").collect().map(_.toSeq).toSet
      assert(appended === rebuilt,
        "append-then-search must equal full-rebuild-then-search under a frozen model")
      // the appended rows landed INSIDE the existing cell partition layout
      // (pruning stays oblivious to append count)
      val cells = cA.select("cell").distinct().as[Int].collect().toSet
      val deltaCells = Ann.ivfPqEncode(model, delta)
        .select("cell").distinct().as[Int].collect().toSet
      assert(deltaCells.subsetOf(cells))
      val plan = Ann.ivfPqSearch(mA, cA, emb.where(col("vec_id") < 10), 5)
        .queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(l => l.contains("PartitionFilters") && l.contains("cell")),
        "appended index must still prune by cell partition")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir2).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("probe-union filter prunes partitions on the loaded index") {
    val (m2, c2) = Ann.ivfPqLoadIndex(spark, idx.toString)
    val panel = emb.where(col("vec_id") < 10)
    val plan = Ann.ivfPqSearch(m2, c2, panel, 5)
      .queryExecution.executedPlan.toString
    // the codes scan must carry the cell filter as a PartitionFilter
    // (pruned directories), not a post-scan row filter
    val scanLine = plan.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("cell"))
    assert(scanLine.isDefined,
      s"expected a cell PartitionFilter on the codes scan, got:\n$plan")
    assert(scanLine.get.contains("cell") && scanLine.get.toLowerCase.contains("in"),
      s"partition filter should be the probe-union IN list: ${scanLine.get}")
  }
}
