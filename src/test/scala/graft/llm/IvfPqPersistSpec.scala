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
