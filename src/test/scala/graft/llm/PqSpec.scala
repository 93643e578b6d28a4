package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization ANN: codebook determinism, code identity for
  * identical vectors, the m-byte compression contract, planted-copy
  * recovery through ADC scoring, and a recall floor vs brute force. */
class PqSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .appName("graft-pq-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("pqTrain is deterministic and shaped m x ksub x dim/m") {
    val a = Ann.pqTrain(emb, m = 8, ksub = 16, sampleN = 128)
    val b = Ann.pqTrain(emb.repartition(7), m = 8, ksub = 16, sampleN = 128)
    assert(a.length === 8)
    assert(a.forall(cb => cb.length === 16 && cb.forall(_.length === 8)))
    for (j <- a.indices; c <- a(j).indices)
      assert(java.util.Arrays.equals(a(j)(c), b(j)(c)),
        s"codebook ($j,$c) differs across partitionings")
  }

  test("identical vectors get identical m-byte codes") {
    val s = spark; import s.implicits._
    val cb = Ann.pqTrain(emb, m = 8, ksub = 16, sampleN = 128)
    val copies = emb.where(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val codes = Ann.pqEncode(emb.select("vec_id", "embedding").unionAll(copies), cb)
      .as[(Long, Array[Byte])].collect().toMap
    assert(codes.values.forall(_.length === 8), "code must be m = 8 bytes")
    for ((id, code) <- codes if id >= 100000)
      assert(java.util.Arrays.equals(code, codes(id - 100000)),
        s"copy $id code differs from original")
  }

  test("planted exact copies rank their original in the ADC top-10") {
    val copies = emb.where(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val corpus = emb.select("vec_id", "embedding").unionAll(copies)
    val top = Ann.pqTopK(copies, corpus, k = 10, ksub = 64)
      .where(col("c_id") === col("q_id") - 100000)
    val nq = copies.count()
    assert(top.count() === nq, s"every one of the $nq planted copies must recover its original")
  }

  test("codes round-trip parquet and decode to better-than-zero reconstructions") {
    val s = spark; import s.implicits._
    val cb = Ann.pqTrain(emb, m = 8, ksub = 16, sampleN = 128)
    val out = java.nio.file.Files.createTempDirectory("pqcodes").toString
    Ann.pqEncode(emb, cb).write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    // at-rest codes are 8 bytes/vector (32x smaller than 64 floats)
    assert(back.schema("pq_code").dataType === org.apache.spark.sql.types.BinaryType)
    val joined = Ann.pqDecode(back, cb)
      .withColumnRenamed("embedding", "recon")
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      .as[(Long, Array[Float], Array[Float])].collect()
    assert(joined.length === emb.count())
    // mean squared reconstruction error must beat the zero-vector baseline
    // (i.e. the codebooks carry real signal), per vector
    var worse = 0
    joined.foreach { case (_, recon, orig) =>
      var errQ = 0.0; var errZ = 0.0; var i = 0
      while (i < orig.length) {
        val d = orig(i) - recon(i); errQ += d * d
        errZ += orig(i).toDouble * orig(i); i += 1
      }
      if (errQ >= errZ) worse += 1
    }
    assert(worse === 0, s"$worse vectors reconstruct no better than the zero vector")
  }

  test("IVF-PQ: planted copies recover their original; deterministic under repartition") {
    val copies = emb.where(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val corpus = emb.select("vec_id", "embedding").unionAll(copies)
    // identical vector -> identical coarse cell AND identical residual
    // code, and the query probes its own cell first: the original must
    // appear in the ADC top-10
    val top = Ann.ivfPqTopK(copies, corpus, k = 10)
      .where(col("c_id") === col("q_id") - 100000)
    assert(top.count() === copies.count())
    val s = spark; import s.implicits._
    val a = Ann.ivfPqTopK(copies, corpus.repartition(3), k = 3)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    val b = Ann.ivfPqTopK(copies, corpus.repartition(11), k = 3)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(a === b, "IVF-PQ results must be partitioning-independent")
  }

  test("IVF-PQ index persists partitionBy(cell); search prunes to probe partitions") {
    val s = spark; import s.implicits._
    val model = Ann.ivfPqTrain(emb, nlist = 16, m = 8, ksub = 64, sampleN = 512)
    val codes = Ann.ivfPqEncode(model, emb)
    val path = java.nio.file.Files.createTempDirectory("ivfpq").toString
    codes.write.mode("overwrite").partitionBy("cell").parquet(path)
    val onDisk = spark.read.parquet(path)
      .select(col("vec_id"), col("cell").cast("int"), col("pq_code"))
    val queries = emb.where(col("vec_id") % 100 === 0)
    val fromDisk = Ann.ivfPqSearch(model, onDisk, queries, k = 5)
    // probe-union filter reaches the partitioned scan, not a row filter
    val plan = fromDisk.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"cell IN (probes) must prune partitions; plan:\n${plan.take(2000)}")
    val inMem = Ann.ivfPqSearch(model, codes, queries, k = 5)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    val disk = fromDisk
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(disk === inMem, "at-rest index search must equal in-memory search")
  }

  test("ADC recall@10 vs brute force clears the floor") {
    val queries = emb.where(col("vec_id") % 50 === 0)
    val exact = Ann.bruteForceTopK(queries, emb, 10).select("q_id", "c_id")
    val pq = Ann.pqTopK(queries, emb, 10, ksub = 64).select("q_id", "c_id")
    val hits = exact.join(pq, Seq("q_id", "c_id"), "left_semi").count()
    val total = exact.count()
    assert(total > 0)
    val recall = hits.toDouble / total
    assert(recall >= 0.25, f"recall@10 $recall%.3f below floor 0.25")
  }
}
