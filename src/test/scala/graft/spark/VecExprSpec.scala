package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Native vec_dot / vec_norm scoring expressions: value semantics match
  * the UDF kernels (min-length dot, L2 norm), nulls propagate, non-float
  * arrays cast, and plans carry no UDF node. */
class VecExprSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", false)
      .appName("graft-vec-expr").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    VecExpressions.ensureRegistered(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def one(sql: String): Any = spark.sql(sql).collect()(0).get(0)

  test("dot and norm match hand values; min-length and null semantics") {
    assert(one("SELECT vec_dot(array(1.0F, 2.0F, 3.0F), array(4.0F, 5.0F, 6.0F))") === 32.0)
    // length mismatch: shorter length wins (the UDF kernel's contract)
    assert(one("SELECT vec_dot(array(1.0F, 2.0F, 3.0F), array(10.0F))") === 10.0)
    assert(one("SELECT vec_norm(array(3.0F, 4.0F))") === 5.0)
    assert(one("SELECT vec_norm(array())") === 0.0)
    assert(one("SELECT vec_dot(CAST(NULL AS ARRAY<FLOAT>), array(1.0F))") === null)
    // int arrays cast to float transparently
    assert(one("SELECT vec_dot(array(1, 2), array(3, 4))") === 11.0)
  }

  test("vec_srp_packed is bit-identical to the lambda-chain signature") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for (bits <- Seq(8, 12)) {
      val both = emb.select(
        graft.llm.Ann.packBits(graft.llm.Ann.srpSignature(col("embedding"), bits), bits)
          .as("lambda"),
        call_function("vec_srp_packed", col("embedding"), lit(bits), lit(42)).as("native"))
      assert(both.where(col("lambda") =!= col("native")).count() === 0,
        s"bits=$bits: native SRP diverges from the lambda chain")
    }
    // constant-argument contract
    val e = intercept[Exception] {
      spark.sql("SELECT vec_srp_packed(array(1.0F), CAST(rand()*8 AS INT), 42)")
    }
    assert(e.getMessage.contains("bits must be a constant"))
  }

  test("ensureRegistered never clobbers a user-registered vec_* function") {
    val s2 = spark.newSession()
    // user claims vec_dot first with their own semantics (always 99.0)
    s2.udf.register("vec_dot", (_: Array[Float], _: Array[Float]) => 99.0)
    VecExpressions.ensureRegistered(s2)
    assert(s2.sql("SELECT vec_dot(array(1.0F), array(2.0F))")
      .collect()(0).get(0) === 99.0, "user's vec_dot was clobbered")
    // the library's internal name still resolves to the native kernel
    assert(s2.sql(s"SELECT ${VecExpressions.InternalDot}(array(1.0F, 2.0F), array(3.0F, 4.0F))")
      .collect()(0).get(0) === 11.0)
    // and on a fresh session the public alias is claimed as usual
    val s3 = spark.newSession()
    VecExpressions.ensureRegistered(s3)
    assert(s3.sql("SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F))")
      .collect()(0).get(0) === 11.0)
  }

  test("no UDF node in a vec-scored plan") {
    val plan = spark.sql(
      "SELECT vec_dot(a, b) / (vec_norm(a) * vec_norm(b)) FROM " +
        "(SELECT array(1.0F, 2.0F) AS a, array(3.0F, 4.0F) AS b)")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
  }
}
