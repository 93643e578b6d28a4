package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** [[FanOut.small]] must widen small single-task inputs to the session's
  * shuffle parallelism and — the 100-TB contract — pass anything over the
  * byte gate through UNTOUCHED, so it can never introduce a corpus-sized
  * shuffle. */
class FanOutSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .appName("graft-fanout").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("small input fans out to the session shuffle parallelism") {
    val s = spark; import s.implicits._
    val df = (1 to 100).toDF("x").coalesce(1)
    assert(df.rdd.getNumPartitions == 1)
    val fanned = FanOut.small(df)
    assert(fanned ne df)
    assert(fanned.rdd.getNumPartitions == 4)
    assert(fanned.as[Int].collect().sorted === (1 to 100).toArray)
  }

  test("inputs over the byte gate pass through untouched") {
    val s = spark; import s.implicits._
    val df = (1 to 100).toDF("x").coalesce(1)
    spark.conf.set("spark.graft.fanout.maxBytes", "1")
    try assert(FanOut.small(df) eq df)
    finally spark.conf.unset("spark.graft.fanout.maxBytes")
  }

  test("maxBytes=0 disables the fan-out entirely") {
    val s = spark; import s.implicits._
    val df = (1 to 100).toDF("x").coalesce(1)
    spark.conf.set("spark.graft.fanout.maxBytes", "0")
    try assert(FanOut.small(df) eq df)
    finally spark.conf.unset("spark.graft.fanout.maxBytes")
  }

  test("a malformed maxBytes conf falls back to the default gate, not a throw") {
    val s = spark; import s.implicits._
    val df = (1 to 100).toDF("x").coalesce(1)
    spark.conf.set("spark.graft.fanout.maxBytes", "not-a-number")
    // default 32 MB gate applies: the tiny frame still fans out
    try assert(FanOut.small(df).rdd.getNumPartitions == 4)
    finally spark.conf.unset("spark.graft.fanout.maxBytes")
  }

  test("a failed stats probe passes the frame through untouched") {
    val s = spark; import s.implicits._
    // a streaming source has no optimizedPlan stats outside a query —
    // resolving it throws inside FanOut's probe, which must fall back to
    // pass-through rather than failing the caller
    val stream = spark.readStream.format("rate").load()
    assert(FanOut.small(stream) eq stream)
  }
}
