package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .appName("graft-rangejoin-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("interval join matches brute force, including giant-interval broadcast path") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(40812)
    val pts = (1L to 500L).map(i => (i, rnd.nextLong() % 10000L))
    // mixed widths: mostly short spans, a few giant ones that exceed the
    // 8-bin cap at binWidth=50 and must take the broadcast path
    val ivs = (1L to 120L).map { i =>
      val lo = rnd.nextLong() % 10000L
      val span = if (i % 25 == 0) 3000L + rnd.nextInt(2000) else rnd.nextInt(120).toLong
      (i, lo, lo + span)
    }
    val got = RangeJoin.intervalJoin(
        pts.toDF("pid", "p"), "p",
        ivs.toDF("iid", "lo", "hi"), "lo", "hi",
        binWidth = 50L, maxBinsPerInterval = 8)
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    val expect = (for {
      (pid, p) <- pts
      (iid, lo, hi) <- ivs
      if p >= lo && p <= hi
    } yield (pid, iid)).sorted
    assert(got.length === expect.length, "pair count (exactly-once per pair)")
    assert(got === expect.toArray)
    assert(expect.nonEmpty, "test data must produce matches")
  }

  test("interval join handles negative values with exact floor binning") {
    val s = spark; import s.implicits._
    val pts = Seq((1L, -101L), (2L, -100L), (3L, -1L), (4L, 0L), (5L, 49L)).toDF("pid", "p")
    val ivs = Seq((10L, -150L, -100L), (11L, -50L, 0L), (12L, 0L, 60L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.intervalJoin(pts, "p", ivs, "lo", "hi", binWidth = 50L)
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    assert(got === Array((1L, 10L), (2L, 10L), (3L, 11L), (4L, 11L), (4L, 12L), (5L, 12L)))
  }

  test("interval join drops inverted intervals instead of exploding a descending sequence") {
    val s = spark; import s.implicits._
    val pts = Seq((1L, 10L)).toDF("pid", "p")
    // hi far below lo: would be a ~1e8-element descending sequence if the
    // inverted guard were missing
    val ivs = Seq((1L, 0L, 20L), (2L, 1000000000L, 5L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.intervalJoin(pts, "p", ivs, "lo", "hi", binWidth = 10L)
      .select("pid", "iid").as[(Long, Long)].collect()
    assert(got === Array((1L, 1L)))
  }

  test("interval join plan is a single equi-join on the bin key") {
    val s = spark; import s.implicits._
    val pts = (1L to 100L).map(i => (i, i * 3)).toDF("pid", "p")
    val ivs = (1L to 40L).map(i => (i, i * 7, i * 7 + 20)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.intervalJoin(pts, "p", ivs, "lo", "hi", binWidth = 16L)
      .queryExecution.executedPlan.toString
    // the short side must be an equi (hash/sort-merge) join keyed on the
    // bin, never a cartesian/BNLJ; the giant-interval side is the only
    // nested-loop and it is broadcast
    assert(!plan.contains("CartesianProduct"), "no cartesian product anywhere")
    val bnlj = "BroadcastNestedLoopJoin"
    assert(plan.indexOf(bnlj) === plan.lastIndexOf(bnlj),
      "at most one BNLJ (the bounded giant-interval broadcast)")
  }
}
