package graft.spark

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .appName("graft-asof-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)

  test("asof join picks the latest right row at-or-before, per key") {
    val s = spark; import s.implicits._
    val left = Seq(
      (1L, 10L, ts(100)),   // after r@50 and r@100 -> ties inclusive: r@100
      (2L, 10L, ts(99)),    // between r@50 and r@100 -> r@50
      (3L, 10L, ts(10)),    // before any right row -> null
      (4L, 20L, ts(500)),   // other user -> its own r@400
      (5L, 30L, ts(500))    // user with no right rows at all -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts(50), 1.5), (10L, ts(100), 2.5), (10L, ts(101), 9.9),
      (20L, ts(400), 7.0)
    ).toDF("user_id", "ts", "pval")
    val got = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", Seq("pval"))
      .select("event_id", "asof_ts", "asof_pval")
      .as[(Long, Option[Timestamp], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((Some(ts(100)), Some(2.5))), "equal ts matches (>= semantics)")
    assert(got(2L) === ((Some(ts(50)), Some(1.5))))
    assert(got(3L) === ((None, None)), "no right row at-or-before")
    assert(got(4L) === ((Some(ts(400)), Some(7.0))))
    assert(got(5L) === ((None, None)), "left-join: unmatched key survives with nulls")
    assert(got.size === 5, "every left row survives exactly once")
  }

  test("asof join tolerance nulls out stale matches but keeps the row") {
    val s = spark; import s.implicits._
    val left = Seq((1L, 10L, ts(1000)), (2L, 10L, ts(2000))).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, ts(900), 4.0)).toDF("user_id", "ts", "pval")
    val got = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", Seq("pval"),
        toleranceSeconds = 200L)
      .select("event_id", "asof_pval").as[(Long, Option[Double])].collect().toMap
    assert(got(1L) === Some(4.0), "within tolerance (100 s <= 200 s)")
    assert(got(2L) === None, "stale match (1100 s) nulled, row kept")
  }

  test("asof join matches a brute-force reference on random data") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(12021)
    val leftRows = (1L to 300L).map(i =>
      (i, (rnd.nextInt(20) + 1).toLong, ts(rnd.nextInt(1000).toLong)))
    // unique (key, ts) on the right, as the contract requires
    val rightRows = rnd.shuffle((1 to 20).flatMap { u =>
      rnd.shuffle((0 until 1000).toList).take(30).map(t =>
        (u.toLong, ts(t.toLong), rnd.nextDouble()))
    }.toList)
    val got = AsofJoin.asofJoin(
        leftRows.toDF("event_id", "user_id", "ts"),
        rightRows.toDF("user_id", "ts", "pval"),
        Seq("user_id"), "ts", Seq("pval"))
      .select("event_id", "asof_ts", "asof_pval")
      .as[(Long, Option[Timestamp], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val byKey = rightRows.groupBy(_._1)
    for ((id, u, lts) <- leftRows) {
      val expect = byKey.getOrElse(u, Nil)
        .filter(!_._2.after(lts))
        .sortBy(_._2.getTime).lastOption
      assert(got(id) === ((expect.map(_._2), expect.map(_._3))),
        s"event $id user $u ts $lts")
    }
  }

  test("forward asof join picks the earliest right at-or-after, brute-force checked") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(90412)
    val leftRows = (1L to 200L).map(i =>
      (i, (rnd.nextInt(10) + 1).toLong, ts(rnd.nextInt(800).toLong)))
    val rightRows = (1 to 10).flatMap { u =>
      rnd.shuffle((0 until 800).toList).take(20).map(t =>
        (u.toLong, ts(t.toLong), rnd.nextDouble()))
    }
    val got = AsofJoin.asofJoin(
        leftRows.toDF("event_id", "user_id", "ts"),
        rightRows.toDF("user_id", "ts", "pval"),
        Seq("user_id"), "ts", Seq("pval"), forward = true)
      .select("event_id", "asof_ts", "asof_pval")
      .as[(Long, Option[Timestamp], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val byKey = rightRows.groupBy(_._1)
    for ((id, u, lts) <- leftRows) {
      val expect = byKey.getOrElse(u, Nil)
        .filter(!_._2.before(lts))
        .sortBy(_._2.getTime).headOption
      assert(got(id) === ((expect.map(_._2), expect.map(_._3))),
        s"event $id user $u ts $lts")
    }
    // forward tolerance: matches farther ahead than the bound null out
    val fGot = AsofJoin.asofJoin(
        Seq((1L, 10L, ts(100))).toDF("event_id", "user_id", "ts"),
        Seq((10L, ts(400), 3.0)).toDF("user_id", "ts", "pval"),
        Seq("user_id"), "ts", Seq("pval"), toleranceSeconds = 60L, forward = true)
      .select("event_id", "asof_pval").as[(Long, Option[Double])].collect().toMap
    assert(fGot(1L) === None, "match 300 s ahead exceeds the 60 s bound")
  }

  test("asof join applies SQL null semantics for keys and timestamps") {
    val s = spark; import s.implicits._
    val left = Seq(
      (1L, Some(10L), Some(ts(100))),   // normal match
      (2L, None, Some(ts(100))),        // null key -> unmatched, row kept
      (3L, Some(10L), None),            // null ts  -> unmatched, row kept
      (4L, Some(10L), Some(ts(40)))     // before every VALID right -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Some(10L), Some(ts(50)), 1.0),
      (None, Some(ts(10)), 666.0),      // null key: must never match
      (Some(10L), None, 777.0)          // null ts: value must never leak
    ).toDF("user_id", "ts", "pval")
    val got = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", Seq("pval"))
      .select("event_id", "asof_ts", "asof_pval")
      .as[(Long, Option[Timestamp], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size === 4, "every left row survives, including null ones")
    assert(got(1L) === ((Some(ts(50)), Some(1.0))))
    assert(got(2L) === ((None, None)), "null key matches nothing")
    assert(got(3L) === ((None, None)), "null left ts matches nothing")
    assert(got(4L) === ((None, None)),
      "null-ts right value must not leak into pre-right lefts")
  }

  test("asof join tolerance is exact at sub-second resolution") {
    val s = spark; import s.implicits._
    def tms(msec: Long) = new Timestamp(1700000000000L + msec)
    val left = Seq((1L, 10L, tms(1900)), (2L, 10L, tms(990))).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, tms(0), 4.0)).toDF("user_id", "ts", "pval")
    val got = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", Seq("pval"),
        toleranceSeconds = 1L)
      .select("event_id", "asof_pval").as[(Long, Option[Double])].collect().toMap
    assert(got(1L) === None, "1.9 s gap exceeds 1 s (whole-second floor would pass it)")
    assert(got(2L) === Some(4.0), "0.99 s gap is within 1 s")
  }

  test("asof join plan is one key-shuffle window pass, no join operator") {
    val s = spark; import s.implicits._
    val left = (1L to 50L).map(i => (i, i % 5, ts(i))).toDF("event_id", "user_id", "ts")
    val right = (1L to 50L).map(i => (i % 5, ts(i * 2), i.toDouble)).toDF("user_id", "ts", "pval")
    val plan = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", Seq("pval"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), "no join operator — union + window carry")
    assert(plan.contains("Window"), "the carry is a window pass")
  }
}
