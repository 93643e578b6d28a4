package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.spark.{AsofJoin, RangeJoin}

/**
 * Bulk differential fuzzer for the as-of and interval joins: random
 * inputs checked against exact brute-force references — the same algebra
 * the CI specs run on a handful of seeds, here on hundreds with harsher
 * generators (duplicate point/left timestamps, intervals straddling the
 * bin width and the giant-interval cutoff, negative domains, empty
 * sides, single-key pileups so one partition holds everything).
 *
 * Usage: runMain graft.tools.FuzzJoins [nSeeds]
 */
object FuzzJoins {
  def main(args: Array[String]): Unit = {
    val nSeeds = args.lift(0).map(_.toInt).getOrElse(300)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    var failures = 0
    for (seed <- 1 to nSeeds) {
      val rnd = new scala.util.Random(seed)

      // ---------------------------------------------------------- as-of
      val nKeys = 1 + rnd.nextInt(4) // small: forces per-key pileups
      val nL = rnd.nextInt(40)
      val nR = rnd.nextInt(40)
      def t(s: Long) = new Timestamp(1700000000000L + s * 1000L)
      // unique (key, ts) rights per the contract; ~10% nulls planted in
      // keys and timestamps on BOTH sides (null never matches; null left
      // rows still emit — the review-found value-leak class)
      def nk(k: Long): Option[Long] = if (rnd.nextInt(10) == 0) None else Some(k)
      def nt(ts: Timestamp): Option[Timestamp] =
        if (rnd.nextInt(10) == 0) None else Some(ts)
      val rights = rnd.shuffle((1 to nKeys).flatMap { k =>
        rnd.shuffle((0 until 200).toList).take(nR / nKeys.max(1)).map(ts =>
          (nk(k.toLong), nt(t(ts.toLong)), rnd.nextDouble()))
      }.toList)
      val lefts = (1L to nL.toLong).map(i =>
        (i, nk((rnd.nextInt(nKeys) + 1).toLong), nt(t(rnd.nextInt(200).toLong))))
      if (nL > 0) {
        val got = AsofJoin.asofJoin(
            lefts.toDF("event_id", "key", "ts"),
            rights.toDF("key", "ts", "pval"),
            Seq("key"), "ts", Seq("pval"))
          .select("event_id", "asof_ts", "asof_pval")
          .as[(Long, Option[Timestamp], Option[Double])].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        val validRights = rights.collect { case (Some(k), Some(ts), v) => (k, ts, v) }
        val byKey = validRights.groupBy(_._1)
        for ((id, ko, lo) <- lefts) {
          val e = (ko, lo) match {
            case (Some(k), Some(lts)) =>
              byKey.getOrElse(k, Nil).filter(!_._2.after(lts))
                .sortBy(_._2.getTime).lastOption
            case _ => None // null key/ts left: kept, unmatched
          }
          if (got.get(id) != Some((e.map(_._2), e.map(_._3)))) {
            failures += 1
            println(s"ASOF MISMATCH seed=$seed id=$id got=${got.get(id)} want=$e")
          }
        }
        if (got.size != nL) {
          failures += 1
          println(s"ASOF ROWCOUNT seed=$seed got=${got.size} want=$nL")
        }
      }

      // ------------------------------------------------------- interval
      val w = 1L + rnd.nextInt(40)
      val cap = 1 + rnd.nextInt(6)
      val nP = rnd.nextInt(60)
      val nI = rnd.nextInt(40)
      def nv(x: Long): Option[Long] = if (rnd.nextInt(12) == 0) None else Some(x)
      val pts = (1L to nP.toLong).map(i => (i, nv(rnd.nextLong() % 500L)))
      val ivs = (1L to nI.toLong).map { i =>
        val lo = rnd.nextLong() % 500L
        // spans cluster around the bin width and the giant cutoff;
        // occasionally inverted (hi < lo — must match nothing, cheaply)
        val span = rnd.nextInt(4) match {
          case 0 => rnd.nextInt(2 * w.toInt + 2).toLong
          case 1 => (cap.toLong * w) + rnd.nextInt(3) - 1
          case 2 => -(1L + rnd.nextInt(1000))
          case _ => rnd.nextInt(1000).toLong
        }
        (i, nv(lo), nv(lo + span))
      }
      if (nP > 0 && nI > 0) {
        val got = RangeJoin.intervalJoin(
            pts.toDF("pid", "p"), "p", ivs.toDF("iid", "lo", "hi"), "lo", "hi",
            binWidth = w, maxBinsPerInterval = cap)
          .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
        val want = (for {
          (pid, Some(p)) <- pts
          (iid, Some(lo), Some(hi)) <- ivs if p >= lo && p <= hi
        } yield (pid, iid)).sorted
        if (got != want) {
          failures += 1
          println(s"INTERVAL MISMATCH seed=$seed w=$w cap=$cap got=${got.size} want=${want.size}")
        }
      }

      if (seed % 50 == 0) println(s"[fuzz-joins] $seed/$nSeeds seeds, $failures failures")
    }
    println(s"[fuzz-joins] DONE: $nSeeds seeds, $failures failures")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
