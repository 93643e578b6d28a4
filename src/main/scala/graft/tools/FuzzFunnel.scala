package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Funnel

/**
 * Differential fuzzer for the streaming funnel: random event sequences
 * (random users, stages, noise types, timestamp collisions) delivered
 * over RANDOM BATCH SPLITS — state carried across triggers — must
 * produce exactly the batch three-CTE min-timestamp SQL's stage counts.
 * Batches are time-ordered (the stream's in-order parity contract);
 * the horizon is set large so no state expires mid-run.
 *
 * Usage: runMain graft.tools.FuzzFunnel [nSeeds]
 */
object FuzzFunnel {
  def main(args: Array[String]): Unit = {
    val nSeeds = args.headOption.map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val stages = Seq("view", "click", "purchase")
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

    var failures = 0
    for (seed <- 1 to nSeeds) {
      val rnd = new scala.util.Random(seed)
      val types = Seq("view", "click", "purchase", "error", "signup")
      val window = 60L * (5 + rnd.nextInt(120)) // 5min..2h in seconds
      val rows = (1 to (30 + rnd.nextInt(90))).map { _ =>
        Funnel.FunnelEvent(ts(rnd.nextInt(240)), 1 + rnd.nextInt(8),
          types(rnd.nextInt(types.length)))
      }.sortBy(_.ts.getTime) // in-order delivery contract
      // random batch split points
      val nBatches = 1 + rnd.nextInt(4)
      val cuts = (Seq(0, rows.length) ++
        Seq.fill(nBatches - 1)(rnd.nextInt(rows.length + 1))).sorted
      val batches = cuts.sliding(2).map { case Seq(a, b) => rows.slice(a, b) }
        .filter(_.nonEmpty).toSeq

      rows.toDF("ts", "user_id", "event_type").createOrReplaceTempView("fz")
      val (bv, bc, bp) = spark.sql(
        s"""WITH v AS (SELECT user_id, min(ts) AS t FROM fz
           |     WHERE event_type = 'view' GROUP BY user_id),
           |c AS (SELECT e.user_id, min(e.ts) AS t FROM fz e JOIN v ON e.user_id = v.user_id
           |     WHERE e.event_type = 'click' AND e.ts > v.t
           |       AND CAST(e.ts AS DOUBLE) - CAST(v.t AS DOUBLE) <= $window GROUP BY e.user_id),
           |p AS (SELECT e.user_id, min(e.ts) AS t FROM fz e JOIN c ON e.user_id = c.user_id
           |     WHERE e.event_type = 'purchase' AND e.ts > c.t
           |       AND CAST(e.ts AS DOUBLE) - CAST(c.t AS DOUBLE) <= $window GROUP BY e.user_id)
           |SELECT (SELECT count(*) FROM v), (SELECT count(*) FROM c),
           |       (SELECT count(*) FROM p)""".stripMargin)
        .as[(Long, Long, Long)].head()

      val input = MemoryStream[Funnel.FunnelEvent]
      val name = s"fz_funnel_$seed"
      val q = Funnel.funnelStream(input.toDS(), stages, window, watermark = "10 hours")
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        for (b <- batches) { input.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      val got = spark.table(name).groupBy("stage").count()
        .as[(Int, Long)].collect().toMap
      val sv = got.getOrElse(1, 0L); val sc = got.getOrElse(2, 0L); val sp = got.getOrElse(3, 0L)
      if ((sv, sc, sp) != ((bv, bc, bp))) {
        failures += 1
        println(s"[fuzz-funnel] FAIL seed=$seed window=$window batches=${batches.map(_.size)}")
        println(s"  stream=($sv,$sc,$sp) batch=($bv,$bc,$bp)")
      }

      // buffered arm: the SAME rows in a fully SHUFFLED delivery order
      // (cross-trigger disorder — the case the unbuffered contract
      // excludes); the 10 h watermark slack exceeds the 4 h event span so
      // nothing drops, and a final far-future noise event fires every
      // user's horizon timeout to finalize the buffers
      val shuffled = rnd.shuffle(rows)
      val cuts2 = (Seq(0, shuffled.length) ++
        Seq.fill(nBatches - 1)(rnd.nextInt(shuffled.length + 1))).sorted
      val batches2 = cuts2.sliding(2).map { case Seq(a, b) => shuffled.slice(a, b) }
        .filter(_.nonEmpty).toSeq
      val horizonMin = (stages.length * window * 2 / 60).toInt
      val flush = Seq(Funnel.FunnelEvent(ts(240 + horizonMin + 601), 999L, "noise"))
      val input2 = MemoryStream[Funnel.FunnelEvent]
      val name2 = s"fz_funnelbuf_$seed"
      val q2 = Funnel.funnelStreamBuffered(input2.toDS(), stages, window,
          watermark = "10 hours")
        .writeStream.format("memory").queryName(name2).outputMode("append").start()
      try {
        for (b <- batches2 :+ flush) { input2.addData(b: _*); q2.processAllAvailable() }
      } finally q2.stop()
      val got2 = spark.table(name2).where("user_id <> 999").groupBy("stage").count()
        .as[(Int, Long)].collect().toMap
      val (bv2, bc2, bp2) =
        (got2.getOrElse(1, 0L), got2.getOrElse(2, 0L), got2.getOrElse(3, 0L))
      if ((bv2, bc2, bp2) != ((bv, bc, bp))) {
        failures += 1
        println(s"[fuzz-funnel] BUFFERED FAIL seed=$seed window=$window batches=${batches2.map(_.size)}")
        println(s"  stream=($bv2,$bc2,$bp2) batch=($bv,$bc,$bp)")
      }
      if (seed % 10 == 0) println(s"[fuzz-funnel] $seed/$nSeeds seeds, $failures failures")
    }
    println(s"[fuzz-funnel] DONE: $nSeeds seeds, $failures failures")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
