package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-stage attribution of the b_events_sessions fixed-overhead floor
  * (VERDICT r8 item 5): times each prefix of the sessionization kernel —
  * empty-stage roundtrip, parquet scan, scan+shuffle+sort, + lag window,
  * + aggregate — so the gap between Spark and the DuckDB oracle on a
  * sub-second kernel is attributed to measured stages instead of asserted.
  * Results are recorded in SCALEUP.md.
  */
object SessionsFloor {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.createOrReplaceTempView("events_raw")
    val tsExpr = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => "timestamp_micros(ts DIV 1000)"
      case _ => "CAST(ts AS TIMESTAMP)"
    }
    spark.sql(s"""CREATE OR REPLACE TEMP VIEW events AS
      SELECT event_id, $tsExpr AS ts, user_id FROM events_raw""")

    val probes: Seq[(String, String)] = Seq(
      "empty-stage roundtrip" -> "SELECT count(*) FROM range(1)",
      "parquet scan only" -> "SELECT count(*) FROM events",
      "scan+shuffle+sort (distinct-ish)" ->
        """SELECT count(*) FROM (SELECT user_id, ts, event_id FROM events
          |DISTRIBUTE BY user_id SORT BY user_id, ts, event_id)""".stripMargin,
      "scan+shuffle+sort+window(lag)" ->
        """SELECT count(*) FROM (
          |SELECT CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END AS x
          |FROM events)""".stripMargin,
      "full kernel (sessions)" ->
        """SELECT count(*) FROM (
          |SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions FROM (
          | SELECT user_id,
          |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
          |       WHEN CAST(ts AS DOUBLE) - CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) > 1800 THEN 1
          |       ELSE 0 END AS is_new
          | FROM events)
          |GROUP BY user_id ORDER BY user_id)""".stripMargin)

    // one warmup sweep (JIT+codegen), then min of 5 timed reps each
    for ((_, sql) <- probes) spark.sql(sql).count()
    def load(): Double =
      try { val s = scala.io.Source.fromFile("/proc/loadavg")
            try s.mkString.split("\\s+")(0).toDouble finally s.close() }
      catch { case _: Throwable => 0.0 }
    for ((name, sql) <- probes) {
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(sql).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[floor] $name%-36s min=${times.min}%.3f s  reps=${times.map(t => f"$t%.3f").mkString(",")}  load=${load()}%.1f")
    }

    // config levers on the full kernel: does the floor move with AQE's
    // per-stage materialization off, or with fewer shuffle partitions?
    val kernel = probes.last._2
    val variants = Seq(
      "kernel aqe=off" -> Seq("spark.sql.adaptive.enabled" -> "false"),
      "kernel shuffle.partitions=4" -> Seq("spark.sql.shuffle.partitions" -> "4"),
      "kernel aqe=off partitions=4" -> Seq(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "4"))
    for ((name, confs) <- variants) {
      val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      spark.sql(kernel).count() // re-warm under the new configs
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(kernel).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[floor] $name%-36s min=${times.min}%.3f s  reps=${times.map(t => f"$t%.3f").mkString(",")}  load=${load()}%.1f")
      saved.foreach { case (k, v) => spark.conf.set(k, v) }
    }
    spark.stop()
  }
}
