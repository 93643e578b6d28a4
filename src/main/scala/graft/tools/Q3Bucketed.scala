package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * The 100-TB answer to b_tpch_q3's residual: its one expensive stage is
 * the order-grain pre-agg exchange (15M keys at sf10) that a single-node
 * engine never pays. A production deployment BUCKETS lineitem on
 * l_orderkey at write time, making the per-order aggregate exchange-free
 * (bucketed scan satisfies the hash requirement). This probe builds the
 * bucketed copy once, runs the identical q3 pre-agg shape on flat vs
 * bucketed storage, verifies the exchange count drops, and prints both
 * timings — evidence for SCALEUP, not a bench row (the bench measures
 * the driver-provided flat files; bucketing changes the input contract).
 *
 * Usage: runMain graft.tools.Q3Bucketed [<sfDir>]
 */
object Q3Bucketed {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bigdata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", 32L * 1024 * 1024)
      .config("spark.sql.autoBroadcastJoinThreshold", -1) // isolate the agg shape
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val pre =
      """SELECT l_orderkey, sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS cents
        |FROM %s GROUP BY l_orderkey""".stripMargin

    spark.read.parquet(s"$dir/lineitem.parquet").createOrReplaceTempView("li_flat")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    val t0 = System.nanoTime()
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(32, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"${System.getProperty("java.io.tmpdir")}/graft_li_bucketed")
      .mode("overwrite").saveAsTable("li_bucketed")
    println(f"[q3-bucketed] one-time bucketing: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    for ((label, table) <- Seq(("flat", "li_flat"), ("bucketed", "li_bucketed"))) {
      val df = spark.sql(pre.format(table))
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t = System.nanoTime()
        spark.sql(pre.format(table)).foreach(_ => ())
        best = math.min(best, (System.nanoTime() - t) / 1e9)
      }
      println(f"[q3-bucketed] $label%-9s pre-agg: $best%.2f s, $exchanges exchange(s) in plan")
      if (label == "bucketed")
        assert(exchanges == 0, s"bucketed pre-agg must be exchange-free:\n$plan")
    }
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.stop()
  }
}
