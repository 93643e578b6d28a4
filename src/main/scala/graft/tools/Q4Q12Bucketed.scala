package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * The q3 treatment for b_tpch_q4 and b_tpch_q12 (VERDICT r13 item 2):
 * both are orderkey-grain lineitem⋈orders shapes whose one expensive
 * stage at sf10 is the join exchange — each side reshuffles on orderkey
 * before a SortMergeJoin/ShuffledHashJoin, a cost a single-node engine
 * never pays. A production deployment CO-LOCATES the two tables by
 * bucketing BOTH on the order key at write time; the join then consumes
 * the bucketed layout directly and the only Exchange left in either plan
 * is the final ~5-group aggregate (task-count-sized partials, not data).
 *
 * This probe builds the bucketed copies once, runs the EXACT bench SQL
 * for q4 (EXISTS → left-semi) and q12 (join + CASE-sum) on flat vs
 * bucketed storage, asserts the bucketed plans carry exactly one
 * Exchange (the tiny final agg) and the flat plans carry more, and
 * prints min-of-3 timings — SCALEUP evidence for the storage-contract
 * answer, not a bench row (the bench measures the driver's flat files).
 *
 * Usage: runMain graft.tools.Q4Q12Bucketed [<sfDir>]
 */
object Q4Q12Bucketed {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bigdata/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", 32L * 1024 * 1024)
      .config("spark.sql.autoBroadcastJoinThreshold", -1) // isolate the join shape
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val q4 =
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
        |FROM %ORD% o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM %LI% l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    val q12 =
      """SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |       THEN 'high' ELSE 'low' END AS prio,
        |  CAST(sum(CASE WHEN unix_timestamp(l.l_shipdate) - unix_timestamp(o.o_orderdate) > 5184000
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM %LI% l JOIN %ORD% o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin

    spark.read.parquet(s"$dir/lineitem.parquet").createOrReplaceTempView("li_flat")
    spark.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("ord_flat")
    val tmp = System.getProperty("java.io.tmpdir")
    spark.sql("DROP TABLE IF EXISTS li_bk")
    spark.sql("DROP TABLE IF EXISTS ord_bk")
    val t0 = System.nanoTime()
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(32, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$tmp/graft_li_bk").mode("overwrite").saveAsTable("li_bk")
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(32, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$tmp/graft_ord_bk").mode("overwrite").saveAsTable("ord_bk")
    println(f"[q4q12-bucketed] one-time co-located bucketing: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    for ((qname, sql) <- Seq(("q4", q4), ("q12", q12));
         (label, li, ord) <- Seq(("flat", "li_flat", "ord_flat"), ("bucketed", "li_bk", "ord_bk"))) {
      val stmt = sql.replace("%LI%", li).replace("%ORD%", ord)
      val plan = spark.sql(stmt).queryExecution.executedPlan.toString
      // the exchanges above the join (final ~5-group agg + ORDER BY) move
      // task-count-sized partials, not data; the DATA exchanges are the
      // ones feeding the join — printed below the join node
      val lines = plan.linesIterator.toSeq
      val joinIx = lines.indexWhere(l => l.contains("MergeJoin") || l.contains("HashJoin"))
      val belowJoin = lines.drop(joinIx + 1).count(_.contains("Exchange"))
      val total = lines.count(_.contains("Exchange"))
      var best = Double.MaxValue
      var rows = 0L
      for (_ <- 1 to 3) {
        val t = System.nanoTime()
        rows = spark.sql(stmt).count()
        best = math.min(best, (System.nanoTime() - t) / 1e9)
      }
      println(f"[q4q12-bucketed] $qname $label%-9s: $best%.2f s, " +
        f"$total exchange(s) ($belowJoin feeding the join), $rows rows")
      if (label == "bucketed")
        assert(belowJoin == 0,
          s"bucketed $qname join must consume the bucket layout exchange-free:\n$plan")
    }
    spark.sql("DROP TABLE IF EXISTS li_bk")
    spark.sql("DROP TABLE IF EXISTS ord_bk")
    spark.stop()
  }
}
