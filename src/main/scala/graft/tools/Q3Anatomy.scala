package graft.tools

import org.apache.spark.sql.SparkSession

import graft.spark.Queries

/** Dev probe: where does b_tpch_q3's sf0.1 time go? Times raw SQL
  * sub-plans of the filter-first shape on warm reps. */
object Q3Anatomy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", 32L * 1024 * 1024)
      .config("spark.sql.files.openCostInBytes", 1L * 1024 * 1024)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Queries.prep(spark, dir)
    val pieces = Seq(
      "noop" -> "SELECT 1",
      "scan_li_count" -> "SELECT count(*) FROM lineitem",
      "scan_li_3col" -> ("SELECT count(*) FROM (SELECT l_orderkey, l_extendedprice, l_discount " +
        "FROM lineitem WHERE l_orderkey IS NOT NULL)"),
      "li_agg_orderkey" -> ("SELECT count(*) FROM (SELECT l_orderkey, " +
        "sum(CAST(round(l_extendedprice * 100) AS BIGINT)) c FROM lineitem GROUP BY l_orderkey)"),
      "bo_keys" -> ("SELECT count(*) FROM (SELECT o.o_orderkey FROM customer c " +
        "JOIN orders o ON c.c_custkey = o.o_custkey WHERE c.c_mktsegment = 'BUILDING')"),
      "li_join_bo" -> ("SELECT count(*) FROM lineitem l JOIN (SELECT o.o_orderkey FROM customer c " +
        "JOIN orders o ON c.c_custkey = o.o_custkey WHERE c.c_mktsegment = 'BUILDING') bo " +
        "ON l.l_orderkey = bo.o_orderkey"),
      "li_top10" -> ("SELECT l_orderkey, c FROM (SELECT l_orderkey, " +
        "sum(CAST(round(l_extendedprice * 100) AS BIGINT)) c FROM lineitem GROUP BY l_orderkey) " +
        "ORDER BY c DESC, l_orderkey LIMIT 10"))
    for ((name, sql) <- pieces; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      spark.sql(sql).collect()
      println(f"[q3-anatomy] $name rep$rep: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val qmap = Queries.all.map { case (n, q, _) => n -> q }.toMap
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      qmap("b_tpch_q3")(spark, dir).collect()
      println(f"[q3-anatomy] full_q3 rep$rep: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
