package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * A/B probe for b_tpch_q4's flat-file shape: the EXISTS form ships every
 * 'R' lineitem row into the semi-join shuffle; pre-DISTINCTing the
 * R-orderkeys adds a map-side partial dedup that can cut the shuffled
 * volume when orders average >1 returned item. Also prints whether
 * Spark's runtime bloom filter injected on either side. Evidence probe
 * only — if a variant wins decisively it can replace the bench SQL
 * (identical results by construction).
 *
 * Usage: runMain graft.tools.Q4Variants [<sfDir>]
 */
object Q4Variants {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bigdata/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", 32L * 1024 * 1024)
      .config("spark.sql.files.openCostInBytes", 1L * 1024 * 1024)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/lineitem.parquet").createOrReplaceTempView("lineitem")
    spark.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("orders")

    val variants = Seq(
      "exists (bench)" ->
        """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
          |FROM orders o
          |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
          |  AND EXISTS (SELECT 1 FROM lineitem l
          |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      "pre-distinct IN" ->
        """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
          |FROM orders o
          |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
          |  AND o.o_orderkey IN (SELECT DISTINCT l_orderkey FROM lineitem
          |                       WHERE l_returnflag = 'R')
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      "join on distinct keys" ->
        """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
          |FROM orders o JOIN (SELECT DISTINCT l_orderkey FROM lineitem
          |                    WHERE l_returnflag = 'R') r
          |  ON o.o_orderkey = r.l_orderkey
          |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)

    for ((label, sql) <- variants) {
      val plan = spark.sql(sql).queryExecution.executedPlan.toString
      val bloom = plan.contains("bloom") || plan.contains("Bloom")
      var best = Double.MaxValue
      var rows = Seq.empty[String]
      for (_ <- 1 to 3) {
        val t = System.nanoTime()
        rows = spark.sql(sql).collect().map(_.toString).toSeq
        best = math.min(best, (System.nanoTime() - t) / 1e9)
      }
      println(f"[q4-variants] $label%-22s: $best%.2f s, bloom=$bloom, ${rows.mkString(" ")}")
    }
    spark.stop()
  }
}
