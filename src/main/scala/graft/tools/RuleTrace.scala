package graft.tools
import org.apache.spark.sql.SparkSession
import graft.spark.{Queries, S2Data, S2Functions}

/** One-off: log every optimizer rule that changes the t_dwithin_join_sql
  * plan, to attribute which rule inlines the left side's s2_geogpoint
  * into the covering/xyz projections (the r12 sf1 regression). */
object RuleTrace {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.sql.planChangeLog.level", "WARN")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    S2Functions.register(spark); S2Data.register(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    Queries.prep(spark, dir)
    val sql =
      """SELECT CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT id, s2_geogpoint(lon, lat) AS g FROM pts) a
        |JOIN (SELECT id, s2_geogpoint(lon, lat) AS g FROM pts) b
        |  ON s2_dwithin(a.g, b.g, 300000.0) AND a.id < b.id""".stripMargin
    println(spark.sql(sql).queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
