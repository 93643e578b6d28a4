package graft.tools
import org.apache.spark.sql.SparkSession
import graft.spark.{S2Functions, S2Data, Queries}

/** Ad-hoc SQL timing probe: registers the SF-dir tables as temp views and
  * runs each argument SQL string 3x (count() action), printing per-rep
  * wall time — for A/B-ing expression variants on the bench datasets
  * without touching the registered queries. */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", false)
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    S2Functions.register(spark); S2Data.register(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Queries.prep(spark, dir)
    for ((sql, i) <- args.zipWithIndex; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = spark.sql(sql).count()
      println(f"sql$i rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
