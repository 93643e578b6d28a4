package graft.tools
import org.apache.spark.sql.SparkSession
import graft.spark.{S2Functions, S2Data, Queries}

/** Prints the POST-EXECUTION adaptive physical plan of a CORRECTNESS
  * query (AQE's final shape: reused exchanges, chosen join strategies),
  * which the static `Plans` formatted view cannot show. */
object PlanExec {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    S2Functions.register(spark); S2Data.register(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val byName = Queries.all.map { case (n, q, _) => n -> q }.toMap
    for (name <- args) {
      val df = byName(name)(spark, dir)
      df.count()
      println(s"===== $name (executed)")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
