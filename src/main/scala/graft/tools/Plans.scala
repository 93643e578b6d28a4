package graft.tools
import org.apache.spark.sql.SparkSession
import graft.spark.{S2Functions, S2Data, Queries}

/** Print the formatted physical plan of named queries (plan-audit tool). */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    S2Functions.register(spark); S2Data.register(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val byName = Queries.all.map { case (n, q, _) => n -> q }.toMap
    for (name <- args) {
      println(s"===== $name")
      byName(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
