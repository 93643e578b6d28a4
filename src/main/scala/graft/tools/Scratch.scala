package graft.tools
import org.apache.spark.sql.SparkSession
import graft.spark.Queries

/** Dev scratch runner: run named CORRECTNESS queries and show results. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val byName = Queries.all.map { case (n, q, o) => n -> ((q, o)) }.toMap
    for (name <- args) {
      println(s"===== $name")
      val (q, _) = byName(name)
      val df = q(spark, dir)
      df.show(200, truncate = false)
    }
    spark.stop()
  }
}
