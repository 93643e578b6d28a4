package graft.tools
import org.apache.spark.sql.SparkSession
import graft.spark.Queries
/** Plan audit: print formatted plans of the headline queries. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qmap = Queries.all.map { case (n, q, _) => n -> q }.toMap
    for (name <- Seq("t_cover_refine_join", "b_tpch_q3", "l_dedup_minhash", "t_xy")) {
      println(s"===== $name =====")
      qmap(name)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
