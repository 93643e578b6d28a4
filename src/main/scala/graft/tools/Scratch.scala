package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.Queries
import graft.llm.Dedup

/** Dev scratch runner: run named CORRECTNESS queries and show results;
  * `mh` times the minhash stages separately. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val byName = Queries.all.map { case (n, q, o) => n -> ((q, o)) }.toMap
    for (name <- args) {
      if (name == "mh") {
        Queries.prep(spark, dir)
        val docs = spark.table("docs_aug")
        def t(label: String)(f: => Long): Unit = {
          for (r <- 1 to 3) {
            val t0 = System.nanoTime()
            val n = f
            println(f"$label rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
          }
        }
        t("sig-only")(docs.select(Dedup.minhashSignature(col("text"), 64).as("s"))
          .where(element_at(col("s"), 1) < 0).count())
        t("cand-pairs")(Dedup.minhashCandidatePairs(docs, "doc_id", "text", 64, 4).count())
      } else {
        println(s"===== $name")
        byName(name)._1(spark, dir).show(200, truncate = false)
      }
    }
    spark.stop()
  }
}
