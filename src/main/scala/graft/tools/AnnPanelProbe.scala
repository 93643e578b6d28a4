package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Ann

/**
 * Fixed-query-panel ANN probe: the l_ann_ivfpq bench row's query set
 * grows with the corpus (vec_id % 50) and embeds a quadratic
 * brute-force recall baseline, so the ROW is superlinear by design.
 * This probe measures what production runs: a FIXED 100-query panel
 * against growing corpora, ivfPqTopK end-to-end (train + encode +
 * search, no brute-force side). Linear-ish scaling here pins the
 * SCALEUP.md attribution.
 *
 * Usage: runMain graft.tools.AnnPanelProbe <sfDir> [<sfDir> ...]
 */
object AnnPanelProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val panel = emb.where(col("vec_id") < 100)   // fixed 100 queries
      val nCorpus = emb.count()
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = Ann.ivfPqTopK(panel, emb, k = 10).count()
        println(f"$dir corpus=$nCorpus rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n result rows)")
      }
    }
    spark.stop()
  }
}
