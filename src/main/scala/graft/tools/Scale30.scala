package graft.tools

import org.apache.spark.sql.SparkSession

/** 30x scale validation driver: builds (once) a 30-copy replica at
  * bigdata/sf3 and probes the round's headline ops warm-x3, printing the
  * scaling curve evidence recorded in SCALEUP.md. */
object Scale30 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.spark.S2Functions.register(spark); graft.spark.S2Data.register(spark)
    val dst = "/root/repo/bigdata/sf3"
    if (!new java.io.File(s"$dst/lineitem.parquet").exists()) {
      println("[scale30] generating 30x replica...")
      ScaleUp.run(spark, dst = dst, copies = 30)
    }
    val byName = graft.spark.Queries.all.map { case (n, q, _) => n -> q }.toMap
    val names = if (args.nonEmpty) args.toSeq
      else Seq("l_dup_spans", "l_dup_span_removal", "l_decontam_bloom",
        "l_decontam_fuzzy", "l_dedup_minhash", "b_events_sessions")
    for (name <- names; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = byName(name)(spark, dst).count()
      println(f"[scale30] $name rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
