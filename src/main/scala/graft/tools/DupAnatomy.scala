package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.spark.Queries

/** r17 piece-probe: where do l_dup_spans / l_decontam_bloom /
  * l_ann_top1 spend their sf0.1 second? Times warm sub-pipelines. */
object DupAnatomy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Queries.prep(spark, dir)
    val qmap = Queries.all.map { case (n, q, _) => n -> q }.toMap

    def time(name: String)(body: => Long): Unit =
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = body
        println(f"[anatomy] $name rep$rep: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }

    val docsAug = spark.table("docs_aug")
    time("docs_scan")(docsAug.count())
    // the md5-gram UDF pass alone (mirror of Dedup.gramArrays)
    val gramHashArr = udf((text: String) => {
      val ws = text.trim.split("\\s+")
      if (ws.length < 8) Array.empty[Array[Byte]]
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val space = Array(' '.toByte)
        Array.tabulate(ws.length - 7) { i =>
          md.reset()
          var j = i
          while (j < i + 8) {
            if (j > i) md.update(space)
            md.update(ws(j).getBytes(java.nio.charset.StandardCharsets.UTF_8))
            j += 1
          }
          md.digest()
        }
      }
    })
    val ws = split(trim(col("text")), "\\s+")
    val grams = docsAug
      .where(col("text").isNotNull && length(trim(col("text"))) > 0 && size(ws) >= 8)
      .select(col("doc_id"), size(ws).cast("long").as("n_tok"),
        gramHashArr(col("text")).as("__ghs"))
    time("gram_udf")(grams.count())
    time("gram_explode")(grams.select(col("doc_id"), explode(col("__ghs")).as("gh")).count())
    val dupOwners = grams.select(col("doc_id"), explode(col("__ghs")).as("gh"))
      .groupBy("gh").agg(min("doc_id").as("__keep"), max("doc_id").as("__mx"))
      .where(col("__keep") =!= col("__mx")).drop("__mx")
    time("dup_owners")(dupOwners.count())
    time("full_dup_spans")(qmap("l_dup_spans")(spark, dir).count())

    // bloom decomposition (mirrors Dedup.bloomDecontam's two jobs)
    val docs = spark.table("documents").where(length(trim(col("text"))) > 0)
    val evDocs = docs.where(col("doc_id") % 2 === 0).select(col("doc_id"), col("text"))
    val wsD = split(trim(col("text")), "\\s+")
    def gramsOf(df: org.apache.spark.sql.DataFrame) = df
      .where(col("text").isNotNull && length(trim(col("text"))) > 0 && size(wsD) >= 8)
      .select(col("doc_id"), gramHashArr(col("text")).as("__ghs"))
      .select(col("doc_id"), explode(col("__ghs")).as("gh"))
    time("bloom_eval_collect") {
      val ghs = gramsOf(evDocs).select("gh").collect()
      ghs.length.toLong
    }
    val planted = docs.where(col("doc_id") % 2 === 0 && col("doc_id") % 6 === 0)
      .select((col("doc_id") + 20000000L).as("doc_id"), col("text"))
    val train = docs.where(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text")).unionByName(planted)
    time("bloom_train_grams")(gramsOf(train).count())
    time("bloom_train_cdist")(gramsOf(train)
      .groupBy("doc_id").agg(count_distinct(col("gh"))).count())
    time("full_bloom")(qmap("l_decontam_bloom")(spark, dir).count())
    time("full_ann_top1")(qmap("l_ann_top1")(spark, dir).count())
    spark.stop()
  }
}
