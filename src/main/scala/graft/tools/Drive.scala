package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.spark.{S2Data, S2Functions, S2Join}
import graft.llm.{Ann, Dedup, Multimodal, TextAnalysis}

/** End-to-end drive of the public library surface against real testdata. */
object Drive {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .appName("graft-drive").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    S2Functions.register(spark)
    S2Data.register(spark)
    Dedup.register(spark)
    TextAnalysis.register(spark)

    // 1. SQL surface
    spark.sql("SELECT s2_astext(s2_geogfromtext('POINT (-64 45)')) AS t").show(false)
    spark.sql("""SELECT s2_cell_debug(s2_cellfromlonlat(-64.0, 45.0)) AS c,
                        s2_cell_token(s2_cellfromlonlat(-64.0, 45.0)) AS tok""").show(false)
    spark.sql("""SELECT round(s2_distance(s2_data_city('Vancouver'), s2_data_city('Toronto')), 0) AS d,
                        s2_intersects(s2_data_city('Vancouver'), s2_data_country('Canada')) AS van_in_can,
                        s2_intersects(s2_data_city('Chicago'), s2_data_country('Canada')) AS chi_in_can""").show(false)

    // 2. flagship spatial join through S2Join (cover-then-refine)
    val cities = S2Data.cities(spark)
    val countries = S2Data.countries(spark)
    val joined = S2Join.intersects(countries.select($"name".as("country"), $"geog".as("cgeog")), "cgeog",
      cities.select($"name".as("city"), $"geog"), "geog", level = 4)
    println("flagship join rows = " + joined.count() + " (want 210)")

    // broadcast variant
    val bj = S2Join.broadcastIntersects(
      countries.select($"name".as("country"), $"geog".as("cgeog")), "cgeog",
      cities.select($"name".as("city"), $"geog"), "geog")
    println("broadcast join rows = " + bj.count() + " (want 210)")

    // 3. LLM ops on real documents/embeddings
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")

    println("docs=" + docs.count() + " emb=" + emb.count())
    docs.select(TextAnalysis.tokenCount($"text").as("tok"),
        TextAnalysis.qualityScore($"text").as("q"),
        TextAnalysis.langId($"text").as("lang"),
        TextAnalysis.fingerprint($"text").as("fp"))
      .show(3, truncate = 40)

    val norm = spark.sql(
      "SELECT doc_normalize('  a\\tb   c  ') AS c")
    println("doc_normalize SQL = [" + norm.head().getString(0) + "]")

    val mh = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
    println("minhash candidate pairs = " + mh.count())
    val sh = Dedup.simhashCandidatePairs(docs, "doc_id", "text")
    println("simhash candidate pairs = " + sh.count())

    // pairs -> clusters -> representative-only corpus (union with a shifted
    // copy so exact dups actually exist in the drive corpus)
    val aug = docs.select($"doc_id", $"text")
      .union(docs.where($"doc_id" % 10 === 0).select($"doc_id" + 1000000, $"text"))
    val ccPairs = Dedup.exactDupPairs(aug, "doc_id", "text")
    val resolved = Dedup.dedupByPairs(aug, "doc_id", ccPairs)
    println("dedup resolve: " + aug.count() + " docs -> " + resolved.count() +
      " after cluster resolution")

    val spans = Dedup.duplicateSpans(aug, "doc_id", "text")
    println("dup-span docs = " + spans.count() +
      " (fully covered = " + spans.where($"covered" === $"n_tok").count() + ")")
    val excised = Dedup.removeDuplicateSpans(aug, "doc_id", "text")
    println("span excision: " + excised.where($"n_tok_after" < $"n_tok_before").count() +
      " docs rewritten, " + excised.where($"n_tok_after" === 0).count() + " emptied")
    val bloom = Dedup.bloomDecontam(
      docs.select($"doc_id", $"text").where($"doc_id" % 2 === 1).unionByName(
        docs.where($"doc_id" % 2 === 0 && $"doc_id" % 6 === 0)
          .select(($"doc_id" + 20000000L).as("doc_id"), $"text")),
      docs.where($"doc_id" % 2 === 0), "doc_id", "text")
    println("bloom-flagged train docs = " + bloom.count())
    val cross = Dedup.minhashCrossPairs(
      docs.where($"doc_id" % 2 === 1), docs.where($"doc_id" % 2 === 0), "doc_id", "text")
    println("cross-corpus lsh candidates = " + cross.count())
    val dsir = TextAnalysis.importanceWeights(docs, $"lang" === "en", "doc_id", "text")
    println("dsir-weighted raw docs = " + dsir.count())
    val tfidf = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 3)
    println("tfidf rows = " + tfidf.count())
    val overlap = TextAnalysis.sourceVocabOverlap(docs, "source", "text")
    println("source-overlap pairs = " + overlap.count())

    val top1 = Ann.bruteForceTopK(emb.where($"vec_id" % 100 === 0), emb, 1)
    top1.orderBy("q_id").show(5)
    val lsh = Ann.lshTopK(emb.where($"vec_id" % 100 === 0), emb, 1)
    println("lsh rows = " + lsh.count())

    val media = Multimodal.fakeMediaFromText(docs.limit(50), "doc_id", "text")
    val feats = Multimodal.extractFeatures(media)
    println("media features: " + feats.count() + " rows, dim=" +
      feats.select(size($"features")).first().getInt(0))
    val audio = Multimodal.audioFeatures(media)
    println("audio features: " + audio.count() + " rows, formats=" +
      audio.select($"format").distinct().as[String].collect().sorted.mkString(","))

    // plan sanity: the cover-refine join should be a shuffle equi-join
    joined.explain("simple")
    spark.stop()
  }
}
