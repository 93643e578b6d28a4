package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Distributed BPE training checked against an independent driver-side
  * reference implementation (same algorithm, different code path), plus
  * partitioning-independence and the encode contract. */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .appName("graft-bpe-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Driver-side reference BPE over a word-count map: most-frequent pair
    * first, (count desc, pair asc) tiebreak, left-to-right non-overlapping
    * merge — mirrors the published algorithm directly. */
  private def referenceBpe(wordCounts: Map[String, Long],
                           numMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Seq[String], Long] =
      wordCounts.map { case (w, c) => (w.map(_.toString) :+ "</w>", c) }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (rank <- 1 to numMerges) {
      val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        pairCounts((syms(i), syms(i + 1))) =
          pairCounts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (pairCounts.nonEmpty) {
        val ((l, r), pc) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((rank, l, r, pc))
        vocab = vocab.map { case (syms, c) =>
          val merged = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              merged += (l + r); i += 2
            } else { merged += syms(i); i += 1 }
          }
          (merged.toSeq, c)
        }.groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest")

  test("train matches the reference implementation merge for merge") {
    val s = spark; import s.implicits._
    val df = corpus.toDF("text")
    val got = Bpe.train(df, "text", numMerges = 10)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    val wc = corpus.flatMap(_.split("\\s+")).groupBy(identity)
      .map { case (w, ws) => (w, ws.size.toLong) }
    val want = referenceBpe(wc, 10)
    assert(got === want)
    // sanity anchor from the published example family: 'es' then 'est'
    assert(got.take(2).map(m => (m._2, m._3)) === Seq(("e", "s"), ("es", "t")))
  }

  test("train is partitioning-independent") {
    val s = spark; import s.implicits._
    val df = corpus.toDF("text")
    val a = Bpe.train(df.repartition(1), "text", 6)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    val b = Bpe.train(df.repartition(7), "text", 6)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(a === b)
  }

  test("driver-local fast path equals the distributed merge loop") {
    val s = spark; import s.implicits._
    // corpus with deliberate count ties so the (count desc, pair asc)
    // tiebreak is exercised on both paths
    val docs = (corpus ++ Seq("abab abab", "cdcd cdcd")).toDF("text")
    val local = Bpe.train(docs, "text", 8)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    val dist = Bpe.train(docs, "text", 8, maxLocalVocab = 0L)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(local === dist)
  }

  test("minCount drops rare words from training") {
    val s = spark; import s.implicits._
    val df = (Seq.fill(10)("aaab") ++ Seq("zzzz")).toDF("text")
    val m = Bpe.train(df, "text", 3, minCount = 2)
      .as[(Int, String, String, Long)].collect()
    assert(m.forall { case (_, l, r, _) => !(l + r).contains("z") },
      "a word below minCount must not contribute merges")
  }

  test("encode applies merges greedily by rank and memoizes repeats") {
    val s = spark; import s.implicits._
    val df = corpus.toDF("text")
    val merges = Bpe.train(df, "text", 10)
      .orderBy("rank").as[(Int, String, String, Long)].collect()
      .map { case (_, l, r, _) => (l, r) }.toSeq
    val toks = Bpe.encode(Seq("newest lowest newest").toDF("text"), "text", merges)
      .select("bpe_tokens").as[Seq[String]].head()
    // 'newest' fully merges under its learned merges; tokens re-join to
    // the original words with the end-of-word marker closing each word
    val rejoined = toks.mkString("").replace("</w>", " ").trim
    assert(rejoined === "newest lowest newest")
    // identical words tokenize identically (memo correctness)
    val words = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    var cur = scala.collection.mutable.ArrayBuffer[String]()
    toks.foreach { t => cur += t; if (t.endsWith("</w>")) { words += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer() } }
    assert(words.length === 3)
    assert(words(0) === words(2))
  }

  test("differential fuzz: distributed trainer equals the reference on random corpora") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(42)
    for (seed <- 1 to 15) {
      val nWords = 3 + rnd.nextInt(12)
      val alphabet = "abcd"
      val docs = (1 to nWords).map { _ =>
        val len = 1 + rnd.nextInt(6)
        val w = (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        val reps = 1 + rnd.nextInt(5)
        Seq.fill(reps)(w).mkString(" ")
      }
      val got = Bpe.train(docs.toDF("text"), "text", 5)
        .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
      val wc = docs.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
      val want = referenceBpe(wc, 5)
      assert(got === want, s"seed $seed: corpus ${docs.mkString("|")}")
    }
  }

  test("encode with no merges yields character tokens") {
    val s = spark; import s.implicits._
    val toks = Bpe.encode(Seq("ab cd").toDF("text"), "text", Seq.empty)
      .select("bpe_tokens").as[Seq[String]].head()
    assert(toks === Seq("a", "b", "</w>", "c", "d", "</w>"))
  }
}
