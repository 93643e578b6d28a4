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

  // ------------------------------------------------------ byte-level BPE

  /** INDEPENDENT procedural pre-tokenizer implementing the same GPT-2
    * contract as Bpe's regex (contractions; optional single leading space
    * on letter/digit/punct runs; a whitespace run before a non-space
    * yields its first n-1 chars, the last ws char joining the next token
    * when it is a plain space) — a scan, not a regex, so the two paths
    * can validate each other. */
  private def refPretokenize(t: String): Seq[String] = {
    if (t == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val n = t.length
    def isWs(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'
    val contractions = Seq("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")
    var i = 0
    while (i < n) {
      contractions.find(c => t.startsWith(c, i)) match {
        case Some(c) => out += c; i += c.length
        case None =>
          val spaceLeads = t.charAt(i) == ' ' && i + 1 < n && !isWs(t.charAt(i + 1))
          if (!isWs(t.charAt(i)) || spaceLeads) {
            val start = i
            var j = if (t.charAt(i) == ' ') i + 1 else i
            val c = t.charAt(j)
            if (Character.isLetter(c)) {
              while (j < n && Character.isLetter(t.charAt(j))) j += 1
            } else if (Character.isDigit(c)) {
              while (j < n && Character.isDigit(t.charAt(j))) j += 1
            } else {
              while (j < n && !isWs(t.charAt(j)) && !Character.isLetter(t.charAt(j)) &&
                !Character.isDigit(t.charAt(j))) j += 1
            }
            out += t.substring(start, j); i = j
          } else {
            var j = i
            while (j < n && isWs(t.charAt(j))) j += 1
            if (j == n || j - i == 1) { out += t.substring(i, j); i = j }
            else { out += t.substring(i, j - 1); i = j - 1 }
          }
      }
    }
    out.toSeq
  }

  /** Independent reconstruction of the GPT-2 printable byte alphabet. */
  private val refByteChar: Map[Int, String] = {
    var n = 0
    (0 until 256).map { b =>
      val keep = (b >= 33 && b <= 126) || (b >= 161 && b <= 172) || (b >= 174 && b <= 255)
      if (keep) b -> b.toChar.toString
      else { val s = new String(Character.toChars(256 + n)); n += 1; b -> s }
    }.toMap
  }

  /** Reference byte-level trainer: same merge algorithm as referenceBpe,
    * byte-symbol sequences, no EOW. */
  private def referenceBpeBytes(tokCounts: Map[String, Long],
                                numMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Seq[String], Long] = tokCounts.groupBy { case (w, _) =>
      w.getBytes("UTF-8").toSeq.map(b => refByteChar(b & 0xff))
    }.map { case (syms, ws) => (syms, ws.values.sum) }
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

  test("pretokenize implements the GPT-2 split: space attach, contractions, ws runs") {
    assert(Bpe.pretokenize("hello world") === Seq("hello", " world"))
    assert(Bpe.pretokenize("a  b") === Seq("a", " ", " b"))
    assert(Bpe.pretokenize("don't stop") === Seq("don", "'t", " stop"))
    assert(Bpe.pretokenize("I'll pay $42.50!") ===
      Seq("I", "'ll", " pay", " $", "42", ".", "50", "!"))
    assert(Bpe.pretokenize("tail  ") === Seq("tail", "  "))
    assert(Bpe.pretokenize("x\t\ty") === Seq("x", "\t", "\t", "y"))
    assert(Bpe.pretokenize("") === Seq.empty)
    // concatenating pre-tokens is ALWAYS the identity (losslessness)
    for (t <- Seq("mixed CASE 123 héllo!", " lead", "a\n\nb", "..x..", "'s'll"))
      assert(Bpe.pretokenize(t).mkString === t, s"lossy split of [$t]")
  }

  test("pretokenize (regex) equals the independent procedural scan on random text") {
    val rnd = new scala.util.Random(7)
    val pieces = Array("word", "Tr", "42", "9", ".", ",!", "'s", "'ll", "'x", " ", "  ",
      "\t", "\n", "é", "ß", "中", "a")
    for (seed <- 1 to 300) {
      val t = (1 to 1 + rnd.nextInt(12)).map(_ => pieces(rnd.nextInt(pieces.length))).mkString
      assert(Bpe.pretokenize(t) === refPretokenize(t), s"seed $seed text [$t]")
    }
  }

  test("byte alphabet is a 256-symbol bijection matching the published map") {
    assert(Bpe.ByteChar.distinct.length === 256)
    assert(Bpe.ByteChar(' '.toInt) === "Ġ") // Ġ
    assert(Bpe.ByteChar('\n'.toInt) === "Ċ") // Ċ
    assert(Bpe.ByteChar('a'.toInt) === "a")
    assert(Bpe.ByteChar(0) === "Ā")
    for (b <- 0 until 256) assert(Bpe.bytesOfToken(Bpe.ByteChar(b)).toSeq === Seq(b.toByte))
  }

  test("trainBytes matches the independent byte-level reference, both paths") {
    val s = spark; import s.implicits._
    val docs = Seq("the cat sat on the mat", "the cat ran", "The END!",
      "cats don't sit 42 times", "héllo héllo héllo")
    val tokCounts = docs.flatMap(refPretokenize)
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
    val want = referenceBpeBytes(tokCounts, 10)
    val local = Bpe.trainBytes(docs.toDF("text"), "text", 10)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(local === want)
    val dist = Bpe.trainBytes(docs.toDF("text"), "text", 10, maxLocalVocab = 0L)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(dist === want, "distributed byte path must equal the local path")
  }

  test("differential fuzz: byte trainer equals the reference on random corpora") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(1234)
    val pieces = Array("ab", "ba", "c", " ", "  ", "'s", "1", "!", "\n", "é")
    for (seed <- 1 to 12) {
      val docs = (1 to 2 + rnd.nextInt(4)).map { _ =>
        (1 to 1 + rnd.nextInt(10)).map(_ => pieces(rnd.nextInt(pieces.length))).mkString
      }
      val tokCounts = docs.flatMap(refPretokenize)
        .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
      val want = referenceBpeBytes(tokCounts, 6)
      val got = Bpe.trainBytes(docs.toDF("text"), "text", 6)
        .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
      assert(got === want, s"seed $seed corpus [${docs.mkString("|")}]")
    }
  }

  test("vocabBytes lays out the GPT-2 artifact: byte alphabet then merges by rank") {
    val merges = Seq(("t", "h"), ("th", "e"))
    val v = Bpe.vocabBytes(merges)
    assert(v.length === 258)
    assert(v.take(256).map(_._1) === (0 until 256))
    assert(v(256) === ((256, "th")) && v(257) === ((257, "the")))
    assert(v.map(_._2).distinct.length === 258, "vocab entries must be unique")
  }

  test("encodeBytes is lossless and greedy by rank; unicode round-trips") {
    val s = spark; import s.implicits._
    val texts = Seq("the cat sat", "Thé CÅT 中文 🙂 sat\n\ttwice", "don't... stop!")
    val merges = Bpe.trainBytes(texts.toDF("text"), "text", 8)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val encoded = Bpe.encodeBytes(texts.toDF("text"), "text", merges)
      .select("text", "bpe_tokens").as[(String, Seq[String])].collect()
    for ((text, toks) <- encoded) {
      val bytes = toks.flatMap(Bpe.bytesOfToken).toArray
      assert(new String(bytes, "UTF-8") === text, s"lossy encode of [$text]")
    }
    // with no merges: one symbol per byte
    val raw = Bpe.encodeBytes(Seq("hi é").toDF("text"), "text", Seq.empty)
      .select("bpe_tokens").as[Seq[String]].head()
    assert(raw === Seq("h", "i", "Ġ", "Ã", "©"))
  }
}
