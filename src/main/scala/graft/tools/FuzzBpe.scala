package graft.tools

import org.apache.spark.sql.SparkSession

import graft.llm.Bpe

/**
 * Bulk differential fuzzer for the distributed BPE trainer: random
 * corpora checked merge-for-merge against a driver-side reference
 * implementation of the published algorithm (the same oracle BpeSpec
 * runs on 15 seeds, here on hundreds with harsher generators — tiny
 * alphabets for tie-dense pair counts, single-char and long words,
 * minCount thresholds, and repeated-word pileups so the argmax tiebreak
 * and the left-to-right non-overlapping merge are exercised constantly).
 *
 * Usage: runMain graft.tools.FuzzBpe [nSeeds]
 */
object FuzzBpe {
  def main(args: Array[String]): Unit = {
    val nSeeds = args.lift(0).map(_.toInt).getOrElse(300)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def referenceBpe(wordCounts: Map[String, Long], numMerges: Int,
                     minCount: Long): Seq[(Int, String, String, Long)] = {
      var vocab: Map[Seq[String], Long] = wordCounts
        .filter(_._2 >= minCount)
        .map { case (w, c) => (w.map(_.toString) :+ "</w>", c) }
      val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
      for (rank <- 1 to numMerges) {
        val pc = scala.collection.mutable.Map[(String, String), Long]()
        for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
          pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + c
        if (pc.nonEmpty) {
          val ((l, r), c) = pc.minBy { case ((a, b), n) => (-n, a, b) }
          out += ((rank, l, r, c))
          vocab = vocab.map { case (syms, n) =>
            val m = scala.collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                m += (l + r); i += 2
              } else { m += syms(i); i += 1 }
            }
            (m.toSeq, n)
          }.groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }
        }
      }
      out.toSeq
    }

    /** Reference merge loop over ARBITRARY initial symbol sequences (the
      * byte-level arm: no EOW, symbols are the GPT-2 byte alphabet). */
    def referenceMerges(vocab0: Map[Seq[String], Long],
                        numMerges: Int): Seq[(Int, String, String, Long)] = {
      var vocab = vocab0
      val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
      for (rank <- 1 to numMerges) {
        val pc = scala.collection.mutable.Map[(String, String), Long]()
        for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
          pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + c
        if (pc.nonEmpty) {
          val ((l, r), c) = pc.minBy { case ((a, b), n) => (-n, a, b) }
          out += ((rank, l, r, c))
          vocab = vocab.map { case (syms, n) =>
            val m = scala.collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                m += (l + r); i += 2
              } else { m += syms(i); i += 1 }
            }
            (m.toSeq, n)
          }.groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }
        }
      }
      out.toSeq
    }

    var failures = 0
    for (seed <- 1 to nSeeds) {
      val rnd = new scala.util.Random(seed)
      val alphabet = "abcd".take(2 + rnd.nextInt(3))
      val nWords = 2 + rnd.nextInt(15)
      val minCount = 1L + rnd.nextInt(3)
      val merges = 1 + rnd.nextInt(8)
      val docs = (1 to nWords).map { _ =>
        val len = 1 + rnd.nextInt(7)
        val w = (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        Seq.fill(1 + rnd.nextInt(6))(w).mkString(" ")
      }
      // alternate the driver-local fast path and the distributed merge
      // loop across seeds so both stay pinned to the reference
      val maxLocal = if (seed % 2 == 0) 0L else 2000000L
      val got = Bpe.train(docs.toDF("text"), "text", merges, minCount,
          maxLocalVocab = maxLocal)
        .orderBy("rank")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val wc = docs.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
      val want = referenceBpe(wc, merges, minCount)
      if (got != want) {
        failures += 1
        println(s"[fuzz-bpe] FAIL seed=$seed minCount=$minCount merges=$merges")
        println(s"  corpus: ${docs.mkString(" | ")}")
        println(s"  got:  $got")
        println(s"  want: $want")
      }

      // byte-level arm: harsher corpora (case, digits, punct, unicode,
      // contractions, whitespace runs), same local/distributed alternation
      val pieces = Array("ab", "Ab", "ba", "c", "1", "42", "!", ".", ",", " ",
        "  ", "\t", "\n", "'s", "'ll", "é", "中", "🙂")
      val bdocs = (1 to 2 + rnd.nextInt(5)).map { _ =>
        (1 to 1 + rnd.nextInt(12)).map(_ => pieces(rnd.nextInt(pieces.length))).mkString
      }
      val bMerges = 1 + rnd.nextInt(6)
      val bMin = 1L + rnd.nextInt(2)
      val bGot = Bpe.trainBytes(bdocs.toDF("text"), "text", bMerges, bMin,
          maxLocalVocab = maxLocal)
        .orderBy("rank")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val bVocab = bdocs.flatMap(Bpe.pretokenize)
        .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
        .filter(_._2 >= bMin)
        .groupBy { case (w, _) => Bpe.byteSyms(w).toSeq }
        .map { case (syms, ws) => (syms, ws.values.sum) }
      val bWant = referenceMerges(bVocab, bMerges)
      if (bGot != bWant) {
        failures += 1
        println(s"[fuzz-bpe] BYTE FAIL seed=$seed minCount=$bMin merges=$bMerges")
        println(s"  corpus: ${bdocs.mkString(" | ")}")
        println(s"  got:  $bGot")
        println(s"  want: $bWant")
      }
      if (seed % 50 == 0) println(s"[fuzz-bpe] $seed/$nSeeds seeds, $failures failures")
    }
    println(s"[fuzz-bpe] DONE: $nSeeds seeds, $failures failures")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
