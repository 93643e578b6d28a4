package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Distributed byte-pair-encoding tokenizer training and application
 * (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
 * Words with Subword Units" — the word-level variant used by GPT-2-style
 * tokenizers: words never merge across boundaries, an end-of-word marker
 * closes each word).
 *
 * Scale shape: training touches corpus-shaped data exactly once. Pass 1
 * reduces the corpus to the word-frequency table with a map-side partial
 * `groupBy(word).count` — vocabulary-bounded by Heaps' law (millions of
 * rows where the corpus has billions of documents). Each of the K merge
 * rounds then runs over that vocab-bounded table only: explode adjacent
 * symbol pairs weighted by word count, map-side partial `sum`, and a
 * ONE-ROW TakeOrdered argmax with the deterministic (count desc, pair
 * asc) tiebreak — exact integer counts, so the learned merges are
 * engine- and partitioning-independent (the l_bpe_train oracle pins them
 * as literal values). The winning pair broadcasts back and one map pass
 * rewrites the symbol arrays; no corpus re-scan, no window, no collect
 * beyond the 1-row argmax. Per-round frames are persisted and the
 * previous round's cache is unpersisted as soon as its successor
 * materializes (the same discipline as Dedup.connectedComponents).
 */
object Bpe {

  /** Lowercased letter-run words of a text column (the pre-tokenizer). */
  private def words(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(trim(col(textCol))), "[^a-z]+")).as("w"))
      .where(length(col("w")) > 0)

  private val EOW = "</w>"

  /**
   * Learn the first `numMerges` BPE merges over a text column.
   * Returns (rank, left, right, pair_count): rank 1 is the first (most
   * frequent) merge; pair_count is the exact corpus-weighted count of the
   * adjacent pair at the time it was merged. Words below `minCount`
   * occurrences are dropped before training (rare-word noise cut —
   * standard practice, and it bounds the table further).
   */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 1L,
            maxLocalVocab: Long = 2000000L): DataFrame = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._

    val wordCounts = words(df, textCol)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)

    // Fast path: the corpus scan (the only data-proportional stage) stays
    // distributed, but when the word-count table is bounded — it almost
    // always is; Heaps' law keeps it far below the corpus — the K merge
    // rounds run driver-side over the collected vocab instead of paying
    // 2 Spark jobs (pair-count argmax + rewrite) per round. At sf0.1 this
    // cut l_bpe_train from 3.8 s to roughly the corpus-scan time. The
    // distributed loop below remains the fallback for unbounded vocabs
    // (spec-pinned to produce identical merges).
    // clamp before the Int conversion: maxLocalVocab = Long.MaxValue (a
    // natural "always local") would wrap limit() to 0 and silently train
    // on an empty vocab; any cap above Int.MaxValue-1 behaves as that bound
    val cap = math.min(maxLocalVocab, (Int.MaxValue - 1).toLong).toInt
    // persist before probing: otherwise the fallback path would pay the
    // corpus-proportional word-count aggregation TWICE (once for the
    // capped probe, once for the merge loop's vocab) — exactly when the
    // corpus is biggest
    val wcPersisted = wordCounts.persist()
    val capped = wcPersisted.limit(cap + 1)
      .as[(String, Long)].collect()
    if (capped.length <= cap) {
      wcPersisted.unpersist(blocking = false)
      return trainLocal(spark, capped, numMerges)
    }

    val vocab = wcPersisted
      .select(concat(split(col("w"), ""), array(lit(EOW))).as("syms"), col("cnt"))
    val out = trainDistributed(spark, vocab, numMerges)
    wcPersisted.unpersist(blocking = false)
    out
  }

  /** The shared DISTRIBUTED merge loop over a weighted symbol-sequence
    * vocab `(syms: array<string>, cnt: long)` — the unbounded-vocab
    * fallback for both the word-level and byte-level trainers. Identical
    * merges to [[mergeLoopLocal]] by construction (spec-pinned). */
  private def trainDistributed(spark: SparkSession, vocab: DataFrame,
                               numMerges: Int): DataFrame = {
    import spark.implicits._
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var cur = vocab.persist()
    var prev: DataFrame = null
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      // adjacent symbol pairs of every word, weighted by word count;
      // map-side partial sum then a single-row TakeOrdered argmax
      val top = cur
        .select(col("cnt"), explode(expr(
          """filter(
            |  transform(syms, (s, i) ->
            |    IF(i < size(syms) - 1, struct(s AS l, syms[i + 1] AS r),
            |       CAST(NULL AS STRUCT<l: STRING, r: STRING>))),
            |  p -> p IS NOT NULL)""".stripMargin)).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("pc"))
        .orderBy(col("pc").desc, col("l").asc, col("r").asc)
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      if (prev != null) { prev.unpersist(blocking = false); prev = null }
      top.headOption match {
        case None => exhausted = true
        case Some((l, r, pc)) =>
          merges += ((rank, l, r, pc))
          val mergeOne = udf((syms: Seq[String]) => {
            val out = scala.collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += (l + r); i += 2
              } else { out += syms(i); i += 1 }
            }
            out.toSeq
          })
          prev = cur
          cur = cur.select(mergeOne(col("syms")).as("syms"), col("cnt")).persist()
          rank += 1
      }
    }
    cur.unpersist(blocking = false)
    if (prev != null) prev.unpersist(blocking = false)
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** Driver-side merge loop over a collected (word, count) vocab — exact
    * same pair counts, (count desc, pair asc) tiebreak, and greedy
    * left-to-right merge as the distributed loop (BpeLocalParitySpec +
    * FuzzBpe hold the two paths identical). */
  private def trainLocal(spark: org.apache.spark.sql.SparkSession,
                         vocab: Array[(String, Long)],
                         numMerges: Int): DataFrame = {
    import spark.implicits._
    mergeLoopLocal(
      vocab.map { case (w, _) => w.map(_.toString).toArray :+ EOW },
      vocab.map(_._2), numMerges).toDF("rank", "left", "right", "pair_count")
  }

  /** The shared driver-side merge loop: exact pair counts over the
    * weighted symbol sequences, (count desc, pair asc) tiebreak, greedy
    * left-to-right non-overlapping rewrite. Mutates `seqs`. */
  private def mergeLoopLocal(seqs: Array[Array[String]], cnts: Array[Long],
                             numMerges: Int): Seq[(Int, String, String, Long)] = {
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val pc = new java.util.HashMap[(String, String), Long]()
      var i = 0
      while (i < seqs.length) {
        val s = seqs(i); val c = cnts(i)
        var j = 0
        while (j < s.length - 1) {
          pc.merge((s(j), s(j + 1)), c, (a, b) => a + b)
          j += 1
        }
        i += 1
      }
      if (pc.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        val it = pc.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val k = e.getKey; val v = e.getValue
          if (best == null || v > best._2 ||
              (v == best._2 && (k._1 < best._1._1 ||
                (k._1 == best._1._1 && k._2 < best._1._2)))) best = (k, v)
        }
        val ((l, r), c) = best
        merges += ((rank, l, r, c))
        i = 0
        while (i < seqs.length) {
          val s = seqs(i)
          var hit = false
          var j = 0
          while (!hit && j < s.length - 1) {
            hit = s(j) == l && s(j + 1) == r; j += 1
          }
          if (hit) {
            val out = scala.collection.mutable.ArrayBuffer[String]()
            j = 0
            while (j < s.length) {
              if (j < s.length - 1 && s(j) == l && s(j + 1) == r) {
                out += (l + r); j += 2
              } else { out += s(j); j += 1 }
            }
            seqs(i) = out.toArray
          }
          i += 1
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Greedy-rank BPE application of one word (chars + EOW), lowest-rank
    * present pair merges first — the standard encode algorithm. */
  private def applyWord(word: String,
                        rankOf: Map[(String, String), Int]): Seq[String] =
    applySyms((word.map(_.toString) :+ EOW).toArray, rankOf)

  /** Greedy-rank merge application over an arbitrary initial symbol
    * sequence (shared by the word-level and byte-level encoders). */
  private def applySyms(initial: Array[String],
                        rankOf: Map[(String, String), Int]): Seq[String] = {
    var syms = initial
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue; var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        rankOf.get((syms(i), syms(i + 1))) match {
          case Some(rk) if rk < bestRank => bestRank = rk; bestAt = i
          case _ =>
        }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        // merge every non-overlapping occurrence of the winning pair
        val (l, r) = (syms(bestAt), syms(bestAt + 1))
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            out += (l + r); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
      }
    }
    syms.toSeq
  }

  /**
   * Tokenize a text column with learned merges: adds `outCol` holding the
   * subword token array. One broadcast-merges map pass — stateless per
   * row, streams. A per-document word→tokens memo exploits Zipf (the
   * few hot words dominate token mass, so repeats hit the cache).
   */
  def encode(df: DataFrame, textCol: String, merges: Seq[(String, String)],
             outCol: String = "bpe_tokens"): DataFrame = {
    val spark = df.sparkSession
    val rankB = spark.sparkContext.broadcast(
      merges.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap)
    val enc = udf((text: String) => {
      if (text == null) Seq.empty[String]
      else {
        val rankOf = rankB.value
        val memo = scala.collection.mutable.HashMap[String, Seq[String]]()
        text.toLowerCase.split("[^a-z]+").iterator.filter(_.nonEmpty)
          .flatMap(w => memo.getOrElseUpdate(w, applyWord(w, rankOf)))
          .toSeq
      }
    })
    df.withColumn(outCol, enc(col(textCol)))
  }

  // ---------------------------------------------------- byte-level BPE

  /**
   * GPT-2-style byte-level pre-tokenizer pattern (Radford et al. 2019;
   * the pattern published with the GPT-2 reference encoder): common
   * English contractions, space-prefixed letter/digit/punctuation runs,
   * and whitespace runs where the lookahead alternative leaves the LAST
   * space of a run attached to the following token. Case-preserving —
   * byte-level BPE never lowercases; lossless round-trip is part of the
   * contract. Whitespace is the EXPLICIT class [\t\n\f\r ] (RE2's \s), not
   * Java's \s (which adds \x0B) — the DuckDB replay oracle runs on RE2,
   * and the two engines must split identically on every input.
   */
  private val Gpt2Pattern = java.util.regex.Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\t\n\f\r \\p{L}\\p{N}]+|" +
      "[\t\n\f\r ]+(?![^\t\n\f\r ])|[\t\n\f\r ]+")

  /** Regex pre-tokenization of one text (the GPT-2 contract above). */
  private[graft] def pretokenize(text: String): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val m = Gpt2Pattern.matcher(text)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (m.find()) out += m.group()
    out.toSeq
  }

  /**
   * The GPT-2 printable byte alphabet: bytes that are printable in
   * Latin-1 ([33,126], [161,172], [174,255]) map to themselves; the
   * other 68 bytes map to codepoints 256.. in byte order (space -> U+0120
   * 'Ġ', newline -> U+010A 'Ċ', ...). Every byte gets a visible,
   * whitespace-free single-char symbol, which is what lets the merge
   * table print, diff, and replay in SQL.
   */
  private[llm] val ByteChar: Array[String] = {
    val out = new Array[String](256)
    var n = 0
    for (b <- 0 until 256) {
      val keep = (b >= 33 && b <= 126) || (b >= 161 && b <= 172) || (b >= 174 && b <= 255)
      if (keep) out(b) = new String(Character.toChars(b))
      else { out(b) = new String(Character.toChars(256 + n)); n += 1 }
    }
    out
  }

  private[llm] val CharByte: Map[String, Byte] =
    ByteChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** A pre-token's UTF-8 bytes as initial merge symbols. */
  private[graft] def byteSyms(tok: String): Array[String] =
    tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => ByteChar(b & 0xff))

  /** Inverse of the byte alphabet: token strings back to raw bytes (the
    * lossless-round-trip check; every byte-level token is a concatenation
    * of alphabet chars). */
  private[llm] def bytesOfToken(tok: String): Array[Byte] =
    tok.codePoints().toArray.map { cp =>
      CharByte(new String(Character.toChars(cp)))
    }

  /**
   * Byte-level BPE training (the GPT-2/tiktoken-style production
   * tokenizer contract): regex pre-tokenization, UTF-8 bytes as the
   * initial alphabet (so ANY input — code, CJK, emoji, binary-ish text —
   * tokenizes without an unknown-symbol path), no end-of-word marker
   * (word boundaries ride the leading-space convention of the
   * pre-tokenizer). Merges never cross pre-token boundaries.
   *
   * Same scale shape as [[train]]: one distributed corpus pass reduces to
   * the Heaps-bounded (pre-token, count) table; the K merge rounds run
   * driver-local over the collected vocab when it fits under
   * `maxLocalVocab` (with the same clamp), else the distributed
   * per-round loop — both spec-pinned to identical merges.
   */
  def trainBytes(df: DataFrame, textCol: String, numMerges: Int,
                 minCount: Long = 1L,
                 maxLocalVocab: Long = 2000000L): DataFrame = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val pretokUdf = udf((t: String) => pretokenize(t))
    val tokCounts = df.select(explode(pretokUdf(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
    val cap = math.min(maxLocalVocab, (Int.MaxValue - 1).toLong).toInt
    val tcPersisted = tokCounts.persist()
    val capped = tcPersisted.limit(cap + 1).as[(String, Long)].collect()
    if (capped.length <= cap) {
      tcPersisted.unpersist(blocking = false)
      mergeLoopLocal(capped.map { case (w, _) => byteSyms(w) },
        capped.map(_._2), numMerges).toDF("rank", "left", "right", "pair_count")
    } else {
      val symsUdf = udf((w: String) => byteSyms(w).toSeq)
      val out = trainDistributed(spark,
        tcPersisted.select(symsUdf(col("w")).as("syms"), col("cnt")), numMerges)
      tcPersisted.unpersist(blocking = false)
      out
    }
  }

  /**
   * The tokenizer ARTIFACT a trainer ships (GPT-2's vocab.json layout):
   * ids 0..255 are the printable byte alphabet in byte order, id 255+rank
   * is merge `rank`'s concatenated token. Pure derivation from the merge
   * table — deterministic, engine-replayable (the l_bpe_vocab oracle
   * rebuilds it in SQL from the same corpus).
   */
  def vocabBytes(merges: Seq[(String, String)]): Seq[(Int, String)] =
    ByteChar.zipWithIndex.map { case (c, b) => (b, c) }.toSeq ++
      merges.zipWithIndex.map { case ((l, r), i) => (256 + i, l + r) }

  /**
   * Byte-level tokenize with learned merges: `outCol` holds the token
   * array over the printable byte alphabet. Lossless — concatenating the
   * tokens and reversing [[ByteChar]] yields the exact original UTF-8
   * bytes (spec-pinned). One broadcast map pass; streams. The per-token
   * memo exploits Zipf exactly as [[encode]]'s does.
   */
  def encodeBytes(df: DataFrame, textCol: String, merges: Seq[(String, String)],
                  outCol: String = "bpe_tokens"): DataFrame = {
    val spark = df.sparkSession
    val rankB = spark.sparkContext.broadcast(
      merges.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap)
    val enc = udf((text: String) => {
      if (text == null) Seq.empty[String]
      else {
        val rankOf = rankB.value
        val memo = scala.collection.mutable.HashMap[String, Seq[String]]()
        pretokenize(text).iterator
          .flatMap(w => memo.getOrElseUpdate(w, applySyms(byteSyms(w), rankOf)))
          .toSeq
      }
    })
    df.withColumn(outCol, enc(col(textCol)))
  }
}
