package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** PII redaction, repetition features, boilerplate line removal, and
  * domain-mix rebalancing. */
class PipelineOpsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .appName("graft-pipeline-ops-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("redactPii replaces every category and counts matches") {
    val s = spark; import s.implicits._
    val text = "Mail a.b+c@ex-ample.org or bob@x.io, call +1 (415) 555-0137, " +
      "host 192.168.0.1, ssn 123-45-6789 end"
    val r = Seq(text).toDF("t").select(TextAnalysis.redactPii($"t").as("r"))
      .select("r.clean", "r.n_email", "r.n_ssn", "r.n_ip", "r.n_phone")
      .as[(String, Long, Long, Long, Long)].head()
    assert(r._1 === "Mail <EMAIL> or <EMAIL>, call <PHONE>, host <IP>, ssn <SSN> end")
    assert((r._2, r._3, r._4, r._5) === ((2L, 1L, 1L, 1L)))
  }

  test("normalizeText composes NFC, strips controls, collapses whitespace, idempotent") {
    val s = spark; import s.implicits._
    val dirty = " cafe\u0301   menu\t\u0007\tcaf\u00e9\r\nend "
    val once = Seq(dirty).toDF("t")
      .select(TextAnalysis.normalizeText($"t").as("c")).as[String].head()
    // decomposed and composed e-acute must land on the SAME codepoint
    assert(once === "caf\u00e9 menu caf\u00e9 end")
    val twice = Seq(once).toDF("t")
      .select(TextAnalysis.normalizeText($"t").as("c")).as[String].head()
    assert(twice === once, "normalization must be idempotent")
    assert(TextAnalysis.normalizeTextFn(null) === null)
    assert(TextAnalysis.normalizeTextFn(" \u0000\u001f  ") === "")
  }

  test("redactPii leaves clean text alone") {
    val s = spark; import s.implicits._
    val r = Seq("no pii here, just words and the number 7")
      .toDF("t").select(TextAnalysis.redactPii($"t").as("r"))
      .select("r.clean", "r.n_email", "r.n_phone")
      .as[(String, Long, Long)].head()
    assert(r._1 === "no pii here, just words and the number 7")
    assert((r._2, r._3) === ((0L, 0L)))
  }

  test("repetitionReport computes line and bigram stats") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "same line\nsame line\n- bullet\nends with..."),      // 4 lines, 1 dup
      (2L, "spam spam spam spam"),                               // 3 bigrams all "spam spam"
      (3L, ""),                                                  // empty
      (4L, "a b\n\n  \nc d")                                     // blank lines skipped
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionReport(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    val r1 = got(0)
    assert(r1._2 === 4L)
    assert(math.abs(r1._3 - 0.25) < 1e-12)         // 1 of 4 lines duplicated
    assert(math.abs(r1._4 - 0.25) < 1e-12)         // 1 bullet line
    assert(math.abs(r1._5 - 0.25) < 1e-12)         // 1 ellipsis line
    val r2 = got(1)
    assert(r2._6 === 1.0)                          // all bigrams identical
    assert(got(2)._2 === 0L && got(2)._6 === 0.0)  // empty doc -> zeros
    assert(got(3)._2 === 2L)                       // blank lines not counted
  }

  test("removeBoilerplate strips frequent lines, keeps rare ones in order") {
    val s = spark; import s.implicits._
    val docs = (0L until 100L).map { i =>
      (i, s"BANNER\nbody text $i\n\nFooter Line\nrare ${i % 60}")
    }.toDF("doc_id", "text")
    // BANNER and Footer Line are in 100 docs (> 10); "rare k" is in 1-2
    val out = Boilerplate.removeBoilerplate(docs, "doc_id", "text", maxDocs = 10)
      .orderBy("doc_id")
      .select("doc_id", "text", "n_lines_before", "n_lines_after")
      .as[(Long, String, Long, Long)].collect()
    assert(out.length === 100)
    val (_, t0, before0, after0) = out(0)
    assert(t0 === "body text 0\n\nrare 0")   // order + empty line preserved
    assert(before0 === 4L && after0 === 2L)
    // normalized matching: case-insensitive strip
    val docs2 = (0L until 30L).map(i => (i, s"banner\nkeep $i")).toDF("doc_id", "text")
      .unionAll((30L until 60L).map(i => (i, s"BANNER\nkeep $i")).toDF("doc_id", "text"))
    val out2 = Boilerplate.removeBoilerplate(docs2, "doc_id", "text", maxDocs = 40)
      .select("text").as[String].collect()
    assert(out2.forall(!_.toLowerCase.contains("banner")))
  }

  test("removeBoilerplate fails fast when the frequent set exceeds its bound") {
    val s = spark; import s.implicits._
    val docs = (0L until 30L).map(i => (i, s"BANNER\nbody $i")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Boilerplate.removeBoilerplate(docs, "doc_id", "text", maxDocs = 10,
        maxFrequentLines = 0).collect()
    }
    assert(ex.getMessage.contains("frequent-line set exceeds"))
  }

  test("rebalanceByGroup keeps exact integer-share counts, deterministically") {
    val s = spark; import s.implicits._
    val df = ((0L until 100L).map(i => (i, "en")) ++
              (100L until 150L).map(i => (i, "de")) ++
              (150L until 160L).map(i => (i, "zh")) ++
              (160L until 170L).map(i => (i, "xx"))).toDF("id", "grp")
    val shares = Map("en" -> 500, "de" -> 300, "zh" -> 200)
    // T = min(100*1000/500, 50*1000/300, 10*1000/200) = min(200,166,50) = 50
    // keeps: en 25, de 15, zh 10; xx dropped (not in the target mix)
    val out = Sampling.rebalanceByGroup(df, "grp", "id", shares)
    val counts = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(counts === Map("en" -> 25L, "de" -> 15L, "zh" -> 10L))
    assert(out.columns.toSeq === Seq("id", "grp")) // no helper columns leak
    // deterministic: same kept ids regardless of input partitioning
    val a = out.select("id").as[Long].collect().sorted
    val b = Sampling.rebalanceByGroup(df.repartition(7), "grp", "id", shares)
      .select("id").as[Long].collect().sorted
    assert(a sameElements b)
  }

  test("packSequences lays out contiguous per-group token streams") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("a", 1L, 100L), ("a", 2L, 500L), ("a", 3L, 12L),
      ("a", 4L, 0L),                      // zero-token doc: dropped
      ("b", 9L, 10L)                      // other group: stream restarts at 0
    ).toDF("grp", "id", "n_tok")
    val out = Sampling.packSequences(df, "grp", "id", "n_tok", 256L)
      .orderBy("grp", "id")
      .select("grp", "id", "tok_start", "seq_first", "seq_last", "n_seqs")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out === Array(
      ("a", 1L, 0L, 0L, 0L, 1L),          // tokens [0,100) -> seq 0
      ("a", 2L, 100L, 0L, 2L, 3L),        // [100,600) straddles seqs 0..2
      ("a", 3L, 600L, 2L, 2L, 1L),        // [600,612) inside seq 2
      ("b", 9L, 0L, 0L, 0L, 1L)))
    // deterministic regardless of input partitioning
    val again = Sampling.packSequences(df.repartition(5), "grp", "id", "n_tok", 256L)
      .orderBy("grp", "id")
      .select("grp", "id", "tok_start", "seq_first", "seq_last", "n_seqs")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(again === out)
  }

  test("packSequences offsets come from the distributed prefix sum") {
    val s = spark; import s.implicits._
    val df = (0L until 20000L).map(i => ("src", i, 3L)).toDF("grp", "id", "n_tok")
    val res = Sampling.packSequences(df, "grp", "id", "n_tok", 512L)
    // last doc's stream end must equal the group total: no gaps, no overlaps
    val maxEnd = res.agg(max(col("tok_start") + col("n_tok"))).as[Long].head()
    assert(maxEnd === 60000L)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("__pid"), s"offset window not partition-id-scoped:\n$plan")
  }

  test("countMinSketch: overestimate invariant, row sums, partition-independence") {
    val s = spark; import s.implicits._
    val docs = (1L to 200L).map { i =>
      (i, Seq.fill((i % 7).toInt + 1)(s"w${i % 13}").mkString(" "))
    }.toDF("doc_id", "text")
    val sk = TextAnalysis.countMinSketch(docs, "doc_id", "text", d = 4, w = 32)
    val exact = docs.select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap
    val total = exact.values.sum
    // every row of the sketch totals every occurrence exactly once
    for (r <- sk.indices) assert(sk(r).sum === total, s"row $r sum")
    // CMS never underestimates
    for ((t, n) <- exact)
      assert(TextAnalysis.cmsEstimate(sk, t) >= n, s"underestimate for $t")
    // deterministic under repartitioning (treeAggregate merge is
    // elementwise addition — commutative)
    val sk2 = TextAnalysis.countMinSketch(docs.repartition(7), "doc_id", "text",
      d = 4, w = 32)
    for (r <- sk.indices)
      assert(java.util.Arrays.equals(sk(r), sk2(r)), s"row $r differs")
    // with w >> vocab, estimates are exact (no collisions for 13 tokens
    // is not guaranteed at w=32; re-check at w=4096 where md5 spread
    // makes collisions vanish for this vocab)
    val wide = TextAnalysis.countMinSketch(docs, "doc_id", "text", d = 4, w = 4096)
    for ((t, n) <- exact)
      assert(TextAnalysis.cmsEstimate(wide, t) === n, s"wide sketch off for $t")
  }

  test("topTokens counts tokens with deterministic tie-break") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "b a a"), (2L, "  c b  "), (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.topTokens(docs, "doc_id", "text", 2)
      .as[(String, Long)].collect()
    assert(got === Array(("a", 2L), ("b", 2L)))   // tie a/b broken by token asc
  }

  test("unigramSurprisal scores rare-word docs higher, exactly") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "x x x x"), (2L, "x y")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramSurprisal(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    // N=6 tokens; count(x)=5, count(y)=1
    assert(got(0)._2 === 4L)
    assert(math.abs(got(0)._3 - math.log(6.0 / 5.0)) < 1e-12)
    assert(got(1)._2 === 2L)
    assert(math.abs(got(1)._3 - (math.log(6.0 / 5.0) + math.log(6.0)) / 2.0) < 1e-12)
    assert(got(1)._3 > got(0)._3)
  }

  test("corpusStats data card: exact stats, and the approx path tracks them") {
    val s = spark; import s.implicits._
    val docs = (0L until 200L).map { i =>
      val words = (0 to (i % 10).toInt).map(j => s"w$j").mkString(" ")
      (s"src${i % 2}", if (i % 3 == 0) "de" else "en", words, words.length.toLong)
    }.toDF("source", "lang", "text", "n_chars")
    val exact = TextAnalysis.corpusStats(docs, "source", "lang", "text", "n_chars")
      .orderBy("source")
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
    assert(exact.length === 2)
    assert(exact(0)._2 === 100L)                       // 100 docs per source
    assert(exact(0)._4 === 2L)                         // two langs
    // doc i has (i % 10) + 1 tokens: src0 (even i) has 20 docs each of 1,3,5,7,9
    assert(exact(0)._3 === 20L * (1 + 3 + 5 + 7 + 9))  // token total
    val approx = TextAnalysis.corpusStats(docs, "source", "lang", "text", "n_chars",
        exact = false)
      .orderBy("source")
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
    // counts/sums identical; percentiles within the sketch's tolerance
    assert(approx(0)._2 === exact(0)._2 && approx(0)._3 === exact(0)._3)
    assert(math.abs(approx(0)._5 - exact(0)._5) <= 2.0)
    assert(math.abs(approx(0)._6 - exact(0)._6) <= 2.0)
  }

  test("filterByQualityQuantile keeps each group's top fraction, ties inclusive") {
    val s = spark; import s.implicits._
    // per group: ids 0-3 are punctuation junk (low score), 4-7 clean prose
    val docs = (0L until 16L).map { i =>
      val id = i / 2
      val text = if (id < 4) "!!! ### $$$ %%% junk" + ("!" * id.toInt)
                 else "clean alphabetic prose with enough plain words here"
      (s"g${i % 2}", i, text)
    }.toDF("source", "doc_id", "text")
    val kept = TextAnalysis.filterByQualityQuantile(docs, "source", "text", 0.5)
      .select("doc_id").as[Long].collect().sorted
    // every clean doc survives, at least the worst junk is gone
    assert((8L until 16L).forall(kept.contains))
    assert(kept.length < 16)
    assert(kept sameElements
      TextAnalysis.filterByQualityQuantile(docs.repartition(5), "source", "text", 0.5)
        .select("doc_id").as[Long].collect().sorted)    // partitioning-independent
  }

  test("kmeans recovers planted clusters and is partitioning-independent") {
    val s = spark; import s.implicits._
    // three well-separated blobs around (0,0), (10,0), (0,10), 30 pts each
    val pts = (0 until 90).map { i =>
      val c = i % 3
      val (cx, cy) = Seq((0f, 0f), (10f, 0f), (0f, 10f))(c)
      // deterministic jitter in [-0.4, 0.4]
      val jx = ((i * 7919) % 9 - 4) / 10.0f
      val jy = ((i * 104729) % 9 - 4) / 10.0f
      (i.toLong, Array(cx + jx, cy + jy))
    }.toDF("vec_id", "embedding")
    val out = Ann.kmeans(pts, k = 3, iters = 4)
      .select("vec_id", "cluster").as[(Long, Int)].collect().sortBy(_._1)
    // every planted blob maps to exactly one k-means cluster
    val byBlob = out.groupBy(_._1 % 3).map { case (b, xs) => b -> xs.map(_._2).toSet }
    assert(byBlob.values.forall(_.size === 1), s"blob split: $byBlob")
    assert(byBlob.values.flatten.toSet.size === 3)   // and the blobs don't merge
    val again = Ann.kmeans(pts.repartition(7), k = 3, iters = 4)
      .select("vec_id", "cluster").as[(Long, Int)].collect().sortBy(_._1)
    assert(again sameElements out)                   // integer-sum determinism
  }

  test("semanticDedupPairs finds planted copies within clusters") {
    val s = spark; import s.implicits._
    val base = (0 until 60).map { i =>
      (i.toLong, Array((i % 5).toFloat + 1f, (i % 7).toFloat + 1f, (i % 3).toFloat))
    }
    val planted = Seq(1000L -> base(4)._2, 1001L -> base(37)._2)
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val pairs = Ann.semanticDedupPairs(df, threshold = 0.9999, k = 4, iters = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((4L, 1000L)) && pairs.contains((37L, 1001L)))
  }

  test("boundedClusters splits oversized clusters on skewed input") {
    val s = spark; import s.implicits._
    // the first 24 ids (= the derived-k seeds) are scattered far apart; a
    // 560-point dense blob follows, so round one funnels the entire blob
    // into one giant cluster and the oversize-split loop must break it up
    val scattered = (0 until 24).map { i =>
      (i.toLong, Array((i * 50).toFloat, (i % 2) * 500f))
    }
    val dense = (0 until 560).map { i =>
      (100L + i, Array(600f + (i % 28) / 10.0f, 600f + (i / 28) / 10.0f))
    }
    val df = (scattered ++ dense).toDF("vec_id", "embedding")
    val out = Ann.boundedClusters(df, targetClusterSize = 25, iters = 3)
      .select("vec_id", "cluster").as[(Long, Long)].collect()
    assert(out.length === 584)
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.values.max <= 100,
      s"cluster over 4x target survived: max=${sizes.values.max}")
    // the split loop actually ran: some labels carry a later-round stride
    assert(out.exists(_._2 >= (1L << 40)))
  }

  test("semanticDedupPairs keeps planted identical pairs through the split loop") {
    val s = spark; import s.implicits._
    // identical vectors co-assign in every round, so planted copies inside
    // the dense (split-triggering) blob must still surface as pairs
    val dense = (0 until 560).map { i =>
      (100L + i, Array(600f + (i % 28) / 10.0f, 600f + (i / 28) / 10.0f, 1f))
    }
    val planted = Seq(5000L -> dense(300)._2, 5001L -> dense(42)._2)
    val df = (dense ++ planted).toDF("vec_id", "embedding")
    val pairs = Ann.semanticDedupPairs(df, threshold = 0.9999, iters = 2,
        targetClusterSize = 25)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((400L, 5000L)) && pairs.contains((142L, 5001L)))
  }

  test("chunkText windows cover the doc with the stated overlap") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "abcdefghij"),          // len 10, chunk 4 step 2 -> 4 chunks
      (2L, "abc"),                 // shorter than one chunk
      (3L, ""),                    // dropped
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkText(docs, "doc_id", "text", 4, 2)
      .orderBy("doc_id", "chunk_ix")
      .as[(Long, Int, String)].collect()
    assert(got === Array(
      (1L, 0, "abcd"), (1L, 1, "cdef"), (1L, 2, "efgh"), (1L, 3, "ghij"),
      (2L, 0, "abc")))
    // every character of the source appears in some chunk; last chunk hits the end
    val cover = got.filter(_._1 == 1L).map(_._3).mkString
    assert("abcdefghij".forall(cover.contains(_)))
  }

  test("minhashCrossPairs surfaces word-reordered near-copies across corpora") {
    val s = spark; import s.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated text about spark catalyst optimizer rules"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val ev = Seq(
      (100L, "dog lazy the over jumps fox brown quick the"), // reorder of 1
      (101L, "theta eta zeta epsilon delta gamma beta alpha"), // reorder of 3
      (102L, "no overlap with anything at all here truly")).toDF("doc_id", "text")
    val got = Dedup.minhashCrossPairs(train, ev, "doc_id", "text",
        numHashes = 64, bands = 4)
      .select("id_a", "id_b", "est_jaccard")
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2))
    // identical word sets MUST collide (identical signatures), est 1.0
    assert(got.map(p => (p._1, p._2)).toSet === Set((1L, 100L), (3L, 101L)))
    assert(got.forall(_._3 === 1.0))
    // each pair surfaces exactly once (first-collision reporting, 4 bands)
    assert(got.length === 2)
  }

  test("duplicateSpans matches a brute-force reference on random corpora") {
    val s = spark; import s.implicits._
    val n = 4
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val vocab = Array("a", "b", "c", "d", "e")
      // random docs over a small vocab so cross-doc n-gram collisions are common
      val docs = (1L to 12L).map { id =>
        id -> Array.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      // brute force: every doc's gram positions; grams seen in >1 doc; merge spans
      val gramsOf = docs.toMap.view.mapValues(_.split(" ")).toMap
        .map { case (id, ws) =>
          id -> (if (ws.length < n) Array.empty[(Int, String)]
                 else Array.tabulate(ws.length - n + 1)(i => i -> ws.slice(i, i + n).mkString(" ")))
        }
      val dupSet = gramsOf.toSeq.flatMap { case (id, gs) => gs.map(g => g._2 -> id) }
        .groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1).keySet
      val want = gramsOf.flatMap { case (id, gs) =>
        val hits = gs.filter(g => dupSet(g._2)).map(_._1).sorted
        if (hits.isEmpty) None
        else {
          var spans = 1L; var covered = n.toLong
          for (i <- 1 until hits.length) {
            val d = hits(i) - hits(i - 1)
            if (d > n) spans += 1
            covered += math.min(d, n)
          }
          Some((id, gramsOf(id).length.toLong + n - 1, spans, covered))
        }
      }.toSet
      val got = Dedup.duplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text", n)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("removeDuplicateSpans excises dup spans, keeper doc survives intact") {
    val s = spark; import s.implicits._
    val shared = "a b c d e f g h"                        // one duplicated 8-gram run
    val docs = Seq(
      (1L, s"$shared tail1 tail2"),                       // keeper (min id): intact
      (2L, s"pre1 $shared post1"),                        // dup holder: run excised
      (3L, "totally unrelated words with no repeats at all"))
      .toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(docs, "doc_id", "text", n = 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(got(0) === ((1L, 10L, 10L, s"$shared tail1 tail2")))
    assert(got(1) === ((2L, 10L, 2L, "pre1 post1")))
    assert(got(2)._2 === got(2)._3)                       // untouched doc
  }

  test("removeDuplicateSpans matches a brute-force keep-first reference") {
    val s = spark; import s.implicits._
    val n = 4
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(100 + seed)
      val vocab = Array("a", "b", "c", "d", "e")
      val docs = (1L to 12L).map { id =>
        id -> Array.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val gramsOf = docs.toMap.view.mapValues(_.split(" ")).toMap
        .map { case (id, ws) =>
          id -> (if (ws.length < n) Array.empty[(Int, String)]
                 else Array.tabulate(ws.length - n + 1)(i => i -> ws.slice(i, i + n).mkString(" ")))
        }
      val keeper = gramsOf.toSeq.flatMap { case (id, gs) => gs.map(g => g._2 -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        .filter(_._2.distinct.size > 1).map { case (g, ids) => g -> ids.min }
      val want = docs.map { case (id, text) =>
        val ws = text.split(" ")
        val drop = new Array[Boolean](ws.length)
        for ((p, g) <- gramsOf(id); kid <- keeper.get(g); if kid != id;
             k <- p until math.min(p + n, ws.length)) drop(k) = true
        val keptW = ws.indices.filterNot(drop).map(ws)
        (id, ws.length.toLong, keptW.length.toLong, keptW.mkString(" "))
      }.toSet
      val got = Dedup.removeDuplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text", n)
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("bloomDecontam flags planted eval copies map-side and misses clean docs") {
    val s = spark; import s.implicits._
    val ev = Seq(
      (100L, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10"),
      (101L, "f1 f2 f3 f4 f5 f6 f7 f8")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 extra"),  // contains eval grams
      (2L, "clean words that never appear in the eval suite at all here"),
      (3L, "f1 f2 f3 f4 f5 f6 f7 f8")).toDF("doc_id", "text")
    val got = Dedup.bloomDecontam(train, ev, "doc_id", "text", n = 8)
      .orderBy("doc_id").as[(Long, Long)].collect()
    // doc 1 holds 3 of eval-100's grams + 0 of f's; doc 3 is an exact copy
    assert(got.map(_._1).toSeq === Seq(1L, 3L))
    assert(got(0)._2 === 3L && got(1)._2 === 1L)
  }

  test("kmeans assignments are identical under any partitioning") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (1L to 60L).map { id =>
      (id, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }
    def run(parts: Int) =
      Ann.kmeans(docs.toDF("vec_id", "embedding").repartition(parts),
          "vec_id", "embedding", k = 4, iters = 3)
        .select("vec_id", "cluster").as[(Long, Int)].collect().sortBy(_._1)
    // the treeAggregate centroid update must commute exactly: quantized
    // long sums are partition-order independent, so 1 vs 7 vs 32
    // partitions give bit-identical centroids and assignments
    val one = run(1)
    assert(one === run(7))
    assert(one === run(32))
    assert(one.map(_._2).distinct.length > 1, "expect multiple clusters used")
  }

  test("embeddingContaminationFlag catches cosine-near eval vectors only") {
    val s = spark; import s.implicits._
    val ev = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (101L, Array(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val stream = Seq(
      (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)),  // near eval 100 (cos ~0.995)
      (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)),   // orthogonal to both
      (3L, Array(0.0f, -2.0f, 0.0f, 0.0f)),  // anti-parallel: cos -1, clean
      (4L, Array(0.1f, 0.99f, 0.0f, 0.0f)))  // near eval 101
      .toDF("vec_id", "embedding")
    val flag = Ann.embeddingContaminationFlag(ev, "embedding", threshold = 0.9)
    val got = stream.where(flag).select("vec_id").as[Long].collect().toSet
    assert(got === Set(1L, 4L))
  }

  test("autoBloomBits scales with the eval gram count under an FP bound") {
    import graft.llm.Dedup.autoBloomBits
    // floor: small eval sets stay at 2^22 (512 KB broadcast)
    assert(autoBloomBits(0L) === (1 << 22))
    assert(autoBloomBits(104857L) === (1 << 22))   // 40x just under 2^22
    // derived: the next power of two >= 40x grams -> occupancy <= 0.1,
    // 4 probes -> FP bounded by ~1e-4
    assert(autoBloomBits(104858L) === (1 << 23))   // 40x just over 2^22
    assert(autoBloomBits(1000000L) === (1 << 26))  // 40M -> 2^26
    (1L to 50L).map(_ * 77777L).foreach { g =>
      val b = autoBloomBits(g)
      assert((b & (b - 1)) === 0)
      assert(b >= (1 << 22))
      assert(b.toLong >= math.min(40L * g, 1L << 30) || b === (1 << 30))
    }
    // cap: never exceeds 2^30 (128 MB) however large the eval side
    assert(autoBloomBits(Long.MaxValue / 64) === (1 << 30))
    // auto (bits<=0 default) equals the explicit floor on a small eval
    // set, so pinned-constant oracles stay exact
    val s = spark; import s.implicits._
    val ev = Seq((100L, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 extra"),
      (2L, "clean words that never appear in the eval suite at all here"))
      .toDF("doc_id", "text")
    val auto = Dedup.bloomDecontam(train, ev, "doc_id", "text", n = 8)
      .orderBy("doc_id").as[(Long, Long)].collect()
    val pinned = Dedup.bloomDecontam(train, ev, "doc_id", "text", n = 8, bits = 1 << 22)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(auto.toSeq === pinned.toSeq)
  }

  test("tfidfTopTerms ranks distinctive terms above common ones") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "the the the zebra zebra quark"),
      (2L, "the the common words here"),
      (3L, "the common also here")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rnk")
      .select("doc_id", "term", "rnk").as[(Long, String, Int)].collect()
    // doc 1: "zebra" (tf 2, df 1) must outrank "the" (tf 3, df 3)
    val d1 = got.filter(_._1 == 1L).map(_._2)
    assert(d1.head === "zebra", s"got ${d1.toSeq}")
    assert(got.count(_._1 == 1L) === 2)
  }

  test("sourceVocabOverlap computes exact pairwise word-set jaccard") {
    val s = spark; import s.implicits._
    val docs = Seq(
      ("sA", "a b c d"), ("sA", "a b"),       // vocab A = {a,b,c,d}
      ("sB", "c d e"),                        // vocab B = {c,d,e}
      ("sC", "x y z")).toDF("source", "text") // vocab C disjoint
    val got = TextAnalysis.sourceVocabOverlap(docs, "source", "text")
      .orderBy("src_a", "src_b")
      .as[(String, String, Long, Double)].collect()
    // only A-B overlaps: shared {c,d} = 2, union = 5 -> 0.4
    assert(got === Array(("sA", "sB", 2L, 0.4)))
  }

  test("duplicateSpans merges overlapping gram hits and splits on gaps") {
    val s = spark; import s.implicits._
    val shared1 = "a b c d e f g h"                       // 8 tokens, dup run 1
    val shared2 = "p q r s t u v w"                       // dup run 2
    val docs = Seq(
      (1L, s"$shared1 i j"),                              // hits at 0,1 -> one span, 9 covered
      (2L, s"x $shared1 i y"),                            // hits at 1,2 -> one span, 9 covered
      (3L, s"$shared1 g1 g2 g3 g4 $shared2"),             // two disjoint spans
      (4L, s"z1 z2 $shared2 z3"),                         // second run's partner
      (5L, "nothing here repeats across documents at all truly")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, "doc_id", "text", n = 8)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._1) === Array(1L, 2L, 3L, 4L))       // doc 5 has no dup text
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L) === ((1L, 10L, 1L, 9L)))
    assert(byId(2L) === ((2L, 11L, 1L, 9L)))
    assert(byId(3L)._3 === 2L && byId(3L)._4 === 16L)     // two 8-token spans
    assert(byId(4L) === ((4L, 11L, 1L, 8L)))
  }

  test("duplicateSpans survives a hot boilerplate gram with a partial-agg plan") {
    val s = spark; import s.implicits._
    // one boilerplate 8-gram planted in EVERY doc — the 100-TB hot-key
    // shape: a window over partitionBy(gh) would serialize all N
    // occurrences into one task; the partial-agg + join-back shape must
    // still produce the same answer and a window-free plan
    val boiler = "this page is for subscribers only please login"
    val docs = (1L to 2000L).map { id =>
      (id, s"unique${id}a unique${id}b $boiler unique${id}c")
    }.toDF("doc_id", "text")
    val res = Dedup.duplicateSpans(docs, "doc_id", "text", n = 8)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "hot-gram pass must not use a window")
    assert(plan.contains("HashAggregate"), "expected map-side partial aggregation")
    val got = res.as[(Long, Long, Long, Long)].collect()
    // every doc holds the boilerplate run: one span of 8 tokens, 11 total
    assert(got.length === 2000)
    assert(got.forall(r => r._2 === 11L && r._3 === 1L && r._4 === 8L))
  }

  test("dupGramHits' gram cache never outlives the consuming query") {
    val s = spark; import s.implicits._
    val docs = (1L to 200L).map { id =>
      (id, s"shared eight token run here for all docs tail$id")
    }.toDF("doc_id", "text")
    // other suites may persist concurrently on the shared SparkContext:
    // judge only the RDD ids THIS test's queries create (diff vs baseline)
    def newIds(baseline: Set[Int]): Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet -- baseline
    val base0 = spark.sparkContext.getPersistentRDDs.keySet.toSet
    // default gate (1 GiB): a tiny input must not persist anything at all
    Dedup.duplicateSpans(docs, "doc_id", "text", n = 8).collect()
    assert(newIds(base0).isEmpty,
      "below the size gate, no gram cache should ever be created")
    // gate forced to 0: the cache exists for the query, then is released
    // by the QueryExecutionListener (async — poll with a deadline)
    spark.conf.set("spark.graft.dedup.gramCacheMinBytes", "0")
    try {
      val base1 = spark.sparkContext.getPersistentRDDs.keySet.toSet
      Dedup.removeDuplicateSpans(docs, "doc_id", "text", n = 8).collect()
      val end = System.currentTimeMillis + 30000
      while (newIds(base1).nonEmpty && System.currentTimeMillis < end) Thread.sleep(50)
      assert(newIds(base1).isEmpty,
        "gram cache must be unpersisted when the consuming query completes")
    } finally spark.conf.unset("spark.graft.dedup.gramCacheMinBytes")
  }

  test("importanceWeights favors target-like raw docs and bounds state by buckets") {
    val s = spark; import s.implicits._
    // target: docs about cats; raw: one cat-like doc, one dog doc
    val docs = Seq(
      (1L, true,  "cat cat feline whiskers purr"),
      (2L, true,  "cat kitten feline meow purr"),
      (3L, false, "cat feline purr whiskers kitten"),   // target-like raw
      (4L, false, "dog canine bark fetch growl"),       // off-target raw
      (5L, false, ""),                                  // empty -> no row
      (6L, true,  "purr meow cat")).toDF("doc_id", "is_t", "text")
    val got = TextAnalysis.importanceWeights(docs, col("is_t"), "doc_id", "text",
        buckets = 256)
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(got.map(_._1) === Array(3L, 4L))            // only non-empty raw docs
    assert(got(0)._2 === 5L && got(1)._2 === 5L)
    // the cat-like raw doc must outscore the dog doc
    assert(got(0)._3 > got(1)._3,
      s"target-like doc ${got(0)._3} should outweigh off-target ${got(1)._3}")
  }

  test("verifiedNearDupPairs: exact threshold holds; word-set-identical pairs guaranteed") {
    val s = spark; import s.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),                                   // identical word set to 2
      (2L, "kappa " + base),                        // same set, reordered+dup word
      (3L, base + " lambda"),                       // 10/11 = 909 permille vs 1,2
      (4L, base.split(" ").take(5).mkString(" ")),  // 5/10 = 500 vs 1
      (5L, "unrelated words entirely different from others")
    ).toDF("doc_id", "text")
    val got = Dedup.verifiedNearDupPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 8, minJaccardPermille = 900)
      .select("id_a", "id_b", "n_common", "n_union")
      .as[(Long, Long, Long, Long)].collect()
    // the exact cut holds on every emitted pair
    got.foreach { case (a, b, c, u) =>
      assert(c * 1000 >= 900 * u, s"pair ($a,$b) violates the 900-permille cut: $c/$u") }
    // identical word sets collide in every band -> guaranteed presence
    assert(got.exists(p => p._1 == 1L && p._2 == 2L), "identical word-set pair missing")
    val pairSet = got.map(p => (p._1, p._2)).toSet
    assert(!pairSet.contains((1L, 4L)) && !pairSet.contains((1L, 5L)),
      "below-threshold pairs must never be emitted")
    // n_common/n_union are the exact word-set sizes
    val p12 = got.find(p => p._1 == 1L && p._2 == 2L).get
    assert(p12._3 === 10L && p12._4 === 10L)
  }

  test("gopherSignals computes each rule's signal and the pass flag") {
    val s = spark; import s.implicits._
    val good = ((1 to 60).map(i => s"alpha$i the of and that").mkString(" "))
    val docs = Seq(
      (1L, good),                                   // 300 words, stops, clean -> passes
      (2L, ""),                                     // empty -> n_words 0, fails
      (3L, "- one\n- two\n- three\nplain"),         // 3/4 bullet lines
      (4L, "start...\nmiddle...\nplain\nplain"),    // 2/4 ellipsis lines
      (5L, "# # # tag " + (1 to 60).map(i => s"w$i the of and that").mkString(" ")), // symbols
      (6L, "12345 67890 999 " + good)               // digit-only words dilute alpha frac
    ).toDF("doc_id", "text")
    val g = docs.select($"doc_id",
        graft.llm.TextAnalysis.gopherSignals($"text").as("g"))
      .select($"doc_id", $"g.n_words", $"g.mean_word_len", $"g.symbol_ratio",
        $"g.bullet_frac", $"g.ellipsis_frac", $"g.alpha_word_frac", $"g.n_stop", $"g.passes")
      .orderBy("doc_id").collect()
    assert(g(0).getLong(1) === 300L && g(0).getBoolean(8) === true)
    assert(g(1).getLong(1) === 0L && g(1).getBoolean(8) === false)
    assert(g(2).getDouble(4) === 0.75)     // bullet_frac
    assert(g(3).getDouble(5) === 0.5)      // ellipsis_frac
    assert(g(4).getDouble(3) > 0.0 && g(4).getLong(7) === 4L)
    assert(g(5).getDouble(6) < 1.0)        // digit words lower alpha_word_frac
    // custom required-word list swaps the vocabulary prior
    val custom = docs.where($"doc_id" === 1L)
      .select(graft.llm.TextAnalysis.gopherSignals($"text", Seq("alpha1", "alpha2"))
        .getField("n_stop")).head().getLong(0)
    assert(custom === 2L)
  }

  test("shufflePositions is a deterministic permutation from a distributed sort") {
    val s = spark; import s.implicits._
    val df = (0L until 5000L).map(i => (i, s"doc$i")).toDF("id", "payload")
    val out = Sampling.shufflePositions(df, "id", "seedA")
    val positions = out.select("pos").as[Long].collect().sorted
    assert(positions === (0L until 5000L).toArray, "pos is a 0-based permutation")
    // deterministic: same (seed, key) -> same position, under any partitioning
    val again = Sampling.shufflePositions(df.repartition(13), "id", "seedA")
      .select("id", "pos").as[(Long, Long)].collect().toMap
    val first = out.select("id", "pos").as[(Long, Long)].collect().toMap
    assert(again === first)
    // a different seed is a different permutation
    val other = Sampling.shufflePositions(df, "id", "seedB")
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(other !== first)
    // the order work is distributed: the rank window is __pid-scoped (a
    // global, partition-less window would collapse the sort into one task)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("__pid"), s"rank window not partition-id-scoped:\n$plan")
  }

  test("rebalanceByGroup rank is a distributed prefix sum: >1 task per group") {
    val s = spark; import s.implicits._
    val df = (0L until 40000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "grp")
    val res = Sampling.rebalanceByGroup(df, "grp", "id", Map("a" -> 500, "b" -> 500))
    val got = res.groupBy("grp").count().as[(String, Long)].collect().toMap
    // T = min(20000*1000/500 x2) = 40000; keep = 500*40000/1000 = 20000 each
    assert(got === Map("a" -> 20000L, "b" -> 20000L))
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("__pid"), s"rank window not partition-id-scoped:\n$plan")
  }

  test("bigramSurprisal matches a hand computation") {
    val s = spark; import s.implicits._
    // corpus: "a b a" and "a b" -> unigrams a:3 b:2, N=5
    // bigrams: (a,b):2, (b,a):1
    val df = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramSurprisal(df, "doc_id", "text", lambdaPermille = 700)
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    val pAB = 0.7 * 2.0 / 3.0 + 0.3 * 2.0 / 5.0 // P(b|a)
    val pBA = 0.7 * 1.0 / 2.0 + 0.3 * 3.0 / 5.0 // P(a|b)
    val d1 = (-math.log(pAB) + -math.log(pBA)) / 2.0
    val d2 = -math.log(pAB)
    assert(got.length === 2)
    assert(got(0)._1 === 1L && got(0)._2 === 2L && math.abs(got(0)._3 - d1) < 1e-12)
    assert(got(1)._1 === 2L && got(1)._2 === 1L && math.abs(got(1)._3 - d2) < 1e-12)
    // single-token docs produce no bigram events
    val none = TextAnalysis.bigramSurprisal(Seq((9L, "solo")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(none.count() === 0)
  }

  test("corpusDiff classifies by content hash, null-text-safe") {
    val s = spark; import s.implicits._
    val old = Seq((1L, "same"), (2L, "will change"), (3L, "gone"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val neu = Seq((1L, "same"), (2L, "changed!"), (5L, "fresh"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextAnalysis.corpusDiff(old, neu, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
  }
}
