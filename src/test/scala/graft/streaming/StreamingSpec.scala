package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.S2Functions

class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", false)
      .appName("graft-streaming-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    S2Functions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("sessionize splits on the idle gap") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val input = MemoryStream[Sessions.Event]
    val out = Sessions.sessionize(input.toDS())
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // user 1: two sessions separated by a 60-min gap; user 2: one session
    input.addData(
      Sessions.Event(1, ts(0), 1, "view", 1.0),
      Sessions.Event(2, ts(10), 1, "view", 1.0),
      Sessions.Event(3, ts(80), 1, "buy", 1.0),
      Sessions.Event(4, ts(5), 2, "view", 1.0))
    q.processAllAvailable()
    // push the watermark far ahead so timeouts fire
    input.addData(Sessions.Event(99, ts(10000), 3, "view", 1.0))
    q.processAllAvailable()
    val rows = spark.table("sessions").as[Sessions.SessionOut].collect()
    q.stop()
    val u1 = rows.filter(_.user_id == 1).sortBy(_.session_start.getTime)
    assert(u1.length === 2)
    assert(u1(0).n_events === 2)
    assert(u1(1).n_events === 1)
    assert(rows.count(_.user_id == 2) === 1)
  }

  test("hourly rollup with watermark") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val input = MemoryStream[Sessions.Event]
    val out = Sessions.hourlyRollup(input.toDF())
    val q = out.writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()
    input.addData(
      Sessions.Event(1, ts(0), 1, "view", 1.0),
      Sessions.Event(2, ts(30), 2, "view", 1.0),
      Sessions.Event(3, ts(61), 1, "buy", 1.0))
    q.processAllAvailable()
    input.addData(Sessions.Event(9, ts(10000), 9, "view", 1.0)) // close windows
    q.processAllAvailable()
    val rows = spark.table("hourly").collect()
    q.stop()
    assert(rows.exists(r => r.getAs[String]("event_type") == "view" && r.getAs[Long]("n") == 2))
    assert(rows.exists(r => r.getAs[String]("event_type") == "buy" && r.getAs[Long]("n") == 1))
  }

  test("streaming dedup keeps first doc per content fingerprint") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = Sessions.dedupStream(
      input.toDF().toDF("doc_id", "ts", "text"), "text")
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    input.addData(
      (1L, ts(0), "the quick brown fox"),
      (2L, ts(1), "the quick brown fox"), // dup within the watermark
      (3L, ts(2), "something else"))
    q.processAllAvailable()
    val rows = spark.table("dedup_stream").select("doc_id").as[Long].collect().toSet
    q.stop()
    assert(rows === Set(1L, 3L))
  }

  test("streaming near-dedup flags LSH collisions against earlier docs") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = Sessions.nearDedupStream(
      input.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text",
      watermark = "30 minutes", windowSize = "1 minute",
      numHashes = 64, bands = 8)
    val q = out.writeStream.format("memory").queryName("near_dedup_stream")
      .outputMode("append").start()
    // batch 1: the original claims all its buckets
    input.addData((1L, ts(0), "the quick brown fox jumps over the lazy dog"))
    q.processAllAvailable()
    // batch 2: a word-reordered near-dup (identical word set -> identical
    // signature: loses every band) and a genuinely fresh doc
    input.addData(
      (2L, ts(1), "dog lazy the over jumps fox brown quick the"),
      (3L, ts(2), "completely unrelated text about catalyst optimizer rules"))
    q.processAllAvailable()
    // close the event-time windows so append mode emits
    input.addData((99L, ts(10000), "watermark push row to flush windows"))
    q.processAllAvailable()
    val rows = spark.table("near_dedup_stream")
      .select("doc_id", "n_bands", "novel").as[(Long, Long, Boolean)]
      .collect().sortBy(_._1)
    q.stop()
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 === 8L && byId(1L)._3, "original must claim all bands")
    assert(!byId.contains(2L), "exact-signature twin loses every band")
    assert(byId(3L)._2 === 8L && byId(3L)._3, "fresh doc must be novel")
  }

  test("streaming near-dedup band claims match the batch bucket computation") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val original = "alpha beta gamma delta epsilon zeta eta theta iota"
    val edited = "alpha beta gamma delta epsilon zeta eta theta DIFFERENT"
    // batch twin: how many of the edited doc's band buckets differ from
    // the original's? Signatures are deterministic, so this is exact.
    val bk = graft.llm.Dedup.lshBandBuckets(
      graft.llm.Dedup.minhashSignature(col("text"), 64), 64, 8)
    val Array(b1, b2) = Seq(original, edited).toDF("text")
      .select(bk.as("bks")).as[Array[Long]].collect()
    val expectClaimed = b1.zip(b2).count { case (x, y) => x != y }
    assume(expectClaimed > 0 && expectClaimed < 8,
      "test strings should partially collide; adjust if hashing changes")

    val input = MemoryStream[(Long, Timestamp, String)]
    val out = Sessions.nearDedupStream(
      input.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text",
      watermark = "30 minutes", windowSize = "1 minute")
    val q = out.writeStream.format("memory").queryName("near_dedup_partial")
      .outputMode("append").start()
    input.addData((1L, ts(0), original))
    q.processAllAvailable()
    input.addData((2L, ts(1), edited))
    q.processAllAvailable()
    input.addData((99L, ts(10000), "watermark push row to flush windows"))
    q.processAllAvailable()
    val rows = spark.table("near_dedup_partial")
      .select("doc_id", "n_bands", "novel").as[(Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    q.stop()
    assert(rows(1L)._2 === 8L && rows(1L)._3)
    // the edited doc claims exactly the bands whose buckets differ from
    // the original's, and is flagged non-novel (an LSH candidate pair)
    assert(rows(2L)._2 === expectClaimed.toLong)
    assert(!rows(2L)._3)
  }

  test("streaming near-dedup reports an LSH false-positive collider as novel=false") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    // single-hash bands (numHashes == bands) make per-band collision
    // probability equal to Jaccard, so a LOW-jaccard pair colliding on
    // SOME band — a genuine LSH false positive — is findable
    // deterministically among a few hundred candidates
    val nh = 8; val nb = 8
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    // candidates share exactly 2 of 14 distinct words with base
    // (jaccard ~0.14 — not a near-duplicate under any sane threshold)
    val cands = (0 until 300).map { i =>
      (i.toLong, s"alpha beta w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f")
    }
    val bk = graft.llm.Dedup.lshBandBuckets(
      graft.llm.Dedup.minhashSignature(col("text"), nh), nh, nb)
    val baseB = Seq(base).toDF("text").select(bk).as[Array[Long]].head()
    val fp = cands.toDF("id", "text").select(col("id"), bk.as("b"))
      .as[(Long, Array[Long])].collect()
      .map { case (id, b) => (id, b.zip(baseB).count { case (x, y) => x == y }) }
      .find { case (_, shared) => shared >= 1 && shared < nb }
    assert(fp.isDefined,
      "expected a partial band collision among 300 low-jaccard candidates")
    val (fpId, shared) = fp.get
    val fpText = cands(fpId.toInt)._2

    val input = MemoryStream[(Long, Timestamp, String)]
    val out = Sessions.nearDedupStream(
      input.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text",
      watermark = "30 minutes", windowSize = "1 minute",
      numHashes = nh, bands = nb)
    val q = out.writeStream.format("memory").queryName("near_dedup_fp")
      .outputMode("append").start()
    input.addData((1L, ts(0), base))
    q.processAllAvailable()
    input.addData((2L, ts(1), fpText))
    q.processAllAvailable()
    input.addData((99L, ts(10000), "watermark push row to flush windows"))
    q.processAllAvailable()
    val rows = spark.table("near_dedup_fp")
      .select("doc_id", "n_bands", "novel").as[(Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    q.stop()
    assert(rows(1L)._2 === nb.toLong && rows(1L)._3)
    // CONTRACT PIN: a doc that loses bands to a NON-duplicate collider
    // (LSH false positive) is reported novel=false — `novel` is the
    // band-claim (candidate) test, exactly batch LSH semantics, NOT a
    // verified-duplicate guarantee; precision filtering (e.g. jaccard
    // on the flagged pairs) is downstream, as in batch
    assert(rows(2L)._2 === (nb - shared).toLong,
      "collider claims exactly the non-colliding bands")
    assert(!rows(2L)._3, "false-positive collider must surface as novel=false")
  }

  test("streaming as-of join matches the batch as-of on in-order data") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val rnd = new scala.util.Random(7211)
    // unique (key, ts) rights, as the batch contract requires
    val rights = (1 to 8).flatMap { k =>
      rnd.shuffle((0 until 500).toList).take(25).map(t =>
        Sessions.AsofRight(k.toLong, ts(t), rnd.nextDouble()))
    }
    val lefts = (1L to 150L).map(i =>
      Sessions.AsofLeft((rnd.nextInt(8) + 1).toLong, ts(rnd.nextInt(500)), i))

    val lIn = MemoryStream[Sessions.AsofLeft]
    val rIn = MemoryStream[Sessions.AsofRight]
    val out = Sessions.asofJoinStream(lIn.toDS(), rIn.toDS(), watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    // feed in EVENT-TIME order, interleaved, in several batches
    val all = (lefts.map(l => (l.ts.getTime, 1, Left(l))) ++
        rights.map(r => (r.ts.getTime, 0, Right(r)))).sortBy(x => (x._1, x._2))
    for (chunk <- all.grouped(60)) {
      chunk.foreach {
        case (_, _, Left(l))  => lIn.addData(l)
        case (_, _, Right(r)) => rIn.addData(r)
      }
      q.processAllAvailable()
    }
    val got = spark.table("asof_stream").as[Sessions.AsofOut].collect()
      .map(o => o.left_id -> ((o.asof_ts, o.asof_value))).toMap
    q.stop()
    assert(got.size === 150, "every left event emits exactly once")

    val expect = graft.spark.AsofJoin.asofJoin(
        lefts.map(l => (l.left_id, l.key, l.ts)).toDF("left_id", "key", "ts"),
        rights.map(r => (r.key, r.ts, r.value)).toDF("key", "ts", "pval"),
        Seq("key"), "ts", Seq("pval"))
      .select("left_id", "asof_ts", "asof_pval")
      .as[(Long, Option[Timestamp], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === expect, "stream and batch as-of must agree on in-order data")
  }

  test("streaming as-of join: a late right serves later lefts, never emitted ones") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val lIn = MemoryStream[Sessions.AsofLeft]
    val rIn = MemoryStream[Sessions.AsofRight]
    val out = Sessions.asofJoinStream(lIn.toDS(), rIn.toDS(), watermark = "30 minutes")
    val q = out.writeStream.format("memory").queryName("asof_stream_late")
      .outputMode("append").start()
    lIn.addData(Sessions.AsofLeft(1L, ts(100), 1L))     // no right yet -> null match
    q.processAllAvailable()
    // late in PROCESSING order, event-time before left 1 but inside the
    // 30-min watermark (wm is ts(70) after batch 1) — so not dropped
    rIn.addData(Sessions.AsofRight(1L, ts(80), 5.0))
    q.processAllAvailable()
    lIn.addData(Sessions.AsofLeft(1L, ts(101), 2L))     // later left -> sees the late right
    q.processAllAvailable()
    val got = spark.table("asof_stream_late").as[Sessions.AsofOut].collect()
      .map(o => o.left_id -> o.asof_value).toMap
    q.stop()
    assert(got(1L) === None, "already-emitted left is NOT retro-updated (append contract)")
    assert(got(2L) === Some(5.0), "the late right serves subsequent lefts")
  }

  test("interval join runs stream-static: streaming points against static ranges") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    // both paths exercised: iid 1-2 short (binned equi-join), iid 3 giant
    // (broadcast) — stateless stream-static joins, append mode, no state
    val ivs = Seq((1L, 0L, 30L), (2L, 25L, 60L), (3L, -1000000L, 1000000L))
      .toDF("iid", "lo", "hi")
    val input = MemoryStream[(Long, Long)]
    val out = graft.spark.RangeJoin.intervalJoin(
      input.toDF().toDF("pid", "p"), "p", ivs, "lo", "hi",
      binWidth = 16L, maxBinsPerInterval = 8)
    val q = out.select("pid", "iid").writeStream.format("memory")
      .queryName("interval_stream").outputMode("append").start()
    input.addData((1L, 10L), (2L, 28L), (3L, 999L))
    q.processAllAvailable()
    input.addData((4L, 59L))
    q.processAllAvailable()
    val got = spark.table("interval_stream").as[(Long, Long)].collect().sorted
    q.stop()
    assert(got === Array((1L, 1L), (1L, 3L), (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 3L), (4L, 2L), (4L, 3L)))
  }

  test("stream-static dedup drops docs already in the reference corpus") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val corpus = Seq((100L, "seen before"), (101L, "also seen")).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val out = Sessions.dedupAgainstCorpus(
      input.toDF().toDF("doc_id", "text"), "text", corpus, "text")
    val q = out.writeStream.format("memory").queryName("corpus_dedup_stream")
      .outputMode("append").start()
    input.addData(
      (1L, "seen before"),      // contaminated -> dropped
      (2L, "genuinely new"),
      (3L, "also seen"),        // contaminated -> dropped
      (4L, "another new one"))
    q.processAllAvailable()
    val rows = spark.table("corpus_dedup_stream").select("doc_id").as[Long].collect().toSet
    q.stop()
    assert(rows === Set(2L, 4L))
  }

  test("stream-vs-index near-dedup flags the batch dup set against a static band index") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val corpus = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(length(trim(col("text"))) > 0)
    val index = graft.llm.Dedup.bandIndex(corpus, "doc_id", "text",
      numHashes = 64, bands = 4)
    // batch of copies (must flag) + salted variants (flag iff batch says so)
    val batch = corpus.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .unionByName(corpus.where(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" zz"), col("doc_id").cast("string")).as("text")))
    val expected = graft.llm.Dedup.nearDupAgainstIndex(batch, index,
        "doc_id", "text", numHashes = 64, bands = 4)
      .where(col("dup")).select("doc_id").as[Long].collect().toSet
    val rows = batch.select("doc_id", "text").as[(Long, String)].collect()
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = Sessions.nearDupAgainstIndexStream(
      input.toDF().toDF("doc_id", "text", "ts"), index, "doc_id", "text",
      numHashes = 64, bands = 4)
    val q = out.writeStream.format("memory").queryName("index_neardup_stream")
      .outputMode("append").start()
    input.addData(rows.toIndexedSeq.map { case (id, t) =>
      (id, t, Timestamp.valueOf("2026-01-01 00:00:00")) })
    q.processAllAvailable()
    val streamed = spark.table("index_neardup_stream")
      .select("doc_id").as[Long].collect().toSet
    q.stop()
    assert(streamed === expected,
      "streamed index-collision set must equal the batch nearDupAgainstIndex dup set")
    // every exact copy of an indexed doc must be flagged
    assert(rows.map(_._1).filter(_ < 2000000L).forall(streamed.contains))
  }

  test("bloom contamination flag filters an ingestion stream statelessly") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val ev = Seq(
      (100L, "e1 e2 e3 e4 e5 e6 e7 e8 e9")).toDF("doc_id", "text")
    val flag = graft.llm.Dedup.bloomContaminationFlag(ev, "doc_id", "text", n = 8)
    val input = MemoryStream[(Long, String)]
    val out = input.toDF().toDF("doc_id", "text").where(flag)
    val q = out.writeStream.format("memory").queryName("bloom_stream")
      .outputMode("append").start()
    input.addData(
      (1L, "prefix e1 e2 e3 e4 e5 e6 e7 e8 suffix"), // shares an eval 8-gram
      (2L, "totally clean words nothing shared with the eval suite here"),
      (3L, "e2 e3 e4 e5 e6 e7 e8 e9"))               // eval tail gram
    q.processAllAvailable()
    val rows = spark.table("bloom_stream").select("doc_id").as[Long].collect().toSet
    q.stop()
    assert(rows === Set(1L, 3L))
  }

  test("perceptual media hashing runs on a stream statelessly, matching batch") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    def png(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val rows = Seq(
      (1L, png(16, 16, (x, _) => if (x < 8) 0 else 0xFFFFFF)),
      (2L, png(16, 16, (_, y) => if (y < 8) 0 else 0xFFFFFF)),
      (3L, "junk".getBytes("UTF-8")))
    val batch = graft.llm.Multimodal.imageHashes(rows.toDF("media_id", "payload"))
      .as[(Long, Option[Long])].collect().toSet
    val input = MemoryStream[(Long, Array[Byte])]
    val out = graft.llm.Multimodal.imageHashes(
      input.toDF().toDF("media_id", "payload"))
    val q = out.writeStream.format("memory").queryName("imghash_stream")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("imghash_stream")
      .as[(Long, Option[Long])].collect().toSet
    q.stop()
    assert(streamed === batch)
    assert(batch.exists { case (id, h) => id == 3L && h.isEmpty })
  }

  test("audio and video fingerprints run on streams statelessly, matching batch") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    def wav(samples: Array[Float]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length * 2)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
      samples.foreach(v => bb.putShort(math.round(v * 32767f).toShort))
      bb.array()
    }
    val burst = Array.tabulate(6400)(i =>
      ((if (i < 3200) 0.9 else 0.05) * math.sin(2 * math.Pi * 440 * i / 8000)).toFloat)
    val rows = Seq((1L, wav(burst)), (2L, "junk".getBytes("UTF-8")))
    val batch = graft.llm.Multimodal.audioHashes(rows.toDF("media_id", "payload"))
      .as[(Long, Option[Long])].collect().toSet
    val input = MemoryStream[(Long, Array[Byte])]
    val q = graft.llm.Multimodal.audioHashes(input.toDF().toDF("media_id", "payload"))
      .writeStream.format("memory").queryName("audiohash_stream")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("audiohash_stream")
      .as[(Long, Option[Long])].collect().toSet
    q.stop()
    assert(streamed === batch)
    assert(batch.exists { case (id, h) => id == 1L && h.isDefined })
  }

  test("weighted sampling filters an ingestion stream statelessly, matching batch") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val rows = (1L to 500L).map(i => (i, (i % 11) / 10.0))
    val batchKept = graft.llm.Sampling.weightedSample(
        rows.toDF("doc_id", "w"), "doc_id", col("w"))
      .select("doc_id").as[Long].collect().toSet
    val input = MemoryStream[(Long, Double)]
    val out = graft.llm.Sampling.weightedSample(
      input.toDF().toDF("doc_id", "w"), "doc_id", col("w"))
    val q = out.writeStream.format("memory").queryName("wsample_stream")
      .outputMode("append").start()
    input.addData(rows.take(250): _*)
    q.processAllAvailable()
    input.addData(rows.drop(250): _*)
    q.processAllAvailable()
    val streamKept = spark.table("wsample_stream")
      .select("doc_id").as[Long].collect().toSet
    q.stop()
    assert(streamKept === batchKept)
  }

  test("ingest pipeline (dedup + bloom decontam + chunk) matches its batch twin") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    // eval suite for the Bloom gate: doc 3 below shares its 8-gram
    val ev = Seq((100L, "e1 e2 e3 e4 e5 e6 e7 e8")).toDF("doc_id", "text")
    val flag = graft.llm.Dedup.bloomContaminationFlag(ev, "doc_id", "text", n = 8)
    val docs = Seq(
      (1L, ts(0), "alpha beta gamma delta " * 20),     // long: several chunks
      (2L, ts(1), "alpha beta gamma delta " * 20),     // exact dup of 1
      (3L, ts(2), "bad e1 e2 e3 e4 e5 e6 e7 e8 tail"), // contaminated
      (4L, ts(3), "a genuinely fresh document"))
    // ONE streaming query: exact-dedup fingerprint, stateless Bloom
    // contamination gate, then chunking — the full ingest shape
    val input = MemoryStream[(Long, Timestamp, String)]
    val deduped = Sessions.dedupStream(
      input.toDF().toDF("doc_id", "ts", "text"), "text")
    val out = graft.llm.TextAnalysis.chunkText(
      deduped.where(!flag), "doc_id", "text", chunkChars = 100, overlapChars = 20)
    val q = out.writeStream.format("memory").queryName("ingest_stream")
      .outputMode("append").start()
    input.addData(docs: _*)
    q.processAllAvailable()
    val got = spark.table("ingest_stream").collect()
    q.stop()
    // batch twin: same ops, batch semantics (dedup on the same fingerprint)
    val want = graft.llm.TextAnalysis.chunkText(
      docs.toDF("doc_id", "ts", "text").dropDuplicates("text").where(!flag),
      "doc_id", "text", chunkChars = 100, overlapChars = 20).collect()
    // chunk payloads identical regardless of which dup-group member survived
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Int]("chunk_ix"), r.getAs[String]("chunk"))
    assert(got.map(key).toSet === want.map(key).toSet)
    // the contaminated doc is gone, the dup group kept exactly one member
    val ids = got.map(_.getAs[Long]("doc_id")).toSet
    assert(!ids.contains(3L) && ids.contains(4L))
    assert(ids.intersect(Set(1L, 2L)).size === 1)
  }

  test("embedding contamination flag filters an ingestion stream statelessly") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val ev = Seq((100L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val flag = graft.llm.Ann.embeddingContaminationFlag(ev, "embedding", 0.95)
    val input = MemoryStream[(Long, Array[Float])]
    val out = input.toDF().toDF("vec_id", "embedding").where(!flag)
    val q = out.writeStream.format("memory").queryName("emb_decontam_stream")
      .outputMode("append").start()
    input.addData(
      (1L, Array(0.999f, 0.01f, 0.0f)),  // paraphrase-close to eval: dropped
      (2L, Array(0.0f, 1.0f, 0.0f)))     // clean: survives
    q.processAllAvailable()
    val rows = spark.table("emb_decontam_stream").select("vec_id").as[Long].collect().toSet
    q.stop()
    assert(rows === Set(2L))
  }

  test("pq encoding compresses an embedding stream statelessly, matching batch codes") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val corpus = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cb = graft.llm.Ann.pqTrain(corpus, m = 8, ksub = 16, sampleN = 128)
    val batch = graft.llm.Ann.pqEncode(corpus.limit(20), cb)
      .as[(Long, Array[Byte])].collect().toMap
    val input = MemoryStream[(Long, Array[Float])]
    val out = graft.llm.Ann.pqEncode(input.toDF().toDF("vec_id", "embedding"), cb)
    val q = out.writeStream.format("memory").queryName("pq_stream")
      .outputMode("append").start()
    val rows = corpus.limit(20).select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    input.addData(rows.toIndexedSeq)
    q.processAllAvailable()
    val streamed = spark.table("pq_stream").as[(Long, Array[Byte])].collect().toMap
    q.stop()
    assert(streamed.keySet === batch.keySet)
    for ((id, code) <- streamed)
      assert(java.util.Arrays.equals(code, batch(id)), s"stream code differs for $id")
  }

  test("ivf-pq encoding routes and codes an embedding stream statelessly, matching batch") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val corpus = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = graft.llm.Ann.ivfPqTrain(corpus, nlist = 8, m = 8, ksub = 16, sampleN = 128)
    val batch = graft.llm.Ann.ivfPqEncode(model, corpus.limit(20))
      .as[(Long, Int, Array[Byte])].collect()
      .map { case (id, cell, code) => id -> ((cell, code)) }.toMap
    val input = MemoryStream[(Long, Array[Float])]
    val out = graft.llm.Ann.ivfPqEncode(model, input.toDF().toDF("vec_id", "embedding"))
    val q = out.writeStream.format("memory").queryName("ivfpq_stream")
      .outputMode("append").start()
    val rows = corpus.limit(20).select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    input.addData(rows.toIndexedSeq)
    q.processAllAvailable()
    val streamed = spark.table("ivfpq_stream").as[(Long, Int, Array[Byte])]
      .collect().map { case (id, cell, code) => id -> ((cell, code)) }.toMap
    q.stop()
    assert(streamed.keySet === batch.keySet)
    for ((id, (cell, code)) <- streamed) {
      assert(cell === batch(id)._1, s"stream cell differs for $id")
      assert(java.util.Arrays.equals(code, batch(id)._2), s"stream code differs for $id")
    }
  }

  test("bpe encoding tokenizes a text stream statelessly, matching batch tokens") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"))
    val texts = Seq((1L, "lowest estates"), (2L, "stole tests"))
    val batch = graft.llm.Bpe.encode(texts.toDF("doc_id", "text"), "text", merges)
      .select("doc_id", "bpe_tokens").as[(Long, Seq[String])].collect().toMap
    val input = MemoryStream[(Long, String)]
    val out = graft.llm.Bpe.encode(input.toDF().toDF("doc_id", "text"), "text", merges)
      .select("doc_id", "bpe_tokens")
    val q = out.writeStream.format("memory").queryName("bpe_stream")
      .outputMode("append").start()
    input.addData(texts)
    q.processAllAvailable()
    val streamed = spark.table("bpe_stream").as[(Long, Seq[String])].collect().toMap
    q.stop()
    assert(streamed === batch)
  }

  test("unigram-LM surprisal gate scores an ingestion stream statelessly, matching batch") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val corpus = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val score = graft.llm.TextAnalysis.unigramGateScore(corpus, "text")
    val sample = corpus.limit(15).select("doc_id", "text")
      .as[(Long, String)].collect()
    val batch = sample.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), round(score(col("text")), 6).as("s"))
      .as[(Long, Double)].collect().toMap
    val input = MemoryStream[(Long, String)]
    val out = input.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), round(score(col("text")), 6).as("s"))
    val q = out.writeStream.format("memory").queryName("gate_stream")
      .outputMode("append").start()
    input.addData(sample.toIndexedSeq)
    q.processAllAvailable()
    val streamed = spark.table("gate_stream").as[(Long, Double)].collect().toMap
    q.stop()
    assert(streamed === batch)
  }

  test("trained quality classifier gates an ingestion stream statelessly") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val good = (1 to 30).map(i => (s"thoughtful analysis with careful prose item$i", true))
    val bad = (1 to 30).map(i => (s"spam spam click here now item$i", false))
    val model = graft.llm.Classifier.train(
      (good ++ bad).toDF("text", "y"), "text", "y", dim = 1 << 12, iters = 30, lr = 5.0)
    val input = MemoryStream[(Long, String)]
    val out = input.toDF().toDF("doc_id", "text")
      .where(graft.llm.Classifier.scoreProb(model)(col("text")) >= 0.5)
    val q = out.writeStream.format("memory").queryName("cls_stream")
      .outputMode("append").start()
    input.addData(
      (1L, "a thoughtful careful analysis"),
      (2L, "spam click now"),
      (3L, "careful prose"))
    q.processAllAvailable()
    val kept = spark.table("cls_stream").select("doc_id").as[Long].collect().toSet
    q.stop()
    assert(kept === Set(1L, 3L))
  }

  test("stateless geo expressions run on streams") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val input = MemoryStream[(Double, Double)]
    val out = input.toDF().toDF("lon", "lat")
      .selectExpr("s2_cell_token(s2_cellfromlonlat(lon, lat)) AS tok")
    val q = out.writeStream.format("memory").queryName("geo_stream").start()
    input.addData((-64.0, 45.0))
    q.processAllAvailable()
    val toks = spark.table("geo_stream").as[String].collect()
    q.stop()
    assert(toks.toSeq === Seq("4b59a0cd83b5de49"))
  }

  test("stateless text-pipeline ops (redaction, quality) run on streams") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val input = MemoryStream[(Long, String)]
    val out = input.toDF().toDF("id", "text")
      .select($"id",
        graft.llm.TextAnalysis.redactPii($"text").getField("clean").as("clean"),
        graft.llm.TextAnalysis.qualityScore($"text").as("q"))
    val q = out.writeStream.format("memory").queryName("redact_stream").start()
    input.addData((1L, "mail me at a@b.co or dial +1 555-123-4567 now"))
    q.processAllAvailable()
    val rows = spark.table("redact_stream").as[(Long, String, Double)].collect()
    q.stop()
    assert(rows.length === 1)
    assert(rows(0)._2 === "mail me at <EMAIL> or dial <PHONE> now")
    assert(rows(0)._3 >= 0.0 && rows(0)._3 <= 1.0)
  }

  test("audio feature extraction runs on a stream, matching batch rows") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val payloads = Seq(
      (1L, "raw pcm stand-in bytes".getBytes("UTF-8")),
      (2L, Array.empty[Byte]))
    val batch = graft.llm.Multimodal.audioFeatures(
        payloads.toDF("media_id", "payload"))
      .as[(Long, String, Int, Long, Long, Double, Double, Double)]
      .collect().toSet
    val input = MemoryStream[(Long, Array[Byte])]
    val out = graft.llm.Multimodal.audioFeatures(
      input.toDF().toDF("media_id", "payload"))
    val q = out.writeStream.format("memory").queryName("audio_stream")
      .outputMode("append").start()
    input.addData(payloads)
    q.processAllAvailable()
    val streamed = spark.table("audio_stream")
      .as[(Long, String, Int, Long, Long, Double, Double, Double)]
      .collect().toSet
    q.stop()
    assert(streamed === batch)
  }

  test("gopher-rules gate filters an ingestion stream statelessly") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val input = MemoryStream[(Long, String)]
    val good = (1 to 60).map(i => s"word$i the of and that").mkString(" ") // 300 words, stops present
    val bad = "too short to pass"
    val out = input.toDF().toDF("id", "text")
      .select($"id", graft.llm.TextAnalysis.gopherSignals($"text").getField("passes").as("ok"))
      .where($"ok")
    val q = out.writeStream.format("memory").queryName("gopher_stream").start()
    input.addData((1L, good), (2L, bad))
    q.processAllAvailable()
    val kept = spark.table("gopher_stream").as[(Long, Boolean)].collect().map(_._1).toSet
    q.stop()
    assert(kept === Set(1L), "the 300-word doc passes, the 4-word doc is gated out")
  }

  test("k-bounded top-k aggregator runs in a watermarked streaming window") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    import org.apache.spark.sql.functions._
    // continuous "top-2 events per type per hour": the same k-bounded
    // Aggregator as batch TopK/KnnJoin inside a streaming groupBy — state
    // per (type, window) group is k entries, watermark-evicted
    val topk = graft.spark.TopK.boundedTopK(2)
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val out = input.toDF().toDF("id", "ts", "typ", "value")
      .withWatermark("ts", "2 hours")
      .groupBy($"typ", window($"ts", "1 hour"))
      .agg(topk(negate($"value"), $"id").as("tk"))
      .select($"typ", posexplode(arrays_zip($"tk.ids".as("i"), $"tk.d2".as("s"))).as(Seq("pos", "z")))
      .select($"typ", $"z.i".as("id"), (col("pos") + 1).as("rank"))
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("topk_stream").start()
    input.addData(
      (1L, ts(10), "a", 5.0), (2L, ts(20), "a", 9.0), (3L, ts(30), "a", 7.0),
      (4L, ts(15), "b", 1.0))
    q.processAllAvailable()
    val got = spark.table("topk_stream").select("typ", "id", "rank")
      .as[(String, Long, Int)].collect().toSet
    q.stop()
    // top-2 by value desc for 'a' is ids 2 (9.0) then 3 (7.0); 'b' has one
    assert(got === Set(("a", 2L, 1), ("a", 3L, 2), ("b", 4L, 1)))
  }

  test("knnEnrich on a batch frame equals the batch KnnJoin bit-for-bit") {
    val s = spark
    import s.implicits._
    graft.spark.S2Functions.ensureRegistered(s)
    val rnd = new scala.util.Random(7)
    val corpusPts = (0 until 80).map(i =>
      (100L + i, rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 160 - 80))
    val eventPts = (0 until 25).map(i =>
      (i.toLong, rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 160 - 80))
    val corpus = corpusPts.toDF("id", "lon", "lat")
      .select($"id", org.apache.spark.sql.functions.expr("s2_geogpoint(lon, lat)").as("g"))
    val events = eventPts.toDF("event_id", "lon", "lat")
    val enriched = GeoEnrich.knnEnrich(events, "lon", "lat", corpus, "id", "g", k = 3)
      .select($"event_id", $"nbr_id", $"rank", $"dist_m")
      .as[(Long, Long, Int, Double)].collect().toSet
    val eventGeog = events.select($"event_id",
      org.apache.spark.sql.functions.expr("s2_geogpoint(lon, lat)").as("g"))
    val batch = graft.spark.KnnJoin.knn(eventGeog, "event_id", "g", corpus, "id", "g", k = 3)
      .select($"event_id", $"nbr_id", $"rank", $"dist_m")
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(enriched === batch)
  }

  test("knnEnrich tags a stream statelessly with its nearest corpus points") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    graft.spark.S2Functions.ensureRegistered(s)
    val corpus = Seq((100L, 0.0, 0.0), (101L, 0.5, 0.0), (102L, 120.0, 45.0))
      .toDF("id", "lon", "lat")
      .select($"id", org.apache.spark.sql.functions.expr("s2_geogpoint(lon, lat)").as("g"))
    val input = MemoryStream[(Long, Double, Double)]
    val out = GeoEnrich.knnEnrich(input.toDF().toDF("event_id", "lon", "lat"),
      "lon", "lat", corpus, "id", "g", k = 1)
    val q = out.writeStream.format("memory").queryName("knn_stream").start()
    input.addData((1L, 0.1, 0.0), (2L, 119.0, 44.0))
    q.processAllAvailable()
    val got = spark.table("knn_stream")
      .select("event_id", "nbr_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    q.stop()
    assert(got === Set((1L, 100L, 1), (2L, 102L, 1)))
  }

  test("stream-stream dwithin join pairs nearby events within the time window") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val inA = MemoryStream[(Long, Double, Double, Timestamp)]
    val inB = MemoryStream[(Long, Double, Double, Timestamp)]
    val out = GeoEnrich.dwithinJoin(
      inA.toDF().toDF("id_a", "lon_a", "lat_a", "ts_a"), "lon_a", "lat_a", "ts_a",
      inB.toDF().toDF("id_b", "lon_b", "lat_b", "ts_b"), "lon_b", "lat_b", "ts_b",
      meters = 300000.0, windowSeconds = 600L, watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("geo_pairs")
      .outputMode("append").start()
    inA.addData(
      (1L, 2.35, 48.86, ts(0)),    // Paris
      (2L, 139.77, 35.68, ts(0)))  // Tokyo
    inB.addData(
      (10L, 2.21, 48.71, ts(5)),   // Orly: ~20 km from Paris, inside the window
      (11L, 2.21, 48.71, ts(60)),  // Orly again, but 60 min later — outside
      (12L, -0.45, 51.47, ts(5)))  // Heathrow: ~350 km from Paris — too far
    q.processAllAvailable()
    val rows = spark.table("geo_pairs")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    q.stop()
    assert(rows === Set((1L, 10L)))
  }

  test("stream-static spatial enrichment tags points with their country") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val input = MemoryStream[(Long, Double, Double)]
    val regions = graft.spark.S2Data.countries(s).select($"name", $"geog")
    val out = GeoEnrich.enrichPoints(
      input.toDF().toDF("event_id", "lon", "lat"), "lon", "lat", regions, "geog")
    val q = out.writeStream.format("memory").queryName("geo_enrich").start()
    input.addData(
      (1L, 2.35, 48.86),    // Paris
      (2L, -77.04, 38.90),  // Washington DC
      (3L, 139.77, 35.68),  // Tokyo
      (4L, -30.0, 0.0))     // mid-Atlantic: matches nothing, dropped by inner join
    q.processAllAvailable()
    val rows = spark.table("geo_enrich")
      .select("event_id", "name").as[(Long, String)].collect().toSet
    q.stop()
    assert(rows === Set((1L, "France"), (2L, "United States of America"), (3L, "Japan")))
  }
}
