package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Real javax.imageio decode: magic sniff, actual dimensions, pixel-mean
  * features; non-image payloads fall back to the stub (None here). */
class MultimodalDecodeSpec extends AnyFunSuite {
  private def png(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("solid-color PNG decodes with real dimensions and channel means") {
    val Some((fmt, w, h, f)) = Multimodal.decodeImage(png(6, 4, (_, _) => 0xFF8000))
    assert(fmt === "image/png" && w === 6 && h === 4)
    assert(f(0) === 1.0f) // R
    assert(Math.abs(f(1) - 128f / 255f) < 1e-6) // G
    assert(f(2) === 0.0f) // B
    assert(Math.abs(f(3) - (0.299 + 0.587 * 128 / 255.0)) < 1e-6) // luma
  }

  test("half-black/half-white PNG yields quadrant luminance split") {
    val Some((_, _, _, f)) =
      Multimodal.decodeImage(png(8, 8, (x, _) => if (x < 4) 0x000000 else 0xFFFFFF))
    assert(f(3) === 0.5f) // global luma
    assert(f(4) === 0.0f && f(5) === 1.0f) // top-left black, top-right white
    assert(f(6) === 0.0f && f(7) === 1.0f) // bottom quadrants likewise
  }

  /** Canonical 44-byte-header PCM WAV from float samples (16-bit LE). */
  private def wav(sampleRate: Int, channels: Int,
                  samples: Array[Float]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => bb.putShort(math.round(s * 32767f).toShort))
    bb.array()
  }

  test("WAV PCM decode: header fields, sine RMS/ZCR/peak, stereo mono-mix") {
    // 440 Hz sine, 0.5 amplitude, 1/10 s at 8 kHz
    val sr = 8000; val n = 800
    val sine = Array.tabulate(n)(i =>
      (0.5 * math.sin(2 * math.Pi * 440 * i / sr)).toFloat)
    val Some(w) = Multimodal.decodeWav(wav(sr, 1, sine))
    assert(w.sampleRate === sr && w.channels === 1 && w.bitsPerSample === 16)
    assert(w.samples.length === n)
    // quantization keeps every sample within 1/32767 of the source
    assert(w.samples.zip(sine).forall { case (a, b) => math.abs(a - b) < 2e-4 })
    // stereo with inverted channels mono-mixes to ~silence
    val inter = new Array[Float](2 * n)
    for (i <- 0 until n) { inter(2 * i) = sine(i); inter(2 * i + 1) = -sine(i) }
    val Some(st) = Multimodal.decodeWav(wav(sr, 2, inter))
    assert(st.channels === 2 && st.samples.length === n)
    assert(st.samples.forall(s => math.abs(s) < 2e-4))
  }

  test("audioFeatures: sine energy exact, non-WAV falls back to raw PCM") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", false)
      .config("spark.sql.shuffle.partitions", 2).getOrCreate()
    try {
      import spark.implicits._
      val sr = 8000; val n = 800
      val sine = Array.tabulate(n)(i =>
        (0.5 * math.sin(2 * math.Pi * 440 * i / sr)).toFloat)
      val media = Seq(
        (1L, wav(sr, 1, sine)),
        (2L, "not audio at all".getBytes("UTF-8"))).toDF("media_id", "payload")
      val rows = Multimodal.audioFeatures(media).orderBy("media_id")
        .as[(Long, String, Int, Long, Long, Double, Double, Double)].collect()
      val (_, fmt, rate, ns, durMs, rms, zcr, peak) = rows(0)
      assert(fmt === "wav/pcm16" && rate === sr && ns === n && durMs === 100L)
      assert(math.abs(rms - 0.5 / math.sqrt(2)) < 1e-3)  // sine RMS = A/sqrt(2)
      // 440 Hz for 0.1 s -> 44 cycles -> ~88 crossings
      assert(math.abs(zcr * (n - 1) - 88) <= 2)
      assert(math.abs(peak - 0.5) < 1e-3)
      val (_, fmt2, rate2, ns2, _, _, _, _) = rows(1)
      assert(fmt2 === "raw/8bit" && rate2 === 8000 && ns2 === 16L)
    } finally spark.stop()
  }

  test("hostile WAV chunk sizes terminate cleanly instead of looping") {
    def withChunk(id: String, len: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(56)
        .put("WAVE".getBytes("US-ASCII"))
        .put(id.getBytes("US-ASCII")).putInt(len)
      bb.array()
    }
    // u32 size 0xFFFFFFF8 -> len = -8 -> advance of 0: must bail, not spin
    assert(Multimodal.decodeWav(withChunk("JUNK", 0xFFFFFFF8)).isEmpty)
    // negative advance (-16) would walk backwards forever without the guard
    assert(Multimodal.decodeWav(withChunk("JUNK", 0xFFFFFFF0)).isEmpty)
    // positive len that overflows the Int advance (8 + len wraps negative)
    assert(Multimodal.decodeWav(withChunk("JUNK", Int.MaxValue - 3)).isEmpty)
    // declared data length far past the payload end: clamped, no crash
    val sine = Array.tabulate(80)(i => (0.5 * math.sin(i / 4.0)).toFloat)
    val ok = wav(8000, 1, sine)
    val bb = java.nio.ByteBuffer.wrap(ok).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, 1 << 20) // data chunk claims 1 MiB; only 160 B present
    val Some(w) = Multimodal.decodeWav(ok)
    assert(w.samples.length === 80)
  }

  test("aHash64: solid is zero, structure sets bits, edits move few bits") {
    // solid: every cell equals the mean -> strict > sets no bit
    assert(Multimodal.aHash64(png(16, 16, (_, _) => 0x808080)) === Some(0L))
    // left-dark/right-bright: exactly the 32 right-half cells set
    val Some(half) = Multimodal.aHash64(png(16, 16, (x, _) => if (x < 8) 0 else 0xFFFFFF))
    assert(java.lang.Long.bitCount(half) === 32)
    // a light edit (one corner pixel) moves at most a couple of bits
    val base = png(32, 32, (x, y) => if ((x / 4 + y / 4) % 2 == 0) 0 else 0xFFFFFF)
    val edited = png(32, 32, (x, y) =>
      if (x == 0 && y == 0) 0xFFFFFF else if ((x / 4 + y / 4) % 2 == 0) 0 else 0xFFFFFF)
    val (Some(hb), Some(he)) = (Multimodal.aHash64(base), Multimodal.aHash64(edited))
    assert(java.lang.Long.bitCount(hb ^ he) <= 2)
    // an unrelated image is far away
    val Some(hu) = Multimodal.aHash64(png(32, 32, (x, _) => if (x < 16) 0 else 0xFFFFFF))
    assert(java.lang.Long.bitCount(hb ^ hu) > 10)
    // non-images hash to None
    assert(Multimodal.aHash64("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("imageNearDupPairs finds planted near-dups through the block join") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", false).appName("graft-imagededup-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      import spark.implicits._
      val base = png(32, 32, (x, y) => if ((x / 4 + y / 4) % 2 == 0) 0 else 0xFFFFFF)
      val near = png(32, 32, (x, y) =>
        if (x == 0 && y == 0) 0xFFFFFF else if ((x / 4 + y / 4) % 2 == 0) 0 else 0xFFFFFF)
      val far = png(32, 32, (x, _) => if (x < 16) 0 else 0xFFFFFF)
      val junk = "not an image".getBytes("UTF-8")
      val media = Seq((1L, base), (2L, near), (3L, far), (4L, junk))
        .toDF("media_id", "payload")
      val pairs = Multimodal.imageNearDupPairs(media, maxHamming = 3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(pairs === Set((1L, 2L)))
      // the candidate plan is a block equi-join, never a cartesian product
      val plan = Multimodal.imageNearDupPairs(media, maxHamming = 3)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Cartesian"), plan)
    } finally spark.stop()
  }

  test("audioHash64 keys on the loudness envelope; near-dup join finds edits") {
    val sr = 8000; val n = 6400 // 0.8 s -> 100 samples per hash frame
    def tone(i: Int, amp: Double) = (amp * math.sin(2 * math.Pi * 440 * i / sr)).toFloat
    // burst pattern: loud first half, quiet second
    val a = Array.tabulate(n)(i => tone(i, if (i < n / 2) 0.9 else 0.05))
    // same envelope, slightly different gain (re-encode-ish edit)
    val b = Array.tabulate(n)(i => tone(i, if (i < n / 2) 0.8 else 0.04))
    // inverted envelope: quiet then loud
    val c = Array.tabulate(n)(i => tone(i, if (i < n / 2) 0.05 else 0.9))
    val (Some(ha), Some(hb), Some(hc)) =
      (Multimodal.audioHash64(wav(sr, 1, a)), Multimodal.audioHash64(wav(sr, 1, b)),
        Multimodal.audioHash64(wav(sr, 1, c)))
    assert(java.lang.Long.bitCount(ha ^ hb) <= 2, "same envelope must hash close")
    assert(java.lang.Long.bitCount(ha ^ hc) > 20, "inverted envelope must hash far")
    // steady FRAME-ALIGNED tone (400 Hz = exactly 5 cycles per 100-sample
    // frame): flat envelope -> zero hash by construction
    val steady = Array.tabulate(n)(i => (0.5 * math.sin(2 * math.Pi * 400 * i / sr)).toFloat)
    assert(Multimodal.audioHash64(wav(sr, 1, steady)) === Some(0L))
    // non-WAV payloads don't hash
    assert(Multimodal.audioHash64("not audio".getBytes("UTF-8")).isEmpty)

    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", false).appName("graft-audiodedup-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      import spark.implicits._
      val media = Seq((1L, wav(sr, 1, a)), (2L, wav(sr, 1, b)),
        (3L, wav(sr, 1, c)), (4L, "junk".getBytes("UTF-8")))
        .toDF("media_id", "payload")
      val pairs = Multimodal.audioNearDupPairs(media, maxHamming = 3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(pairs === Set((1L, 2L)))
    } finally spark.stop()
  }

  test("video container round-trips; hostile lengths bail; near-dup by frame overlap") {
    def frame(tag: Int) = png(16, 16, (x, y) =>
      if (((x / 2 + y / 2) ^ tag) % 3 == 0) 0 else 0xFFFFFF)
    val (f1, f2, f3, f4) = (frame(1), frame(2), frame(3), frame(4))
    // round-trip
    val vid = Multimodal.videoContainer(Seq(f1, f2, f3))
    val Some(back) = Multimodal.videoFrames(vid)
    assert(back.length === 3 && back.zip(Seq(f1, f2, f3)).forall {
      case (a, b) => java.util.Arrays.equals(a, b) })
    // hostile frame lengths: negative and past-the-end both bail
    val bad = vid.clone(); java.nio.ByteBuffer.wrap(bad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(8, -5)
    assert(Multimodal.videoFrames(bad).isEmpty)
    val bad2 = vid.clone(); java.nio.ByteBuffer.wrap(bad2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(8, Int.MaxValue - 1)
    assert(Multimodal.videoFrames(bad2).isEmpty)
    assert(Multimodal.videoFrames("junk".getBytes("UTF-8")).isEmpty)

    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", false).appName("graft-videodedup-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      import spark.implicits._
      val media = Seq(
        (1L, Multimodal.videoContainer(Seq(f1, f2, f3))),
        (2L, Multimodal.videoContainer(Seq(f1, f2, f4))), // shares 2 of 4 distinct
        (3L, Multimodal.videoContainer(Seq(f4))),          // shares 1 of 4 with 2
        (4L, "junk".getBytes("UTF-8")))
        .toDF("media_id", "payload")
      val pairs = Multimodal.videoNearDupPairs(media, minJaccardPermille = 400)
        .select("id_a", "id_b", "jaccard_permille")
        .as[(Long, Long, Long)].collect().toSet
      // (1,2): inter 2, union 4 -> 500 permille; (2,3): inter 1, union 3 -> 333
      assert(pairs === Set((1L, 2L, 500L)))
      val all = Multimodal.videoNearDupPairs(media, minJaccardPermille = 0)
        .select("id_a", "id_b", "jaccard_permille")
        .as[(Long, Long, Long)].collect().toSet
      assert(all === Set((1L, 2L, 500L), (2L, 3L, 333L)))
    } finally spark.stop()
  }

  test("hamming64Pairs: 10k identical hashes complete via salted hot buckets, exact clique") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).appName("graft-hotbucket-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, lit}
      // the degenerate class the governance exists for: 10k items with ONE
      // hash value (a uniform image / steady tone all hash identically)
      val n = 10000
      val hashes = spark.range(n).select(col("id"), lit(0L).as("h"))
      val stats = Multimodal.hotBucketStats(hashes.toDF(), maxHamming = 3, maxBucket = 512)
        .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
      // visible salt log: every one of the 4 blocks holds the whole class
      stats.foreach { case (blk, bucket, cnt, nsplit) =>
        info(s"hot bucket split: blk=$blk bucket=$bucket n=$cnt -> $nsplit salts") }
      assert(stats.length === 4 && stats.forall { case (_, b, c, s) =>
        b === 0L && c === n.toLong && s === 20L })
      // the salted join still emits the EXACT clique, each pair once
      val cnt = Multimodal.hamming64Pairs(hashes.toDF(), maxHamming = 3, maxBucket = 512)
        .count()
      assert(cnt === n.toLong * (n - 1) / 2)
    } finally spark.stop()
  }

  test("salting is candidate-preserving: salted pair set == unsalted, image and video") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).appName("graft-saltparity-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      // hashes drawn from a tiny pool -> every bucket oversized at cap 8
      val hs = (0 until 500).map(i => (i.toLong, ((i * 2654435761L) % 5) * 0x0101010101010101L))
        .toDF("id", "h")
      def pairs(cap: Int) = Multimodal.hamming64Pairs(hs, maxHamming = 3, maxBucket = cap)
        .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
      val unsalted = pairs(0) // cap 0 disables governance
      assert(unsalted.nonEmpty)
      assert(pairs(8) === unsalted, "salted Hamming join must preserve every candidate pair")
      // video: a planted hot frame hash (black frame in every video) plus
      // per-video unique frames; intersection counts must survive salting
      val vids = (0 until 120).map { i =>
        (i.toLong, Array(0L, 1000L + i / 2, 2000L + i)) // shared black frame + pairwise overlap
      }.toDF("media_id", "frame_hashes")
      def vpairs(cap: Int) = {
        val fp = vids.select(col("media_id"), col("frame_hashes"),
          org.apache.spark.sql.functions.size(col("frame_hashes")).cast("long").as("nf"))
        Multimodal.videoNearDupPairsFromFingerprints(fp, minJaccardPermille = 0, maxBucket = cap)
          .select("id_a", "id_b", "n_shared", "jaccard_permille")
          .as[(Long, Long, Long, Long)].collect().toSet
      }
      val vUnsalted = vpairs(0)
      // black frame alone links every pair; same-half videos share 2 frames
      assert(vUnsalted.size === 120 * 119 / 2)
      assert(vpairs(16) === vUnsalted, "salted frame join must preserve intersection counts")
    } finally spark.stop()
  }

  test("non-image payloads are rejected, not mis-decoded") {
    assert(Multimodal.decodeImage("just some text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
    assert(Multimodal.decodeImage(Array[Byte](0x89.toByte, 'P', 'N')).isEmpty)
    // PNG magic with garbage body: sniff passes, decode fails cleanly
    val junk = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2, 3)
    assert(Multimodal.decodeImage(junk).isEmpty)
  }
}
