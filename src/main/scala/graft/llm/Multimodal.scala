package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads travel as opaque
 * BinaryType columns next to a typed metadata struct; decode / feature
 * extraction runs per partition (the Scala analogue of `mapInPandas` —
 * one iterator per batch, decoder state amortized across the partition).
 *
 * The actual codec is STUBBED (no image/audio libraries in this
 * environment): `decodeStub` derives a deterministic fake feature vector
 * from the bytes. The Spark-side contract — schema, partitioning, batch
 * iteration, null behavior — is real and tested; swap `decodeStub` for a
 * JNI/library decoder in production.
 */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))), nullable = true)))

  /** Wrap a text table into a fake media table (payload = utf8 bytes) —
    * deterministic stand-in for real blobs in tests/benches. */
  def fakeMediaFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("fake/raw").as("format"),
        (org.apache.spark.sql.functions.length(col(textCol)) % 1024 + 16).cast("int").as("width"),
        (org.apache.spark.sql.functions.length(col(textCol)) % 768 + 16).cast("int").as("height")).as("meta"))

  /** STUB decoder: deterministic 8-dim feature vector from payload bytes.
    * Replace with a real decoder (libjpeg/ffmpeg/...) in production; the
    * signature (bytes, meta) => features is the stable contract. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        out(i % 8) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      var j = 0
      while (j < 8) { out(j) = out(j) / Math.max(1, payload.length / 8.0f); j += 1 }
    }
    out
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /**
   * Per-partition feature extraction (mapPartitions: decoder state built
   * once per partition, rows stream through — the batch shape that keeps
   * memory flat at 100 TB).
   */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      // per-partition decoder init would go here (amortized, not per-row)
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val n = if (payload == null) 0 else payload.length
        Row(id, n, decodeStub(payload))
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Image-resize shape: payload transformed per partition to the target
    * dimensions, meta struct updated to match. The pixel resample is the
    * same documented STUB as decodeStub (deterministic byte subsample /
    * pad to targetW*targetH bytes); the Spark contract — binary in/out,
    * meta rewrite, per-partition batching — is the production shape. */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = mediaSchema
    val n = targetW * targetH
    val rdd = media.select("media_id", "payload", "meta").rdd.mapPartitions { rows =>
      // per-partition resampler init would go here (amortized, not per-row)
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val resized =
          if (payload == null) null
          else {
            val out = new Array[Byte](n)
            var i = 0
            while (i < n) {
              // nearest-neighbor byte subsample (stub for real resampling)
              out(i) = if (payload.length == 0) 0
                else payload(((i.toLong * payload.length) / n).toInt)
              i += 1
            }
            out
          }
        val fmt = if (r.isNullAt(2)) null else r.getStruct(2).getString(0)
        Row(id, resized, Row(fmt, targetW, targetH))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame-sampling shape for video-like payloads: split payload into
    * fixed-size "frames", keep every `stride`-th — pure built-ins. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.select(col("media_id"),
      posexplode(transform(
        sequence(lit(0),
          greatest(floor(org.apache.spark.sql.functions.length(col("payload")) / frameBytes).cast("int") - 1, lit(0))),
        i => substring(col("payload"), (i * frameBytes + 1).cast("int"), lit(frameBytes))))
        .as(Seq("frame_no", "frame")))
      .where(col("frame_no") % stride === 0)
}
