package graft.spark

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class GeoArrowSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .appName("graft-geoarrow-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    S2Functions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("geoarrow sink writes IPC part files with geoarrow.wkb extension metadata") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("geoarrow_test").toFile.getAbsolutePath
    val df = Seq(
      (1L, "POINT (-64 45)", "halifax", Some(2.5)),
      (2L, "POINT (0 51.5)", "london", None),
      (3L, "LINESTRING (0 0, 1 1)", "seg", Some(-1.0))
    ).toDF("id", "wkt", "name", "score")
      .select(col("id"), expr("s2_aswkb(s2_geogfromtext(wkt))").as("geog"),
        col("name"), col("score"))
    GeoArrow.writeGeoArrow(df.repartition(2), dir, "geog")

    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".arrow"))
    assert(parts.nonEmpty, "at least one IPC part file")
    val allocator = new RootAllocator()
    var rows = 0
    val seen = scala.collection.mutable.Map[Long, (Array[Byte], String, Option[Double])]()
    for (p <- parts) {
      val ch = Files.newByteChannel(p.toPath)
      val reader = new ArrowFileReader(ch.asInstanceOf[java.nio.channels.SeekableByteChannel], allocator)
      try {
        val schema = reader.getVectorSchemaRoot.getSchema
        val geomField = schema.findField("geog")
        val meta = geomField.getMetadata.asScala
        assert(meta.get("ARROW:extension:name") === Some("geoarrow.wkb"),
          "geometry field must carry the geoarrow.wkb extension name")
        assert(meta.get("ARROW:extension:metadata") === Some("""{"edges":"spherical"}"""),
          "edges must be declared spherical")
        assert(schema.findField("name").getMetadata.isEmpty,
          "non-geometry fields carry no extension metadata")
        while (reader.loadNextBatch()) {
          val root = reader.getVectorSchemaRoot
          val idV = root.getVector("id").asInstanceOf[BigIntVector]
          val gV = root.getVector("geog").asInstanceOf[VarBinaryVector]
          val nV = root.getVector("name").asInstanceOf[VarCharVector]
          val sV = root.getVector("score").asInstanceOf[Float8Vector]
          for (i <- 0 until root.getRowCount) {
            rows += 1
            seen(idV.get(i)) = (gV.get(i), new String(nV.get(i), "UTF-8"),
              if (sV.isNull(i)) None else Some(sV.get(i)))
          }
        }
      } finally { reader.close(); ch.close() }
    }
    allocator.close()
    assert(rows === 3)
    assert(seen(2L)._3 === None, "null attribute round-trips as arrow null")
    assert(seen(3L)._3 === Some(-1.0))
    // WKB payload round-trips byte-for-byte: reparse it through the engine
    val wkbBack = seen(1L)._1
    val wktBack = spark.sql(
      s"SELECT s2_astext(s2_geogfromwkb(unhex('${wkbBack.map("%02x".format(_)).mkString}')))")
      .head().getString(0)
    assert(wktBack === "POINT (-64 45)")
    assert(seen(1L)._2 === "halifax")
  }

  test("geoarrow source round-trips the sink output incl. nulls and metadata") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("geoarrow_rt").toFile.getAbsolutePath
    val df = Seq(
      (1L, Some("POINT (-64 45)"), Some("halifax"), Some(2.5), Some(true)),
      (2L, Some("POINT (0 51.5)"), None, None, Some(false)),
      (3L, Some("LINESTRING (0 0, 1 1)"), Some("seg"), Some(-1.0), None),
      (4L, None, Some("nowhere"), Some(0.0), Some(true))
    ).toDF("id", "wkt", "name", "score", "flag")
      .select(col("id"),
        expr("s2_aswkb(s2_geogfromtext(wkt))").as("geog"),
        col("name"), col("score"), col("flag"),
        to_timestamp(lit("2026-01-02 03:04:05.123456")).as("ts"))
    GeoArrow.writeGeoArrow(df.repartition(2), dir, "geog")

    val back = GeoArrow.readGeoArrow(spark, dir)
    // geometry column metadata survives the trip
    val gMeta = back.schema("geog").metadata
    assert(gMeta.getString("geoarrow") === "geoarrow.wkb")
    assert(gMeta.getString("geoarrow_meta") === """{"edges":"spherical"}""")
    assert(back.schema("name").metadata.json === "{}")
    // values: compare via a canonical projection (WKB re-parsed through the
    // engine so byte-for-byte geometry survival is exercised end-to-end)
    def canon(d: org.apache.spark.sql.DataFrame) = d.select(
        col("id"),
        expr("s2_astext(s2_geogfromwkb(geog))").as("wkt"),
        col("name"), col("score"), col("flag"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"))
      .collect().map(r => (0 until r.length).map(i => if (r.isNullAt(i)) null else r.get(i)).toList)
      .sortBy(_.head.asInstanceOf[Long])
    assert(canon(back).toList === canon(df).toList)
    // distributed read: one task per part file
    assert(back.rdd.getNumPartitions === new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".arrow")))
  }

  test("readGeoArrow refuses a planar-edge-tagged geoarrow column (reference s2_geoarrow.cpp:27-29)") {
    // hand-build a part file whose geometry column declares planar edges —
    // the one tag the reference's reader refuses; ours must too instead of
    // silently reinterpreting planar data as spherical
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
    val dir = Files.createTempDirectory("geoarrow_planar").toFile.getAbsolutePath
    val planarMeta = Map(
      "ARROW:extension:name" -> "geoarrow.wkb",
      "ARROW:extension:metadata" -> """{"edges":"planar"}""").asJava
    val geomField = new Field("geog",
      new FieldType(true, ArrowType.Binary.INSTANCE, null, planarMeta), null)
    val idField = new Field("id",
      new FieldType(false, new ArrowType.Int(64, true), null, null), null)
    val allocator = new RootAllocator()
    val vsr = VectorSchemaRoot.create(new ASchema(java.util.List.of(idField, geomField)), allocator)
    val out = Files.newOutputStream(java.nio.file.Paths.get(dir, "part-00000.arrow"))
    val writer = new org.apache.arrow.vector.ipc.ArrowFileWriter(vsr, null,
      java.nio.channels.Channels.newChannel(out))
    try {
      writer.start()
      vsr.allocateNew()
      vsr.getVector(0).asInstanceOf[BigIntVector].setSafe(0, 1L)
      vsr.getVector(1).asInstanceOf[VarBinaryVector].setSafe(0, Array[Byte](1, 1, 0, 0, 0))
      vsr.setRowCount(1)
      writer.writeBatch()
      writer.end()
    } finally { writer.close(); out.close(); vsr.close(); allocator.close() }

    val e = intercept[IllegalArgumentException] { GeoArrow.readGeoArrow(spark, dir) }
    assert(e.getMessage.contains("planar") && e.getMessage.contains("geog"),
      s"error must name the column and the offending edge type: ${e.getMessage}")
  }

  test("readGeoArrow treats an absent edges key as planar and refuses it (ADVICE r16)") {
    // per the GeoArrow spec a missing edges key (or missing extension
    // metadata entirely) DEFAULTS TO PLANAR — a typical foreign
    // geoarrow.wkb file carries crs-only metadata; reading it as
    // spherical is exactly the corruption the guard exists to prevent
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
    for (meta <- Seq(
        Map("ARROW:extension:name" -> "geoarrow.wkb",
            "ARROW:extension:metadata" -> """{"crs":"OGC:CRS84"}"""),
        Map("ARROW:extension:name" -> "geoarrow.wkb"))) {
      val dir = Files.createTempDirectory("geoarrow_noedges").toFile.getAbsolutePath
      val geomField = new Field("geog",
        new FieldType(true, ArrowType.Binary.INSTANCE, null, meta.asJava), null)
      val idField = new Field("id",
        new FieldType(false, new ArrowType.Int(64, true), null, null), null)
      val allocator = new RootAllocator()
      val vsr = VectorSchemaRoot.create(new ASchema(java.util.List.of(idField, geomField)), allocator)
      val out = Files.newOutputStream(java.nio.file.Paths.get(dir, "part-00000.arrow"))
      val writer = new org.apache.arrow.vector.ipc.ArrowFileWriter(vsr, null,
        java.nio.channels.Channels.newChannel(out))
      try {
        writer.start()
        vsr.allocateNew()
        vsr.getVector(0).asInstanceOf[BigIntVector].setSafe(0, 1L)
        vsr.getVector(1).asInstanceOf[VarBinaryVector].setSafe(0, Array[Byte](1, 1, 0, 0, 0))
        vsr.setRowCount(1)
        writer.writeBatch()
        writer.end()
      } finally { writer.close(); out.close(); vsr.close(); allocator.close() }
      val e = intercept[IllegalArgumentException] { GeoArrow.readGeoArrow(spark, dir) }
      assert(e.getMessage.contains("planar") && e.getMessage.contains("geog"),
        s"absent-edges metadata $meta must be rejected as planar: ${e.getMessage}")
    }
  }

  test("geoarrow sink rejects unsupported column types with a named column") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "emb")
      .withColumn("geog", expr("s2_aswkb(s2_geogfromtext('POINT (0 0)'))"))
    val e = intercept[IllegalArgumentException] {
      GeoArrow.writeGeoArrow(df, Files.createTempDirectory("ga_rej").toString, "geog")
    }
    assert(e.getMessage.contains("emb"))
  }
}
