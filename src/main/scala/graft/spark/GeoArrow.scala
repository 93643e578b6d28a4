package graft.spark

import java.nio.channels.Channels

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/**
 * GeoArrow interop sink: write a DataFrame with a WKB geometry column to
 * Arrow IPC (Feather v2) part files whose geometry field carries the
 * standard `geoarrow.wkb` EXTENSION-TYPE metadata — the Spark
 * counterpart of the reference's Arrow interchange surface
 * (src/s2_geoarrow.cpp:18-93 tags exported Arrow columns with the
 * geoarrow.wkb extension and spherical-edge metadata;
 * s2_register_geoarrow_extensions :101-134 registers the types). An
 * Arrow consumer (pyarrow.dataset, GeoPandas via geoarrow-pyarrow, GDAL)
 * reads the directory and recognizes the geometry column with no
 * out-of-band schema knowledge — closing the in-memory half of the
 * interop contract the parquet `geo` footer (GeoParquet.scala) closes
 * for files.
 *
 * Scale shape: one IPC part file PER PARTITION via foreachPartition
 * (no driver collect — executors stream fixed-size record batches
 * straight to the target filesystem through the Hadoop FS API, so the
 * sink works on any cluster store), batched `batchRows` rows at a time
 * so executor memory is bounded by batch x row width, not partition
 * size. Arrow is columnar per batch: the write cost is one transpose of
 * each batch, the same cost profile as Spark's own parquet sink. Each
 * task attempt streams to a dot-prefixed attempt file and renames into
 * place on success, so speculative or zombie duplicate attempts never
 * interleave writes into the final file.
 */
object GeoArrow {

  /** GeoArrow extension metadata: S2 geographies interpolate on great
    * circles — spherical edges, matching the reference's declaration. */
  private val GeoMeta: java.util.Map[String, String] = Map(
    "ARROW:extension:name" -> "geoarrow.wkb",
    "ARROW:extension:metadata" -> """{"edges":"spherical"}""").asJava

  private def arrowField(f: StructField, isGeom: Boolean): Field = {
    val at: ArrowType = f.dataType match {
      case BinaryType => ArrowType.Binary.INSTANCE
      case StringType => ArrowType.Utf8.INSTANCE
      case LongType => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case BooleanType => ArrowType.Bool.INSTANCE
      case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
      case other => throw new IllegalArgumentException(
        s"GeoArrow sink does not map ${other.simpleString} (column ${f.name}); " +
        "cast to binary/string/bigint/int/double/boolean/timestamp first")
    }
    val meta = if (isGeom) GeoMeta else null
    new Field(f.name, new FieldType(f.nullable, at, null, meta), null)
  }

  /** Write `df` as `part-NNNNN.arrow` IPC files under `dir` (created,
    * overwritten), stamping `geometryColumn` (WKB BinaryType, e.g. from
    * s2_aswkb) with the geoarrow.wkb extension metadata. */
  def writeGeoArrow(df: DataFrame, dir: String, geometryColumn: String,
                    batchRows: Int = 4096): Unit = {
    val schema = df.schema
    require(schema.fieldNames.contains(geometryColumn),
      s"geometry column $geometryColumn not in schema")
    require(schema(geometryColumn).dataType == BinaryType,
      s"geometry column $geometryColumn must be BinaryType WKB (use s2_aswkb)")
    // validate the whole schema up front: fail on the driver, not mid-job
    schema.fields.foreach(f => arrowField(f, f.name == geometryColumn))
    val spark = df.sparkSession
    val confS = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fsRoot = root.getFileSystem(confS)
    fsRoot.delete(root, true)
    fsRoot.mkdirs(root)
    // hadoop Configuration is not serializable; ship its entries and
    // rebuild per partition (covers non-default fs credentials/settings)
    val confEntries = confS.iterator().asScala.map(e => e.getKey -> e.getValue).toArray
    val dirStr = dir
    val fieldIdx = schema.fields.zipWithIndex
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val part = new Path(new Path(dirStr), f"part-$pid%05d.arrow")
        // poor-man's task commit: stream to a dot-prefixed attempt file
        // (invisible to directory listings) and rename into place only on
        // success — speculative/zombie duplicate attempts each write
        // their own temp, and the first completed rename wins, so the
        // final file is always one attempt's complete output
        val tmpPart = new Path(new Path(dirStr),
          f".part-$pid%05d.arrow.attempt-${tc.taskAttemptId()}%d")
        val fs = part.getFileSystem(conf)
        val allocator = new RootAllocator()
        val fields = fieldIdx.map { case (f, _) =>
          arrowField(f, f.name == geometryColumn)
        }
        val vsr = VectorSchemaRoot.create(new ArrowSchema(fields.toSeq.asJava), allocator)
        val out = fs.create(tmpPart, true)
        val writer = new ArrowFileWriter(vsr, null, Channels.newChannel(out))
        var committed = false
        try {
          writer.start()
          val batch = rows.grouped(batchRows)
          for (chunk <- batch) {
            vsr.allocateNew()
            var i = 0
            for (row <- chunk) {
              fieldIdx.foreach { case (f, ci) =>
                val v = vsr.getVector(ci)
                if (row.isNullAt(ci)) () // vectors default to null
                else f.dataType match {
                  case BinaryType =>
                    v.asInstanceOf[VarBinaryVector].setSafe(i, row.getAs[Array[Byte]](ci))
                  case StringType =>
                    v.asInstanceOf[VarCharVector].setSafe(i,
                      row.getString(ci).getBytes(java.nio.charset.StandardCharsets.UTF_8))
                  case LongType => v.asInstanceOf[BigIntVector].setSafe(i, row.getLong(ci))
                  case IntegerType => v.asInstanceOf[IntVector].setSafe(i, row.getInt(ci))
                  case DoubleType => v.asInstanceOf[Float8Vector].setSafe(i, row.getDouble(ci))
                  case BooleanType =>
                    v.asInstanceOf[BitVector].setSafe(i, if (row.getBoolean(ci)) 1 else 0)
                  case TimestampType =>
                    v.asInstanceOf[TimeStampMicroTZVector].setSafe(i,
                      row.getAs[java.sql.Timestamp](ci).getTime * 1000L +
                        (row.getAs[java.sql.Timestamp](ci).getNanos / 1000L) % 1000L)
                  case _ => ()
                }
              }
              i += 1
            }
            vsr.setRowCount(i)
            writer.writeBatch()
          }
          writer.end()
          committed = true
        } finally {
          try writer.close() catch { case _: Throwable => () }
          try out.close() catch { case _: Throwable => () }
          vsr.close()
          allocator.close()
          if (committed) {
            // first completed attempt wins; losers drop their temp
            if (fs.exists(part) || !fs.rename(tmpPart, part)) {
              try fs.delete(tmpPart, false) catch { case _: Throwable => () }
            }
          } else {
            try fs.delete(tmpPart, false) catch { case _: Throwable => () }
          }
        }
      }
    }
  }

  /** SeekableByteChannel over a Hadoop FSDataInputStream — Arrow's file
    * reader needs random access; HDFS-style streams expose it as
    * seek/getPos. */
  private final class FsChannel(in: org.apache.hadoop.fs.FSDataInputStream, len: Long)
      extends java.nio.channels.SeekableByteChannel {
    private var closed = false
    override def read(dst: java.nio.ByteBuffer): Int = {
      val tmp = new Array[Byte](dst.remaining())
      val n = in.read(tmp, 0, tmp.length)
      if (n > 0) dst.put(tmp, 0, n)
      n
    }
    override def write(src: java.nio.ByteBuffer): Int = throw new UnsupportedOperationException
    override def position(): Long = in.getPos
    override def position(newPosition: Long): java.nio.channels.SeekableByteChannel = {
      in.seek(newPosition); this
    }
    override def size(): Long = len
    override def truncate(size: Long): java.nio.channels.SeekableByteChannel =
      throw new UnsupportedOperationException
    override def isOpen: Boolean = !closed
    override def close(): Unit = { closed = true; in.close() }
  }

  /** Map an Arrow field back to the Spark type [[arrowField]] wrote. */
  private def sparkType(f: Field): DataType = f.getType match {
    case _: ArrowType.Binary => BinaryType
    case _: ArrowType.Utf8 => StringType
    case t: ArrowType.Int if t.getBitWidth == 64 => LongType
    case t: ArrowType.Int if t.getBitWidth == 32 => IntegerType
    case t: ArrowType.FloatingPoint if t.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
    case _: ArrowType.Bool => BooleanType
    case t: ArrowType.Timestamp if t.getUnit == TimeUnit.MICROSECOND => TimestampType
    case other => throw new IllegalArgumentException(
      s"GeoArrow source does not map Arrow type $other (column ${f.getName})")
  }

  /**
   * Read a [[writeGeoArrow]]-layout directory of Arrow IPC part files back
   * into a DataFrame — the ingest half of the interchange contract, so a
   * dataset exported for GeoPandas (or produced BY an Arrow writer using
   * the same `geoarrow.wkb` convention) round-trips without parquet in
   * the middle. Columns tagged with the extension metadata surface it in
   * the Spark column metadata (keys `geoarrow` = extension name,
   * `geoarrow_meta` = extension metadata JSON); feed such columns to
   * s2_geogfromwkb to re-enter the geography domain.
   *
   * Scale shape: one Spark task per IPC file (files are the writer's
   * partitions), each streaming record batches through the Hadoop FS API
   * — no driver collect, executor memory bounded by batch size. The
   * driver opens only the FIRST file, for the schema.
   */
  def readGeoArrow(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val parts = fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".arrow"))
      .sortBy(_.getName)
    require(parts.nonEmpty, s"no part-*.arrow files under $dir")
    // schema (incl. extension tags) from the first part, read on the driver
    val arrowSchema = {
      val allocator = new RootAllocator()
      val ch = new FsChannel(fs.open(parts.head), fs.getFileStatus(parts.head).getLen)
      val reader = new ArrowFileReader(ch, allocator)
      try reader.getVectorSchemaRoot.getSchema
      finally {
        try reader.close() catch { case _: Throwable => () }
        try ch.close() catch { case _: Throwable => () }
        allocator.close()
      }
    }
    val sparkFields = arrowSchema.getFields.asScala.map { f =>
      val mb = new MetadataBuilder()
      val ext = f.getMetadata.asScala
      ext.get("ARROW:extension:name").foreach(mb.putString("geoarrow", _))
      ext.get("ARROW:extension:metadata").foreach(mb.putString("geoarrow_meta", _))
      // PLANAR-EDGE REJECTION (r16/r17; reference src/s2_geoarrow.cpp:27-29
      // refuses geoarrow columns whose edge type is not spherical): this
      // engine is spherical-only — silently reinterpreting a planar column
      // as spherical corrupts every downstream measure/predicate, so fail
      // loudly at read time, matching the reference's contract. Per the
      // GeoArrow spec an ABSENT edges key (or absent extension metadata
      // entirely) DEFAULTS TO PLANAR (ADVICE r16 — typical foreign
      // geoarrow.wkb files carry crs-only metadata), so only an explicit
      // edges="spherical" is admissible.
      for (name <- ext.get("ARROW:extension:name") if name.startsWith("geoarrow.")) {
        val edges = ext.get("ARROW:extension:metadata")
          .flatMap(m => "\"edges\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(m).map(_.group(1)))
        if (!edges.contains("spherical"))
          throw new IllegalArgumentException(
            s"readGeoArrow: column '${f.getName}' declares edges=" +
              s""""${edges.getOrElse("planar")}"${if (edges.isEmpty) " (the GeoArrow default when the edges key is absent)" else ""}; """ +
              "only spherical edges are supported (planar geoarrow data must be " +
              "imported through a planar engine or re-tagged explicitly)")
      }
      StructField(f.getName, sparkType(f), f.isNullable, mb.build())
    }.toSeq
    val schema = StructType(sparkFields)
    val types = sparkFields.map(_.dataType).toArray
    val confEntries = conf.iterator().asScala.map(e => e.getKey -> e.getValue).toArray
    val files = parts.map(_.toString)
    val rdd = spark.sparkContext.parallelize(files.toIndexedSeq, files.length)
      .mapPartitions { paths =>
        val hconf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => hconf.set(k, v) }
        paths.flatMap { pathStr =>
          val p = new Path(pathStr)
          val pfs = p.getFileSystem(hconf)
          val allocator = new RootAllocator()
          val ch = new FsChannel(pfs.open(p), pfs.getFileStatus(p).getLen)
          val reader = new ArrowFileReader(ch, allocator)
          val vsrIn = reader.getVectorSchemaRoot
          // batches stream lazily; close everything when the file drains
          new Iterator[Row] {
            private var i = 0
            private var n = 0
            private var open = true
            private def advance(): Unit =
              while (open && i >= n) {
                if (reader.loadNextBatch()) { n = vsrIn.getRowCount; i = 0 }
                else {
                  open = false
                  try reader.close() catch { case _: Throwable => () }
                  try ch.close() catch { case _: Throwable => () }
                  allocator.close()
                }
              }
            override def hasNext: Boolean = { advance(); open }
            override def next(): Row = {
              advance()
              val vals = new Array[Any](types.length)
              var c = 0
              while (c < types.length) {
                val v = vsrIn.getVector(c)
                vals(c) =
                  if (v.isNull(i)) null
                  else types(c) match {
                    case BinaryType => v.asInstanceOf[VarBinaryVector].get(i)
                    case StringType => new String(v.asInstanceOf[VarCharVector].get(i),
                      java.nio.charset.StandardCharsets.UTF_8)
                    case LongType => v.asInstanceOf[BigIntVector].get(i)
                    case IntegerType => v.asInstanceOf[IntVector].get(i)
                    case DoubleType => v.asInstanceOf[Float8Vector].get(i)
                    case BooleanType => v.asInstanceOf[BitVector].get(i) == 1
                    case TimestampType =>
                      val us = v.asInstanceOf[TimeStampMicroTZVector].get(i)
                      val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
                      ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
                      ts
                    case _ => null
                  }
                c += 1
              }
              i += 1
              Row.fromSeq(vals.toIndexedSeq)
            }
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
