package graft.spark

import java.nio.channels.Channels

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowFileWriter
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
}
