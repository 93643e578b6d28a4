package graft.spark

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import graft.core.{GeoCodec, Geography, LatLngRect, S2CellId, Wkb}

/** S2_BOX surface type: plain struct of degrees (reference S2_BOX is a
  * STRUCT(xmin,ymin,xmax,ymax DOUBLE) alias, src/s2_types.cpp:33-40). */
case class S2Box(xmin: Double, ymin: Double, xmax: Double, ymax: Double)

object S2Boxes {

  def toBox(r: LatLngRect): S2Box = S2Box(r.xminDeg, r.yminDeg, r.xmaxDeg, r.ymaxDeg)
  def toRect(b: S2Box): LatLngRect = LatLngRect.fromDegrees(b.xmin, b.ymin, b.xmax, b.ymax)

  /** Geography bound in radians; cell-center fast path decodes only the
    * 8-byte id (reference: s2_bounds.cpp:190-193). */
  def boundsRect(bytes: Array[Byte]): LatLngRect = {
    if (GeoCodec.isEmptyBlob(bytes)) LatLngRect.Empty
    else if (GeoCodec.kindOf(bytes) == GeoCodec.KindCellCenter) {
      val p = S2CellId.toPoint(GeoCodec.cellCenterIdOf(bytes))
      LatLngRect.Empty.addPoint(p.latRadians, p.lngRadians)
    } else LatLngRect.bound(GeoCodec.decode(bytes))
  }

  val boundsBox: Array[Byte] => S2Box = (bytes: Array[Byte]) => toBox(boundsRect(bytes))

  /** Constructor passes the input degrees through verbatim (the reference
    * S2_BOX constructor copies; only *operations* round-trip radians).
    * ymin > ymax is the EMPTY convention (s2_bounds.cpp:506-512). */
  val box: (Double, Double, Double, Double) => S2Box =
    (xmin: Double, ymin: Double, xmax: Double, ymax: Double) =>
      if (ymin > ymax) toBox(LatLngRect.Empty) else S2Box(xmin, ymin, xmax, ymax)

  val boxIntersects: (S2Box, S2Box) => Boolean =
    (a: S2Box, b: S2Box) => toRect(a).intersects(toRect(b))

  val boxUnion: (S2Box, S2Box) => S2Box =
    (a: S2Box, b: S2Box) => toBox(toRect(a).union(toRect(b)))

  /** Identity in Spark — no aliased types to strip (reference
    * s2_bounds.cpp:455-492 exists only because DuckDB aliases structs). */
  val boxStruct: S2Box => S2Box = (b: S2Box) => b

  val boxWkb: S2Box => Array[Byte] =
    (b: S2Box) => Wkb.write(LatLngRect.toWkbGeography(toRect(b)))

  /** s2_bounds_box_agg: rect-union aggregate
    * (reference: s2_bounds.cpp:204-348; Update/Combine/Finalize map to
    * reduce/merge/finish). The buffer is the raw rect in radians. */
  class BoundsBoxAgg extends Aggregator[Array[Byte], (Double, Double, Double, Double), S2Box] {
    def zero: (Double, Double, Double, Double) = (1.0, 0.0, Math.PI, -Math.PI)
    def reduce(b: (Double, Double, Double, Double), g: Array[Byte]): (Double, Double, Double, Double) = {
      val u = LatLngRect(b._1, b._2, b._3, b._4).union(boundsRect(g))
      (u.latLo, u.latHi, u.lngLo, u.lngHi)
    }
    def merge(a: (Double, Double, Double, Double), b: (Double, Double, Double, Double)): (Double, Double, Double, Double) = {
      val u = LatLngRect(a._1, a._2, a._3, a._4).union(LatLngRect(b._1, b._2, b._3, b._4))
      (u.latLo, u.latHi, u.lngLo, u.lngHi)
    }
    def finish(b: (Double, Double, Double, Double)): S2Box =
      toBox(LatLngRect(b._1, b._2, b._3, b._4))
    def bufferEncoder: Encoder[(Double, Double, Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[S2Box] = Encoders.product[S2Box]
  }

  def register(spark: SparkSession): Unit = {
    val r = spark.udf
    r.register("s2_bounds_box", boundsBox)
    r.register("s2_box", box)
    r.register("s2_box_intersects", boxIntersects)
    r.register("s2_box_union", boxUnion)
    r.register("s2_box_struct", boxStruct)
    r.register("s2_box_wkb", boxWkb)
    r.register("s2_bounds_box_agg", udaf(new BoundsBoxAgg))
    ()
  }
}
