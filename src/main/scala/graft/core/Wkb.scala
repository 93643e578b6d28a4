package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import Geography._

/**
 * ISO WKB reader/writer (lon/lat, spherical edges) + the minimal-scan
 * visitors behind s2_cellfromwkb / s2_arbitrarycellfromwkb
 * (SURVEY.md §2.1, §2.7; reference: src/s2_functions_io.cpp:200-318,
 * src/s2_cell_ops.cpp:310-461 — behavior, not implementation).
 */
object Wkb {
  final case class WkbParseException(msg: String) extends RuntimeException(msg)

  private final val TPoint = 1
  private final val TLine = 2
  private final val TPolygon = 3
  private final val TMultiPoint = 4
  private final val TMultiLine = 5
  private final val TMultiPolygon = 6
  private final val TCollection = 7

  // --------------------------------------------------------------- writer

  def write(g: Geography): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    writeGeom(out, g)
    out.toByteArray
  }

  private def writeHeader(out: java.io.ByteArrayOutputStream, geomType: Int): Unit = {
    out.write(1) // little-endian
    writeInt(out, geomType)
  }

  private def writeInt(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  private def writeDouble(out: java.io.ByteArrayOutputStream, v: Double): Unit = {
    val bits = java.lang.Double.doubleToLongBits(v)
    var i = 0
    while (i < 8) { out.write(((bits >> (8 * i)) & 0xff).toInt); i += 1 }
  }

  private def writeCoord(out: java.io.ByteArrayOutputStream, p: S2Point): Unit = {
    val lat = p.latDegrees
    val lng = if (Math.abs(lat) == 90.0) 0.0 else p.lngDegrees
    writeDouble(out, lng); writeDouble(out, lat)
  }

  private def writeGeom(out: java.io.ByteArrayOutputStream, g: Geography): Unit = g match {
    case c: CellCenter =>
      if (c.isEmpty) { writeHeader(out, TPoint); writeDouble(out, Double.NaN); writeDouble(out, Double.NaN) }
      else { writeHeader(out, TPoint); writeCoord(out, c.point) }
    case Points(ps) =>
      if (ps.isEmpty) {
        // ISO: POINT EMPTY -> NaN coords
        writeHeader(out, TPoint); writeDouble(out, Double.NaN); writeDouble(out, Double.NaN)
      } else if (ps.size == 1) {
        writeHeader(out, TPoint); writeCoord(out, ps.head)
      } else {
        writeHeader(out, TMultiPoint); writeInt(out, ps.size)
        ps.foreach { p => writeHeader(out, TPoint); writeCoord(out, p) }
      }
    case Polylines(ls0) =>
      val ls = ls0.filter(_.nonEmpty)
      if (ls.isEmpty) { writeHeader(out, TLine); writeInt(out, 0) }
      else if (ls.size == 1) {
        writeHeader(out, TLine); writeInt(out, ls.head.size)
        ls.head.foreach(writeCoord(out, _))
      } else {
        writeHeader(out, TMultiLine); writeInt(out, ls.size)
        ls.foreach { l =>
          writeHeader(out, TLine); writeInt(out, l.size); l.foreach(writeCoord(out, _))
        }
      }
    case p: Polygons =>
      val gs = p.ringGroups.filter(_.exists(_.nonEmpty))
      if (gs.isEmpty) { writeHeader(out, TPolygon); writeInt(out, 0) }
      else if (gs.size == 1) writePolygon(out, gs.head)
      else {
        writeHeader(out, TMultiPolygon); writeInt(out, gs.size)
        gs.foreach(writePolygon(out, _))
      }
    case Collection(items) =>
      writeHeader(out, TCollection); writeInt(out, items.size)
      items.foreach(writeGeom(out, _))
  }

  private def writePolygon(out: java.io.ByteArrayOutputStream, rings: Vector[Vector[S2Point]]): Unit = {
    val rs = rings.filter(_.nonEmpty)
    writeHeader(out, TPolygon); writeInt(out, rs.size)
    rs.foreach { r =>
      writeInt(out, r.size + 1)
      r.foreach(writeCoord(out, _))
      writeCoord(out, r.head) // close the ring
    }
  }

  // --------------------------------------------------------------- reader

  def read(bytes: Array[Byte], validate: Boolean = true): Geography = {
    val buf = ByteBuffer.wrap(bytes)
    val g = readGeom(buf)
    if (validate) Validation.findError(g).foreach(e => throw WkbParseException(e))
    g
  }

  private def readGeom(buf: ByteBuffer): Geography = {
    val order = buf.get()
    buf.order(if (order == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val rawType = buf.getInt()
    val geomType = rawType % 1000 // tolerate ISO Z/M offsets
    geomType match {
      case TPoint =>
        val lng = buf.getDouble(); val lat = buf.getDouble()
        if (lng.isNaN || lat.isNaN) emptyPoint
        else Points(Vector(S2Point.fromLatLngDegrees(lat, lng)))
      case TLine =>
        val n = buf.getInt()
        if (n == 0) Polylines(Vector.empty)
        else Polylines(Vector(readCoords(buf, n)))
      case TPolygon =>
        val g = readPolygonBody(buf)
        if (g.isEmpty) Polygons(Vector.empty) else Polygons(Vector(g))
      case TMultiPoint =>
        val n = buf.getInt()
        val pts = Vector.newBuilder[S2Point]
        var i = 0
        while (i < n) {
          readGeom(buf) match {
            case Points(ps) => ps.foreach(pts += _)
            case _ => throw WkbParseException("MULTIPOINT member is not a point")
          }
          i += 1
        }
        Points(pts.result())
      case TMultiLine =>
        val n = buf.getInt()
        val ls = Vector.newBuilder[Vector[S2Point]]
        var i = 0
        while (i < n) {
          readGeom(buf) match {
            case Polylines(xs) => xs.foreach(ls += _)
            case _ => throw WkbParseException("MULTILINESTRING member is not a linestring")
          }
          i += 1
        }
        Polylines(ls.result())
      case TMultiPolygon =>
        val n = buf.getInt()
        val gs = Vector.newBuilder[Vector[Vector[S2Point]]]
        var i = 0
        while (i < n) {
          readGeom(buf) match {
            case p: Polygons => p.ringGroups.foreach(gs += _)
            case _ => throw WkbParseException("MULTIPOLYGON member is not a polygon")
          }
          i += 1
        }
        Polygons(gs.result())
      case TCollection =>
        val n = buf.getInt()
        val items = Vector.newBuilder[Geography]
        var i = 0
        while (i < n) { items += readGeom(buf); i += 1 }
        Collection(items.result())
      case other => throw WkbParseException(s"Unsupported WKB geometry type: $other")
    }
  }

  private def readCoords(buf: ByteBuffer, n: Int): Vector[S2Point] = {
    val b = Vector.newBuilder[S2Point]
    var i = 0
    while (i < n) {
      val lng = buf.getDouble(); val lat = buf.getDouble()
      b += S2Point.fromLatLngDegrees(lat, lng)
      i += 1
    }
    b.result()
  }

  private def readPolygonBody(buf: ByteBuffer): Vector[Vector[S2Point]] = {
    val nRings = buf.getInt()
    val rings = Vector.newBuilder[Vector[S2Point]]
    var i = 0
    while (i < nRings) {
      val n = buf.getInt()
      val pts = readCoords(buf, n)
      val ring = if (pts.size > 1 && pts.head == pts.last) pts.dropRight(1) else pts
      rings += ring
      i += 1
    }
    Wkt.normalizeRings(rings.result())
  }

  // --------------------------------------- minimal-scan cell id extraction

  /** s2_cellfromwkb: exactly one point (or empty) else error
    * (reference: s2_cell_ops.cpp:174-285). Returns the sentinel for empty. */
  def cellFromWkb(bytes: Array[Byte]): Long = {
    var found: Option[(Double, Double)] = None
    scanPoints(ByteBuffer.wrap(bytes), (lng, lat) => {
      if (lng.isNaN || lat.isNaN) true
      else if (found.isEmpty) { found = Some((lng, lat)); true }
      else throw WkbParseException("Can't parse WKB with more than one point to S2_CELL_CENTER")
    }, pointsOnly = true)
    found match {
      case Some((lng, lat)) => S2CellId.fromLonLatDegrees(lng, lat)
      case None => S2CellId.Sentinel
    }
  }

  /** s2_arbitrarycellfromwkb: first vertex of any geometry
    * (reference: s2_cell_ops.cpp:207-308). Sentinel if no vertex. */
  def arbitraryCellFromWkb(bytes: Array[Byte]): Long = {
    var found: Option[(Double, Double)] = None
    scanPoints(ByteBuffer.wrap(bytes), (lng, lat) => {
      if (lng.isNaN || lat.isNaN) true
      else { found = Some((lng, lat)); false } // stop at first vertex
    }, pointsOnly = false)
    found match {
      case Some((lng, lat)) => S2CellId.fromLonLatDegrees(lng, lat)
      case None => S2CellId.Sentinel
    }
  }

  /** Streaming WKB scan; visit returns false to stop. pointsOnly=true errors
    * on non-point geometries (the s2_cellfromwkb contract). */
  private def scanPoints(buf: ByteBuffer, visit: (Double, Double) => Boolean,
                         pointsOnly: Boolean): Boolean = {
    val order = buf.get()
    buf.order(if (order == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val geomType = buf.getInt() % 1000
    geomType match {
      case TPoint =>
        visit(buf.getDouble(), buf.getDouble())
      case TMultiPoint =>
        val n = buf.getInt()
        var i = 0
        while (i < n) { if (!scanPoints(buf, visit, pointsOnly)) return false; i += 1 }
        true
      case TCollection =>
        val n = buf.getInt()
        var i = 0
        while (i < n) { if (!scanPoints(buf, visit, pointsOnly)) return false; i += 1 }
        true
      case TLine =>
        if (pointsOnly) {
          val n = buf.getInt()
          if (n > 0) throw WkbParseException("Can't parse WKB with non-point input to S2_CELL_CENTER")
          true
        } else {
          val n = buf.getInt()
          var i = 0
          while (i < n) { if (!visit(buf.getDouble(), buf.getDouble())) return false; i += 1 }
          true
        }
      case TPolygon =>
        val nRings = buf.getInt()
        if (pointsOnly) {
          if (nRings > 0) throw WkbParseException("Can't parse WKB with non-point input to S2_CELL_CENTER")
          true
        } else {
          var r = 0
          while (r < nRings) {
            val n = buf.getInt()
            var i = 0
            while (i < n) { if (!visit(buf.getDouble(), buf.getDouble())) return false; i += 1 }
            r += 1
          }
          true
        }
      case TMultiLine | TMultiPolygon =>
        val n = buf.getInt()
        var i = 0
        while (i < n) { if (!scanPoints(buf, visit, pointsOnly)) return false; i += 1 }
        true
      case other => throw WkbParseException(s"Unsupported WKB geometry type: $other")
    }
  }
}
