package graft.core

import org.scalatest.funsuite.AnyFunSuite

class BoundsCoveringSpec extends AnyFunSuite {
  private def res(p: String) = {
    val in = getClass.getResourceAsStream(p)
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().drop(1).map(_.split('\t')).toList finally src.close()
  }
  private lazy val countries = res("/graft/countries.tsv").map(a => a(0) -> a(2)).toMap

  private def dbg(ids: Array[Long]) = ids.map(S2CellId.toDebugString).mkString(", ")

  test("Fiji default covering matches reference golden (bounds.test:8-11)") {
    val fiji = Wkt.read(countries("Fiji"))
    assert(dbg(RegionCoverer.cover(fiji)) ===
      "3/13002011, 3/1300232, 3/130030, 3/130031, 3/130033, 3/130100, 3/2032333, 3/20330000000")
  }

  test("Fiji fixed-level covering matches golden (bounds.test:13-17)") {
    val fiji = Wkt.read(countries("Fiji"))
    assert(dbg(RegionCoverer.coverFixedLevel(fiji, 5)) ===
      "3/13002, 3/13003, 3/13010, 3/20323, 3/20330")
  }

  test("cell-center covering fast path (bounds.test:19-27)") {
    val cc = Geography.CellCenter(S2CellId.fromLonLatDegrees(-64, 45))
    assert(dbg(RegionCoverer.cover(cc)) === "2/112230310012123001312232330210")
    assert(dbg(RegionCoverer.coverFixedLevel(cc, 5)) === "2/11223")
  }

  test("empty rect constants match the reference empty box (bounds.test:40-43)") {
    val e = LatLngRect.Empty
    assert(e.xminDeg === 180.0)
    assert(e.yminDeg === 57.29577951308232)
    assert(e.xmaxDeg === -180.0)
    assert(e.ymaxDeg === 0.0)
  }

  test("multipoint bound matches golden fp exactly (bounds.test:53-56)") {
    val r = LatLngRect.bound(Wkt.read("MULTIPOINT (0 1, 2 3)"))
    assert(r.xminDeg === 0.0)
    assert(r.yminDeg === 1.0)
    assert(r.xmaxDeg === 1.9999999999999996)
    assert(r.ymaxDeg === 3.0000000000000004)
  }

  test("antimeridian union (bounds.test:122-127)") {
    val a = LatLngRect.fromDegrees(179, 1, 180, 3)
    val b = LatLngRect.fromDegrees(-180, 5, -179, 7)
    val u = a.union(b)
    assert(u.lngInverted)
    assert(math.abs(u.xminDeg - 179.0) < 1e-12)
    assert(math.abs(u.xmaxDeg - -179.0) < 1e-12)
  }

  test("pole-enclosing polygon bounds to the pole") {
    val antarctica = Wkt.read(countries("Antarctica"))
    val r = LatLngRect.bound(antarctica)
    assert(r.yminDeg === -90.0)
    assert(r.xminDeg === -180.0 && r.xmaxDeg === 180.0)
  }

  test("geodesic edge interior expands latitude (RectBounder semantics)") {
    // LINESTRING (-45 45, 45 45): the arc bulges poleward of the vertices;
    // great circle through both points peaks at atan(tan(45deg)*sqrt(2))
    val r = LatLngRect.bound(Wkt.read("LINESTRING (-45 45, 45 45)"))
    val expect = S2Point.rad2deg(Math.atan(Math.sqrt(2.0)))
    assert(math.abs(r.ymaxDeg - expect) < 1e-9, s"ymax ${r.ymaxDeg} want $expect")
    assert(math.abs(r.yminDeg - 45.0) < 1e-9)
    // southern-hemisphere mirror hits the latLo branch
    val s = LatLngRect.bound(Wkt.read("LINESTRING (-45 -45, 45 -45)"))
    assert(math.abs(s.yminDeg + expect) < 1e-9)
    assert(math.abs(s.ymaxDeg + 45.0) < 1e-9)
    // polygon edges expand too
    val p = LatLngRect.bound(Wkt.read("POLYGON ((-45 0, 45 0, 45 45, -45 45, -45 0))"))
    assert(math.abs(p.ymaxDeg - expect) < 1e-9)
    assert(math.abs(p.yminDeg - 0.0) < 1e-12)
    // a short edge keeps its vertex bound (extremum not interior)
    val q = LatLngRect.bound(Wkt.read("LINESTRING (0 10, 1 11)"))
    assert(math.abs(q.ymaxDeg - 11.0) < 1e-9)
  }

  test("degenerate-radius covering still covers all points (seed clamp)") {
    // sub-centimeter multipoint: cap radius ~0 drives seedLevel to the max;
    // before the MaxLevel-1 clamp, ijSize(31) wrapped and seeds collapsed
    // to one leaf, missing points across a leaf boundary
    val g = Wkt.read("MULTIPOINT (10 10, 10.00000008 10.00000008)")
    val cov = RegionCoverer.cover(g)
    val shapes = new GeoShapes(g)
    shapes.g.foreachVertex { p =>
      val leaf = S2CellId.fromPoint(p.x, p.y, p.z)
      assert(cov.exists(c => S2CellId.contains(c, leaf)), s"covering misses $p")
    }
    // exact duplicates: radius is exactly 0
    val dup = Wkt.read("MULTIPOINT (10 10, 10 10)")
    val covDup = RegionCoverer.cover(dup)
    assert(covDup.nonEmpty)
  }

  test("box intersects is antimeridian-aware") {
    val fiji = LatLngRect.fromDegrees(177, -19, -179, -16) // crosses
    val nearDateLineEast = LatLngRect.fromDegrees(-180, -18, -179.5, -17)
    val nearDateLineWest = LatLngRect.fromDegrees(178, -18, 179, -17)
    val far = LatLngRect.fromDegrees(0, -18, 10, -17)
    assert(fiji.intersects(nearDateLineEast))
    assert(fiji.intersects(nearDateLineWest))
    assert(!fiji.intersects(far))
  }

  test("S2 conversion operand order (1-ulp parity)") {
    // (180/pi)*((pi/180)*3 after xyz roundtrip) pins the reference's value
    val p = S2Point.fromLatLngDegrees(3.0, 0.0)
    assert(p.latDegrees === 3.0000000000000004)
  }
}
