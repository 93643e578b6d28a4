package graft.core

import org.scalatest.funsuite.AnyFunSuite

class OverlaySpec extends AnyFunSuite {
  private def g(w: String) = Wkt.read(w)

  test("difference with contained subtrahend produces shell + hole") {
    val a = g("POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))")
    val b = g("POLYGON ((5 5, 10 5, 10 10, 5 10, 5 5))")
    val d = Overlay.difference(a, b)
    val rel = Math.abs(S2Measure.areaMeters2(d) -
      (S2Measure.areaMeters2(a) - S2Measure.areaMeters2(b))) / S2Measure.areaMeters2(a)
    assert(rel < 1e-12)
    val sd = new GeoShapes(d)
    assert(sd.polygonContains(S2Point.fromLatLngDegrees(15, 15)))
    assert(!sd.polygonContains(S2Point.fromLatLngDegrees(7, 7)))
  }

  test("overlapping squares: intersection/difference/union area algebra") {
    val a = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    val b = g("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")
    val aA = S2Measure.areaMeters2(a); val aB = S2Measure.areaMeters2(b)
    val aI = S2Measure.areaMeters2(Overlay.intersection(a, b))
    val aD = S2Measure.areaMeters2(Overlay.difference(a, b))
    val aU = S2Measure.areaMeters2(Overlay.union(a, b))
    assert(Math.abs(aI + aD - aA) / aA < 1e-9)
    assert(Math.abs(aU - (aA + aB - aI)) / aA < 1e-9)
    val si = new GeoShapes(Overlay.intersection(a, b))
    assert(si.polygonContains(S2Point.fromLatLngDegrees(7, 7)))
    assert(!si.polygonContains(S2Point.fromLatLngDegrees(3, 3)))
  }

  test("union of disjoint polygons keeps both") {
    val a = g("POLYGON ((0 0, 5 0, 0 5, 0 0))")
    val b = g("POLYGON ((20 20, 25 20, 20 25, 20 20))")
    val u = Overlay.union(a, b)
    val rel = Math.abs(S2Measure.areaMeters2(u) -
      (S2Measure.areaMeters2(a) + S2Measure.areaMeters2(b))) / S2Measure.areaMeters2(a)
    assert(rel < 1e-12)
  }

  test("line clipped by polygon") {
    val line = g("LINESTRING (-5 5, 15 5)")
    val poly = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    val i = Overlay.intersection(line, poly)
    assert(i.dimension === 1)
    val len = S2Measure.lengthMeters(i)
    val full = S2Measure.lengthMeters(line)
    assert(len > 0.4 * full && len < 0.6 * full) // roughly the middle half
    val d = Overlay.difference(line, poly)
    assert(Math.abs(S2Measure.lengthMeters(d) + len - full) / full < 1e-9)
  }
}
