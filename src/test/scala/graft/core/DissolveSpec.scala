package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Canonical union boundaries: the A ⊎ (B \ A) decomposition's seam edges
  * are dissolved, so overlapping multi-ring / hole-bearing unions emit ONE
  * boundary per connected region (deterministic WKT), with area and
  * containment exactly preserved. */
class DissolveSpec extends AnyFunSuite {
  private def g(w: String) = Wkt.read(w)
  private def union6(a: String, b: String): String =
    Wkt.write(Overlay.union(g(a), g(b)), 6)

  private val mpA = "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)), ((30 30, 40 30, 40 40, 30 40, 30 30)))"
  private val mpB = "MULTIPOLYGON (((5 5, 15 5, 15 15, 5 15, 5 5)), ((35 35, 45 35, 45 45, 35 45, 35 35)))"
  private val hpA = "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0), (5 5, 15 5, 15 15, 5 15, 5 5))"
  private val hpB = "POLYGON ((10 10, 30 10, 30 30, 10 30, 10 10))"

  test("overlapping MULTIPOLYGON union is two clean rings, no seams") {
    val w = union6(mpA, mpB)
    assert(w ===
      "MULTIPOLYGON (((45 45, 35 45, 35 40.107598, 30 40, 30 30, 40 30, 40 35.102702, 45 35, 45 45)), " +
      "((15 15, 5 15, 5 10.037423, 0 10, 0 0, 10 0, 10 5.019002, 15 5, 15 15)))")
    // 9 vertices per merged ring (8 corners + closing repeat): no seam path
    assert(!w.contains("10 10") && !w.contains("40 40"))
  }

  test("hole-bearing union: outer boundary merges, hole shrinks to the L-remainder") {
    val w = union6(hpA, hpB)
    assert(w ===
      "POLYGON ((30 30, 10 30, 10 20.283559, 0 20, 0 0, 20 0, 20 10.151082, 30 10, 30 30), " +
      "(15 10.113253, 10 10, 10 15.054701, 5 15, 5 5, 15 5, 15 10.113253))")
  }

  test("island fully inside a hole stays its own polygon (parity nesting)") {
    val w = union6(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 3 7, 7 7, 7 3, 3 3))",
      "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))")
    assert(w ===
      "MULTIPOLYGON (((10 10, 0 10, 0 0, 10 0, 10 10), (7 7, 3 7, 3 3, 7 3, 7 7)), " +
      "((6 6, 4 6, 4 4, 6 4, 6 6)))")
  }

  test("union area follows inclusion-exclusion exactly after the dissolve") {
    for ((a, b) <- Seq((mpA, mpB), (hpA, hpB))) {
      val ua = S2Measure.areaMeters2(Overlay.union(g(a), g(b)))
      val ie = S2Measure.areaMeters2(g(a)) + S2Measure.areaMeters2(g(b)) -
        S2Measure.areaMeters2(Overlay.intersection(g(a), g(b)))
      assert(Math.abs(ua - ie) / ie < 1e-12)
    }
  }

  test("containment semantics survive the dissolve") {
    val u = new GeoShapes(Overlay.union(g(hpA), g(hpB)))
    assert(u.polygonContains(g("POINT (12 12)").asInstanceOf[Geography.Points].points.head)) // filled by B
    assert(!u.polygonContains(g("POINT (7 7)").asInstanceOf[Geography.Points].points.head)) // still hole
    assert(u.polygonContains(g("POINT (25 25)").asInstanceOf[Geography.Points].points.head)) // B-only area
  }
}
