package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Regressions for the round-4 advice defects: ring-only crossing scans
  * for mixed-collection containers, vertex-incident line containment cuts,
  * and the index-pruned collinear fallback. */
class AdviceRegressionSpec extends AnyFunSuite {
  private def sh(w: String) = new GeoShapes(Wkt.read(w))

  /** Square ring WKT with `per` extra vertices per side (densified, same
    * region) — pushes numEdges past EdgeIndex.MinEdges to force the
    * indexed code paths. */
  private def denseSquare(lo: Double, hi: Double, per: Int): String = {
    def side(x0: Double, y0: Double, x1: Double, y1: Double) =
      (0 until per).map { i =>
        val t = i.toDouble / per
        s"${x0 + (x1 - x0) * t} ${y0 + (y1 - y0) * t}"
      }
    val pts = side(lo, lo, hi, lo) ++ side(hi, lo, hi, hi) ++
      side(hi, hi, lo, hi) ++ side(lo, hi, lo, lo)
    s"(${(pts :+ pts.head).mkString(", ")})"
  }

  test("a's polyline crossing a contained ring does not disqualify polygon containment") {
    // container = big square + a line that properly crosses b's ring;
    // the line cannot reduce the polygon's coverage, so contains stays true
    val b = sh("POLYGON ((-2 -2, 2 -2, 2 2, -2 2, -2 -2))")
    val mixedSmall = sh(
      "GEOMETRYCOLLECTION (POLYGON ((-10 -10, 10 -10, 10 10, -10 10, -10 -10)), LINESTRING (-5 0, 5 0))")
    assert(Relate.contains(mixedSmall, b))
    // same scenario through the edge-index path (container > MinEdges edges)
    val mixedDense = sh(
      s"GEOMETRYCOLLECTION (POLYGON (${denseSquare(-10, 10, 12)}), LINESTRING (-5 0, 5 0))")
    assert(mixedDense.numEdges >= EdgeIndex.MinEdges)
    assert(Relate.contains(mixedDense, b))
    // control: a polygon ring of b actually outside the container still fails
    assert(!Relate.contains(mixedDense, sh("POLYGON ((8 8, 12 8, 12 12, 8 12, 8 8))")))
  }

  test("line entering a polygon exactly through a ring vertex is cut there") {
    val poly = sh("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    // (-1 -1)->(1 1) meets the boundary exactly at the (0 0) vertex: no
    // proper crossing, but half the line is outside — must NOT be contained
    assert(!Relate.contains(poly, sh("LINESTRING (-1 -1, 1 1)")))
    // leaving through the vertex from inside stays contained
    assert(Relate.contains(poly, sh("LINESTRING (3 3, 0 0)")))
    // and the dense-ring variant exercises the indexed cut scan
    val dense = sh(s"POLYGON (${denseSquare(0, 10, 12)})")
    assert(dense.numEdges >= EdgeIndex.MinEdges)
    assert(!Relate.contains(dense, sh("LINESTRING (-1 -1, 1 1)")))
    assert(Relate.contains(dense, sh("LINESTRING (3 3, 0 0)")))
  }

  test("collinear cover through the edge-index candidates path") {
    // a meridian polyline densified past MinEdges: collinearIntervals must
    // find the covering sub-arcs via index candidates, not a full scan
    val pts = (0 to 40).map(i => s"0 ${i * 0.25}").mkString(", ")
    val dense = sh(s"LINESTRING ($pts)")
    assert(dense.numEdges >= EdgeIndex.MinEdges)
    assert(Relate.contains(dense, sh("LINESTRING (0 2, 0 8)")))
    assert(!Relate.contains(dense, sh("LINESTRING (0 2, 0 12)")))
    assert(Relate.intersects(dense, sh("LINESTRING (0 9, 0 11)")))
    assert(!Relate.intersects(dense, sh("LINESTRING (0 10.5, 0 12)")))
  }
}
