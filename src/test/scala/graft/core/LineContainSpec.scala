package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Exact collinear arc-interval cover for line-in-line containment
  * (replaces midpoint sampling; a gapped container must fail). */
class LineContainSpec extends AnyFunSuite {
  private def sh(w: String) = new GeoShapes(Wkt.read(w))

  private val full = sh("LINESTRING (0 0, 0 10)")
  private val sub = sh("LINESTRING (0 2, 0 8)")
  private val gap = sh("MULTILINESTRING ((0 0, 0 4), (0 6, 0 10))")
  private val densified = sh("LINESTRING (0 0, 0 5, 0 10)")
  private val offCircle = sh("LINESTRING (0 2, 1 8)")

  test("identical line contains itself") {
    assert(Relate.contains(full, sh("LINESTRING (0 0, 0 10)")))
  }
  test("proper collinear sub-arc is contained") {
    assert(Relate.contains(full, sub))
    assert(!Relate.contains(sub, full))
  }
  test("densified same point set: contained both ways, equal") {
    assert(Relate.contains(full, densified))
    assert(Relate.contains(densified, full))
    assert(Relate.equalsGeog(full, densified))
    assert(!Relate.equalsGeog(full, sub))
  }
  test("gapped container fails interval cover") {
    assert(!Relate.contains(gap, sub))
    // but each half alone is contained
    assert(Relate.contains(gap, sh("LINESTRING (0 1, 0 3)")))
    assert(Relate.contains(gap, sh("LINESTRING (0 7, 0 9)")))
  }
  test("non-collinear line is not contained") {
    assert(!Relate.contains(full, offCircle))
  }
  test("multi-edge cover across a vertex") {
    // b edge spans a's vertex at 0 5: union of two a edges covers it
    assert(Relate.contains(densified, sub))
  }
  test("vertex-free shared boundary arcs intersect (closed model)") {
    // line lying on a polygon edge, sharing no vertex with the ring
    val poly = sh("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert(Relate.intersects(poly, sh("LINESTRING (0 2, 0 8)")))
    // two polygons whose boundaries share a collinear arc, no shared vertex
    val neighbor = sh("POLYGON ((0 2, -10 2, -10 8, 0 8, 0 2))")
    assert(Relate.intersects(poly, neighbor))
    // strictly disjoint control
    assert(!Relate.intersects(poly, sh("POLYGON ((20 2, 12 2, 12 8, 20 8, 20 2))")))
  }

  test("mixed collection containers compose: polygon + line covers a through-edge") {
    // container: a square plus a "bridge" polyline continuing north along
    // the lon-0 meridian (y = 0 exactly in fp, so the bridge is EXACTLY
    // collinear with b edges on that meridian — the collinear-cover rule
    // only fires for exactly-coplanar stored coordinates, like S2's exact
    // predicates)
    val mixed = sh("GEOMETRYCOLLECTION (POLYGON ((-5 0, 5 0, 5 10, -5 10, -5 0)), LINESTRING (0 10, 0 20))")
    // b runs through the polygon interior then along the bridge line
    assert(Relate.contains(mixed, sh("LINESTRING (0 2, 0 18)")))
    // but not past the bridge's end
    assert(!Relate.contains(mixed, sh("LINESTRING (0 2, 0 25)")))
    // a meridian with no bridge leaves the polygon uncovered past the top
    assert(!Relate.contains(mixed, sh("LINESTRING (3 2, 3 18)")))
    // wholly inside the polygon still works
    assert(Relate.contains(mixed, sh("LINESTRING (-4 1, 4 9)")))
  }

  test("collinear overlap counts as intersects (consistency with contains)") {
    assert(Relate.intersects(full, sub))
    assert(Relate.dwithin(full, sub, 1.0))
    assert(Relate.distanceAngle(full, sub) === 0.0)
    // disjoint collinear arcs do NOT overlap
    assert(!Relate.intersects(sh("LINESTRING (0 0, 0 2)"), sh("LINESTRING (0 6, 0 8)")))
  }
}
