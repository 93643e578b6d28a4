package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Property-style invariants over seeded random samples (scalatestplus is
  * not in the offline cache; deterministic sampling stands in for
  * forAll). */
class CellIdPropertySpec extends AnyFunSuite {
  private val N = 500

  private def samples: Seq[(Double, Double, Int)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(N)((rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 179 - 89.5,
      rnd.nextInt(31)))
  }

  private def cells: Seq[Long] =
    samples.map { case (lon, lat, lvl) =>
      S2CellId.parent(S2CellId.fromLonLatDegrees(lon, lat), lvl)
    }

  test("token round-trip is identity") {
    cells.foreach(id => assert(S2CellId.fromToken(S2CellId.toToken(id)) === id))
  }

  test("debug-string round-trip is identity") {
    cells.foreach(id => assert(S2CellId.fromDebugString(S2CellId.toDebugString(id)) === id))
  }

  test("parent contains children; children partition the parent range") {
    for (id <- cells if S2CellId.level(id) < 30) {
      val kids = (0 to 3).map(S2CellId.child(id, _))
      kids.foreach(k => assert(S2CellId.contains(id, k)))
      kids.foreach(k => assert(S2CellId.parent(k) === id))
      // leaf count of a cell = lsb(id); children's leaves partition parent's
      val total = kids.map(k => (S2CellId.rangeMax(k) - S2CellId.rangeMin(k)) / 2 + 1).sum
      assert(total === (S2CellId.rangeMax(id) - S2CellId.rangeMin(id)) / 2 + 1)
    }
  }

  test("range_min <= id <= range_max in unsigned order") {
    cells.foreach { id =>
      assert(S2CellId.compareUnsigned(S2CellId.rangeMin(id), id) <= 0)
      assert(S2CellId.compareUnsigned(id, S2CellId.rangeMax(id)) <= 0)
    }
  }

  test("sortKey preserves unsigned order") {
    val cs = cells
    for ((a, b) <- cs.zip(cs.drop(1))) {
      assert(Integer.signum(java.lang.Long.compare(S2CellId.sortKey(a), S2CellId.sortKey(b))) ===
        Integer.signum(S2CellId.compareUnsigned(a, b)))
    }
  }

  test("leaf cell center is within leaf-cell distance of defining point") {
    for ((lon, lat, _) <- samples) {
      val leaf = S2CellId.fromLonLatDegrees(lon, lat)
      val p = S2Point.fromLatLngDegrees(lat, lon)
      val c = S2CellId.toPoint(leaf)
      assert(p.angle(c) < 1e-8) // leaf cell diagonal ~ 3e-9 rad
      assert(S2CellId.fromPoint(c.x, c.y, c.z) === leaf)
    }
  }

  test("edge neighbors stay at the same level and are disjoint from the cell") {
    for (id <- cells if S2CellId.level(id) > 0) {
      S2CellId.edgeNeighbors(id).foreach { n =>
        assert(S2CellId.level(n) === S2CellId.level(id))
        assert(!S2CellId.intersects(id, n))
      }
    }
  }

  test("wkt round-trip at precision 9 is stable") {
    for ((lon, lat, _) <- samples.take(200)) {
      val w1 = Wkt.write(Geography.point(lon, lat), 9)
      val w2 = Wkt.write(Wkt.read(w1), 9)
      assert(w1 === w2)
    }
  }

  test("covering of a point is its leaf cell") {
    for ((lon, lat, _) <- samples.take(100)) {
      val cov = RegionCoverer.cover(Geography.point(lon, lat))
      assert(cov.toSeq === Seq(S2CellId.fromLonLatDegrees(lon, lat)))
    }
  }
}
