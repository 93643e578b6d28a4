package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Goldens from reference test/sql/geography/cell_ops.test (values only). */
class S2CellIdSpec extends AnyFunSuite {
  import S2CellId._

  val leafDebug = "2/112230310012123001312232330210"

  test("fromLonLat golden: (-64, 45)") {
    val id = fromLonLatDegrees(-64, 45)
    assert(toDebugString(id) == leafDebug)
    assert(toToken(id) == "4b59a0cd83b5de49")
    assert(level(id) == 30)
    assert(isLeaf(id))
  }

  test("NaN -> sentinel") {
    assert(fromLonLatDegrees(Double.NaN, Double.NaN) == Sentinel)
    assert(toDebugString(Sentinel) == "Invalid: ffffffffffffffff")
    assert(level(-1L) == 0 || !isValid(-1L)) // sentinel is not valid
  }

  test("token roundtrip + invalid token") {
    val id = fromToken("4b59a0cd83b5de49")
    assert(toDebugString(id) == leafDebug)
    assert(fromToken("foofy") == 0L)
    assert(toDebugString(0L) == "Invalid: 0000000000000000")
    assert(level(0L) == -1)
  }

  test("debug string roundtrip") {
    val id = fromDebugString(leafDebug)
    assert(toToken(id) == "4b59a0cd83b5de49")
    assert(fromDebugString("2/") == parent(id, 0))
    assert(toDebugString(fromDebugString("2/")) == "2/")
  }

  test("parent/child") {
    val leaf = fromDebugString(leafDebug)
    assert(toDebugString(parent(leaf, 0)) == "2/")
    val face2 = fromDebugString("2/")
    assert(toDebugString(child(face2, 0)) == "2/0")
    assert(level(face2) == 0)
    assert(level(child(face2, 3)) == 1)
  }

  test("range min/max") {
    val face2 = fromDebugString("2/")
    assert(toDebugString(rangeMin(face2)) == "2/" + "0" * 30)
    assert(toDebugString(rangeMax(face2)) == "2/" + "3" * 30)
  }

  test("containment/intersection") {
    val face2 = fromDebugString("2/")
    val c20 = fromDebugString("2/0")
    val face3 = fromDebugString("3/")
    assert(contains(face2, c20))
    assert(!contains(c20, face2))
    assert(intersects(face2, c20))
    assert(intersects(c20, face2))
    assert(!intersects(face2, face3))
  }

  test("edge neighbors of a face cell") {
    val face2 = fromDebugString("2/")
    val n = edgeNeighbors(face2)
    assert(n.map(toDebugString).contains("1/"))
    assert(n.forall(level(_) == 0))
    assert(n.toSet.size == 4)
  }

  test("cell '2/0' vertices match cell-union border golden") {
    // POLYGON ((45 35.26439, 90 45, 0 90, 0 45, 45 35.26439))
    val vs = vertices(fromDebugString("2/0"))
      .map { p =>
        val lat = math.round(p.latDegrees * 1e5) / 1e5
        val lng0 = math.round(p.lngDegrees * 1e5) / 1e5
        val lng = if (math.abs(lat) == 90.0) 0.0 else lng0 // pole: lng undefined
        (lng, lat)
      }
      .toSet
    assert(vs == Set((45.0, 35.26439), (90.0, 45.0), (0.0, 90.0), (0.0, 45.0)))
  }

  test("cell center roundtrip: center of leaf from lonlat ~= lonlat") {
    val id = fromLonLatDegrees(-64, 45)
    val (lat, lng) = toLatLngDegrees(id)
    assert(math.abs(lat - 45) < 1e-6)
    assert(math.abs(lng + 64) < 1e-6)
  }

  test("property: debug-string/token/parent invariants on a lattice") {
    var lon = -180.0
    while (lon < 180.0) {
      var lat = -88.0
      while (lat <= 88.0) {
        val id = fromLonLatDegrees(lon, lat)
        assert(isValid(id) && isLeaf(id))
        assert(fromToken(toToken(id)) == id)
        assert(fromDebugString(toDebugString(id)) == id)
        var lvl = 30
        var cur = id
        while (lvl > 0) {
          val p = parent(cur)
          assert(level(p) == lvl - 1)
          assert(contains(p, cur) && contains(p, id))
          assert(child(p, childPosition(id, lvl)) == cur)
          cur = p; lvl -= 1
        }
        lat += 16.0
      }
      lon += 31.0
    }
  }

  test("unsigned ordering discipline: face 4/5 leaf ids have sign bit set") {
    val idF5 = fromLonLatDegrees(0, -90) // south pole is on face 5
    assert(idF5 < 0) // sign bit set in signed Long
    val idF0 = fromLonLatDegrees(0, 0)
    assert(compareUnsigned(idF0, idF5) < 0)
    assert(sortKey(idF0) < sortKey(idF5))
  }
}
