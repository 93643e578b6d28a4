package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic random-geometry IO round trips: WKT -> model -> blob ->
  * model and model -> WKB -> model must preserve every vertex exactly
  * (unit vectors are stored losslessly; text goes through the shortest
  * round-trippable decimal form). */
class IoRoundTripSpec extends AnyFunSuite {
  private val rng = new scala.util.Random(424242L)

  private def randLon(): Double = rng.nextInt(7200) / 20.0 - 180.0
  private def randLat(): Double = rng.nextInt(3200) / 20.0 - 80.0

  private def randomWkt(): String = rng.nextInt(4) match {
    case 0 =>
      s"POINT (${randLon()} ${randLat()})"
    case 1 =>
      val n = rng.nextInt(5) + 2
      val pts = Seq.fill(n)(s"${randLon()} ${randLat()}").mkString(", ")
      s"LINESTRING ($pts)"
    case 2 =>
      // convex-ish small polygon around a random center (valid ring)
      val cLon = rng.nextInt(300) - 150
      val cLat = rng.nextInt(120) - 60
      val r = rng.nextInt(8) + 2
      val k = rng.nextInt(4) + 3
      val ring = (0 until k).map { i =>
        val ang = 2 * Math.PI * i / k
        s"${cLon + r * Math.cos(ang)} ${cLat + r * Math.sin(ang)}"
      }
      s"POLYGON ((${(ring :+ ring.head).mkString(", ")}))"
    case _ =>
      val n = rng.nextInt(4) + 1
      val pts = Seq.fill(n)(s"(${randLon()} ${randLat()})").mkString(", ")
      s"MULTIPOINT ($pts)"
  }

  private def vertices(g: Geography): Vector[S2Point] = {
    val b = Vector.newBuilder[S2Point]
    g.foreachVertex(p => b += p)
    b.result()
  }

  private def assertClose(a: Vector[S2Point], b: Vector[S2Point]): Unit = {
    assert(a.size === b.size)
    a.zip(b).foreach { case (p, q) =>
      assert(p.angle(q) < 1e-14, s"$p vs $q") // trig round trip: ~1 ulp
    }
  }

  test("60 random geometries round-trip blob exactly, WKB/WKT to the ulp") {
    for (i <- 1 to 60) {
      val wkt = randomWkt()
      val g = Wkt.read(wkt)
      withClue(s"case $i: $wkt") {
        // blob codec round trip: BIT-EXACT vertices and kind (raw doubles)
        val blob = GeoCodec.encode(g)
        val back = GeoCodec.decode(blob)
        assert(vertices(back) === vertices(g))
        assert(back.dimension === g.dimension)
        assert(back.numPoints === g.numPoints)
        // WKB / WKT are lat-lng formats: xyz round-trips through trig to
        // within a last-place ulp (the reference compares printed text for
        // the same reason)
        val back2 = Wkb.read(Wkb.write(g), validate = false)
        assertClose(vertices(back2), vertices(g))
        val back3 = Wkt.read(Wkt.write(g))
        assertClose(vertices(back3), vertices(g))
        // prepared round trip preserves the geometry bit-exactly too
        val prepared = GeoCodec.prepare(blob)
        assert(vertices(GeoCodec.decode(prepared)) === vertices(g))
      }
    }
  }
}
