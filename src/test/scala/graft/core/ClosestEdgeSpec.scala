package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Best-first distance search (ClosestEdge/DistIndex) must agree with an
  * independent all-pairs brute force on real country polygons and synthetic
  * clouds — same primitives, so agreement is to fp noise only. */
class ClosestEdgeSpec extends AnyFunSuite {

  private def res(p: String) = {
    val in = getClass.getResourceAsStream(p)
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().drop(1).map(_.split('\t')).toList finally src.close()
  }
  private lazy val countries: Vector[(String, GeoShapes)] =
    res("/graft/countries.tsv").map(a => a(0) -> new GeoShapes(Wkt.read(a(2)))).toVector

  /** Independent all-pairs min/max (mirrors the pre-index kernel). */
  private def bruteMin(a: GeoShapes, b: GeoShapes): Double = {
    var best = Double.PositiveInfinity
    def elems(g: GeoShapes)(f: (S2Point, S2Point) => Unit): Unit = {
      g.points.foreach(p => f(p, p))
      g.foreachEdge { (p, q) => f(p, q); true }
    }
    elems(a) { (p, q) =>
      elems(b) { (s, e) =>
        val d =
          if (s == e && p == q) S2EdgeDist.pointAngle(p, s)
          else if (s == e) S2EdgeDist.pointEdgeAngle(s, p, q)
          else if (p == q) S2EdgeDist.pointEdgeAngle(p, s, e)
          else S2EdgeDist.edgeEdgeAngle(p, q, s, e)
        if (d < best) best = d
      }
    }
    best
  }
  private def bruteMax(a: GeoShapes, b: GeoShapes): Double = {
    var best = 0.0
    def elems(g: GeoShapes)(f: (S2Point, S2Point) => Unit): Unit = {
      g.points.foreach(p => f(p, p))
      g.foreachEdge { (p, q) => f(p, q); true }
    }
    elems(a) { (p, q) =>
      elems(b) { (s, e) =>
        val d =
          if (s == e && p == q) S2EdgeDist.pointAngle(p, s)
          else if (s == e) S2EdgeDist.pointEdgeMaxAngle(s, p, q)
          else if (p == q) S2EdgeDist.pointEdgeMaxAngle(p, s, e)
          else S2EdgeDist.edgeEdgeMaxAngle(p, q, s, e)
        if (d > best) best = d
      }
    }
    best
  }

  private def close(x: Double, y: Double): Boolean =
    (x == y) || Math.abs(x - y) <= 1e-9 * Math.max(1.0, Math.max(Math.abs(x), Math.abs(y)))

  test("country pairs: best-first min == brute force") {
    val rnd = new scala.util.Random(42)
    val n = countries.size
    (0 until 150).foreach { _ =>
      val (na, a) = countries(rnd.nextInt(n))
      val (nb, b) = countries(rnd.nextInt(n))
      val exact = bruteMin(a, b)
      val fast = ClosestEdge.minAngle(a, b)
      assert(close(fast, exact), s"min mismatch $na x $nb: $fast vs $exact")
    }
  }

  test("country pairs: best-first max == brute force") {
    val rnd = new scala.util.Random(7)
    val n = countries.size
    (0 until 40).foreach { _ =>
      val (na, a) = countries(rnd.nextInt(n))
      val (nb, b) = countries(rnd.nextInt(n))
      val exact = bruteMax(a, b)
      val fast = ClosestEdge.maxAngle(a, b)
      assert(close(fast, exact), s"max mismatch $na x $nb: $fast vs $exact")
    }
  }

  test("point clouds vs polygons and lines") {
    val rnd = new scala.util.Random(11)
    val pts = (0 until 300).map { _ =>
      s"${-120 + rnd.nextDouble() * 100} ${-50 + rnd.nextDouble() * 100}"
    }.mkString(", ")
    val cloud = new GeoShapes(Wkt.read(s"MULTIPOINT ($pts)"))
    val line = new GeoShapes(Wkt.read(
      (0 until 80).map(i => s"${-180 + i * 4} ${Math.sin(i * 0.3) * 60}")
        .mkString("LINESTRING (", ", ", ")")))
    for ((a, b) <- Seq((cloud, line), (cloud, countries(24)._2), (line, countries(24)._2))) {
      assert(close(ClosestEdge.minAngle(a, b), bruteMin(a, b)))
      assert(close(ClosestEdge.maxAngle(a, b), bruteMax(a, b)))
    }
  }

  test("dwithin early exit agrees with exact distance") {
    val rnd = new scala.util.Random(99)
    val n = countries.size
    (0 until 60).foreach { _ =>
      val (_, a) = countries(rnd.nextInt(n))
      val (_, b) = countries(rnd.nextInt(n))
      val dM = Relate.distanceMeters(a, b)
      for (thr <- Seq(dM * 0.5, dM * 2.0, 500e3, 5000e3)) {
        assert(Relate.dwithin(a, b, thr) === (dM <= thr))
      }
    }
  }
}
