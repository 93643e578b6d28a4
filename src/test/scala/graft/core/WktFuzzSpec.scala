package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Parser robustness: every mutation of valid WKT (truncation, corruption,
  * garbage) must either parse or throw promptly — never hang, NPE, or
  * return corrupt geometry that breaks the codec. */
class WktFuzzSpec extends AnyFunSuite {

  private val seeds = Seq(
    "POINT (-64 45)",
    "LINESTRING (0 1, 2 3, 4 5)",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
    "MULTIPOINT ((-64 45), (-64 46))",
    "MULTIPOLYGON (((0 0, 1 0, 0 1, 0 0)), ((10 10, 11 10, 10 11, 10 10)))",
    "GEOMETRYCOLLECTION (POINT (0 1), LINESTRING (0 0, 1 1))",
    "POINT EMPTY",
    "GEOMETRYCOLLECTION EMPTY")

  private def tryParse(s: String): Unit = {
    val out =
      try Some(Wkt.read(s, validate = false))
      catch { case _: Exception => None } // any orderly exception is fine
    // if it parsed, the value must survive the codec round trip
    out.foreach { g =>
      val back = GeoCodec.decode(GeoCodec.encode(g))
      assert(back.numPoints === g.numPoints)
    }
  }

  test("truncations of valid WKT never hang or corrupt") {
    for (s <- seeds; n <- 0 until s.length) tryParse(s.take(n))
  }

  test("single-character corruptions never hang or corrupt") {
    val rng = new scala.util.Random(7L)
    val junk = "()0,.-XYZ \tEMPTYPOINT"
    for (s <- seeds; _ <- 1 to 40) {
      val i = rng.nextInt(s.length)
      tryParse(s.updated(i, junk(rng.nextInt(junk.length))))
    }
  }

  test("garbage inputs throw orderly errors") {
    for (s <- Seq("", "   ", "POINT", "POINT (", "POINT ()", "POINT (x y)",
        "LINESTRING (0)", "POLYGON (0 0)", "POLYGON ((0 0, 1 1))",
        "MULTIPOLYGON (((", "GEOMETRYCOLLECTION (POINT (0 1)",
        "POINT (1e309 0)", "POINT (NaN NaN)", "pOiNt(0 1)extra"))
      tryParse(s)
  }
}
