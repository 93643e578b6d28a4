package graft.tools

import graft.core._
import graft.spark.S2Functions

/** Dev-only sanity harness (kernel-level, no SparkSession). */
object Scratch {
  def main(args: Array[String]): Unit = {
    def fmt6(g: Geography) = Wkt.write(g, 6)

    // cell -> polygon vertex order golden (cell_ops.test:65-68, 160-163)
    val c20 = S2CellId.fromDebugString("2/0")
    println("2/0 poly: " + fmt6(GeoCodec.decode(S2Functions.cellToGeog(c20))))
    println("want    : POLYGON ((45 35.26439, 90 45, 0 90, 0 45, 45 35.26439))")
    val c7 = S2CellId.fromDebugString("2/1122303")
    println("2/1122303: " + fmt6(GeoCodec.decode(S2Functions.cellToGeog(c7))))
    println("want     : POLYGON ((-63.470273 44.898834, -64.286611 45.098989, -64.779066 44.581998, -63.973842 44.388923, -63.470273 44.898834))")

    // accessors goldens
    val tri = Wkt.read("POLYGON ((0 0, 0 1, 1 0, 0 0))")
    println("area: " + Math.round(S2Measure.areaMeters2(tri)) + " want 6182489131")
    println("perim: " + Math.round(S2Measure.perimeterMeters(tri)) + " want 379640")
    println("len: " + Math.round(S2Measure.lengthMeters(Wkt.read("LINESTRING (0 1, 2 3)"))) + " want 314403")

    // cellfromlonlat debug golden
    val cv = S2CellId.fromLonLatDegrees(-64, 45)
    println("cell: " + S2CellId.toDebugString(cv) + " want 2/112230310012123001312232330210")
    println("token: " + S2CellId.toToken(cv) + " want 4b59a0cd83b5de49")

    // bounds fixture (reference fp parity check)
    val mp = Wkt.read("MULTIPOINT (0 1, 2 3)")
    var xs = List.empty[Double]; var ys = List.empty[Double]
    mp.foreachVertex { p => xs = p.lngDegrees :: xs; ys = p.latDegrees :: ys }
    println(s"mp bounds: ${xs.min} ${ys.min} ${xs.max} ${ys.max} want 0.0 1.0 1.9999999999999996 3.0000000000000004")

    // cities agg bounds goldens
    def res(p: String) = {
      val in = getClass.getResourceAsStream(p)
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try src.getLines().drop(1).map(_.split('\t')).toList finally src.close()
    }
    val cityPts = res("/graft/cities.tsv").map(a => Wkt.read(a(2)))
    // simple min/max (no antimeridian) for orientation
    var lo = Double.MaxValue; var hi = -Double.MaxValue
    cityPts.foreach(_.foreachVertex(p => { lo = Math.min(lo, p.latDegrees); hi = Math.max(hi, p.latDegrees) }))
    println(s"cities lat range: $lo $hi want -41.29998789999999 .. 64.1500236")

    // novalidate roundtrip
    println("noval: " + fmt6(Wkt.read("LINESTRING (0 0, 0 0, 1 1)", validate = false)))

    // dwithin empty semantics
    val e = new GeoShapes(Geography.emptyPoint)
    val tor = new GeoShapes(Wkt.read("POINT (-79.4219667 43.7019257)"))
    println("dwithin empty inf: " + Relate.dwithin(e, tor, Double.PositiveInfinity) + " want false")
  }
}
object CoverScratch {
  def main(args: Array[String]): Unit = {
    def res(p: String) = {
      val in = getClass.getResourceAsStream(p)
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try src.getLines().drop(1).map(_.split('\t')).toList finally src.close()
    }
    val fiji = graft.core.Wkt.read(res("/graft/countries.tsv").find(_(0) == "Fiji").get(2))
    val cov = graft.core.RegionCoverer.cover(fiji)
    println("fiji cover: " + cov.map(graft.core.S2CellId.toDebugString).mkString(", "))
    println("want      : 3/13002011, 3/1300232, 3/130030, 3/130031, 3/130033, 3/130100, 3/2032333, 3/20330000000")
    val f5 = graft.core.RegionCoverer.coverFixedLevel(fiji, 5)
    println("fiji lvl5 : " + f5.map(graft.core.S2CellId.toDebugString).mkString(", "))
    println("want      : 3/13002, 3/13003, 3/13010, 3/20323, 3/20330")
    val cc = graft.core.S2CellId.fromLonLatDegrees(-64, 45)
    println("cc cover  : " + graft.core.RegionCoverer.cover(graft.core.Geography.CellCenter(cc)).map(graft.core.S2CellId.toDebugString).mkString(", "))
    println("cc lvl5   : " + graft.core.RegionCoverer.coverFixedLevel(graft.core.Geography.CellCenter(cc), 5).map(graft.core.S2CellId.toDebugString).mkString(", "))
  }
}
