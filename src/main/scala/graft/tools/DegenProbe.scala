package graft.tools

import org.apache.spark.sql.SparkSession
import graft.spark.{S2Functions, S2Data}

/** Scratch probe for degenerate overlay inputs (T-junctions, collinear
  * extra vertices, point/line-on-boundary): prints the engine's current
  * outputs so goldens can be designed against verified behavior. */
object DegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    S2Functions.register(spark); S2Data.register(spark)
    val cases = Seq(
      // T-junction: B attaches to the middle of A's right (meridian) edge
      ("t_union", "s2_format(s2_union(s2_geogfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'), s2_geogfromtext('POLYGON ((10 2, 18 2, 18 8, 10 8, 10 2))')), 6)"),
      ("t_inter", "s2_format(s2_intersection(s2_geogfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'), s2_geogfromtext('POLYGON ((10 2, 18 2, 18 8, 10 8, 10 2))')), 6)"),
      ("t_diff", "s2_format(s2_difference(s2_geogfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'), s2_geogfromtext('POLYGON ((10 2, 18 2, 18 8, 10 8, 10 2))')), 6)"),
      // collinear redundant vertex on a meridian edge: same region as A
      ("collin_union", "s2_format(s2_union(s2_geogfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'), s2_geogfromtext('POLYGON ((0 0, 10 0, 10 5, 10 10, 0 10, 0 0))')), 6)"),
      ("collin_inter", "s2_format(s2_intersection(s2_geogfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'), s2_geogfromtext('POLYGON ((0 0, 10 0, 10 5, 10 10, 0 10, 0 0))')), 6)"),
      ("collin_diff", "s2_format(s2_difference(s2_geogfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'), s2_geogfromtext('POLYGON ((0 0, 10 0, 10 5, 10 10, 0 10, 0 0))')), 6)"),
      // corner-touching squares
      ("corner_union", "s2_format(s2_union(s2_geogfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'), s2_geogfromtext('POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))')), 6)"),
      // point exactly on the meridian edge interior / at a vertex
      ("pt_on_edge_int", "s2_format(s2_intersection(s2_geogfromtext('POINT (10 5)'), s2_geogfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))')), 6)"),
      ("pt_on_edge_int_r", "s2_format(s2_intersection(s2_geogfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'), s2_geogfromtext('POINT (10 5)')), 6)"),
      ("pt_on_vertex_diff", "s2_format(s2_difference(s2_geogfromtext('POINT (10 10)'), s2_geogfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))')), 6)"),
      ("pt_on_edge_union", "s2_format(s2_union(s2_geogfromtext('POINT (10 5)'), s2_geogfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))')), 6)"),
      // line lying exactly on the meridian boundary edge
      ("line_on_edge_int", "s2_format(s2_intersection(s2_geogfromtext('LINESTRING (10 2, 10 8)'), s2_geogfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))')), 6)"),
      ("line_on_edge_diff", "s2_format(s2_difference(s2_geogfromtext('LINESTRING (10 2, 10 8)'), s2_geogfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))')), 6)"),
      // line crossing the boundary with a vertex exactly on it
      ("line_thru_vertex_int", "s2_format(s2_intersection(s2_geogfromtext('LINESTRING (5 5, 10 5, 15 5)'), s2_geogfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))')), 6)"),
      ("line_thru_vertex_diff", "s2_format(s2_difference(s2_geogfromtext('LINESTRING (5 5, 10 5, 15 5)'), s2_geogfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))')), 6)"),
      // double-digitized T: B re-digitizes part of A's edge with drift
      ("tdrift_union", "s2_format(s2_union(s2_geogfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'), s2_geogfromtext('POLYGON ((10.0000000000001 2, 18 2, 18 8, 9.9999999999999 8, 10.0000000000001 2))')), 6)"),
      ("tdrift_area", "CAST(abs(s2_area(s2_union(s2_geogfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'), s2_geogfromtext('POLYGON ((10.0000000000001 2, 18 2, 18 8, 9.9999999999999 8, 10.0000000000001 2))'))) - (s2_area(s2_geogfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))')) + s2_area(s2_geogfromtext('POLYGON ((10.0000000000001 2, 18 2, 18 8, 9.9999999999999 8, 10.0000000000001 2))')) - s2_area(s2_intersection(s2_geogfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'), s2_geogfromtext('POLYGON ((10.0000000000001 2, 18 2, 18 8, 9.9999999999999 8, 10.0000000000001 2))'))))) AS STRING)")
    )
    for ((name, expr) <- cases) {
      val out = try spark.sql(s"SELECT $expr AS v").collect()(0).getString(0)
                catch { case e: Throwable => s"ERROR: ${e.getMessage}" }
      println(s"[degen] $name = $out")
    }
    spark.stop()
  }
}
