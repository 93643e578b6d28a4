package graft.core

import Geography._

/**
 * Accessor measures (SURVEY.md §2.2; reference: src/s2_accessors.cpp):
 * area (m^2), perimeter (m), length (m), x/y, dimension, num_points.
 */
object S2Measure {
  import S2EdgeDist.EarthRadiusMeters

  /** Spherical area in m^2; 0 for dimension < 2 pieces
    * (reference: s2_accessors.cpp:195-204). */
  def areaMeters2(g: Geography): Double = g match {
    case p: Polygons =>
      p.ringGroups.map { rings =>
        val nonEmpty = rings.filter(_.size >= 3)
        if (nonEmpty.isEmpty) 0.0
        else {
          val shell = new S2Loop(nonEmpty.head.toArray).area
          val holes = nonEmpty.tail.map(r => new S2Loop(r.toArray).area).sum
          Math.max(0.0, shell - holes)
        }
      }.sum * EarthRadiusMeters * EarthRadiusMeters
    case Collection(items) => items.map(areaMeters2).sum
    case _ => 0.0
  }

  /** Sum of polygon ring lengths in meters; 0 for other kinds
    * (reference: s2_accessors.cpp:255-263). */
  def perimeterMeters(g: Geography): Double = g match {
    case p: Polygons =>
      p.allRings.map(r => chainAngle(r :+ r.head)).sum * EarthRadiusMeters
    case Collection(items) => items.map(perimeterMeters).sum
    case _ => 0.0
  }

  /** Polyline length in meters; 0 for points/polygons
    * (reference: s2_accessors.cpp:311-319). */
  def lengthMeters(g: Geography): Double = g match {
    case Polylines(lines) => lines.map(chainAngle).sum * EarthRadiusMeters
    case Collection(items) => items.map(lengthMeters).sum
    case _ => 0.0
  }

  private def chainAngle(pts: Vector[S2Point]): Double = {
    var sum = 0.0
    var i = 0
    while (i + 1 < pts.size) {
      sum += S2EdgeDist.pointAngle(pts(i), pts(i + 1))
      i += 1
    }
    sum
  }

  /** Longitude of a single-point geography, else NaN
    * (reference: s2_accessors.cpp:325-346). */
  def x(g: Geography): Double = singlePoint(g) match {
    case Some(p) => p.lngDegrees
    case None => Double.NaN
  }

  /** Latitude of a single-point geography, else NaN. */
  def y(g: Geography): Double = singlePoint(g) match {
    case Some(p) => p.latDegrees
    case None => Double.NaN
  }

  def singlePoint(g: Geography): Option[S2Point] = g match {
    case Points(ps) if ps.size == 1 => Some(ps.head)
    case c: CellCenter if !c.isEmpty => Some(c.point)
    case Collection(items) =>
      val nonEmpty = items.filter(!_.isEmpty)
      if (nonEmpty.size == 1) singlePoint(nonEmpty.head) else None
    case _ => None
  }
}
