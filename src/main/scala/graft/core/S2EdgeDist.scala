package graft.core

/**
 * Distances on the unit sphere: point-edge, edge-edge, min and max —
 * the kernel for s2_distance / s2_max_distance / s2_dwithin
 * (SURVEY.md §2.3; reference: src/s2_binary_index_ops.cpp:464-649).
 *
 * Angles are computed in chord-angle form (2*asin(|a-b|/2)) matching the
 * S1ChordAngle pipeline the reference's S2 queries use.
 */
object S2EdgeDist {
  /** Mean Earth radius used by s2geography (S2Earth), meters. */
  val EarthRadiusMeters: Double = 6371010.0

  @inline def pointAngle(a: S2Point, b: S2Point): Double = {
    val dx = a.x - b.x; val dy = a.y - b.y; val dz = a.z - b.z
    val chord = Math.sqrt(dx * dx + dy * dy + dz * dz)
    2.0 * Math.asin(Math.min(1.0, 0.5 * chord))
  }

  /** Min angle from point x to the arc (a, b). */
  def pointEdgeAngle(x: S2Point, a: S2Point, b: S2Point): Double = {
    if (a == b) return pointAngle(x, a)
    val ab = a.cross(b)
    // closest point is in the edge interior iff x is inside the lune
    if (x.dot(ab.cross(a)) > 0 && x.dot(b.cross(ab)) > 0) {
      val sinD = Math.abs(x.dot(ab)) / ab.norm
      Math.asin(Math.min(1.0, sinD))
    } else {
      Math.min(pointAngle(x, a), pointAngle(x, b))
    }
  }

  /** Max angle from point x to the arc (a, b): pi - minAngle(-x, arc). */
  def pointEdgeMaxAngle(x: S2Point, a: S2Point, b: S2Point): Double =
    Math.PI - pointEdgeAngle(-x, a, b)

  /** Min angle between arcs (a,b) and (c,d); 0 if they cross. */
  def edgeEdgeAngle(a: S2Point, b: S2Point, c: S2Point, d: S2Point): Double = {
    if (S2Pred.crossingSign(a, b, c, d) >= 0) {
      // crossing or touching
      if (S2Pred.crossingSign(a, b, c, d) > 0) return 0.0
    }
    var m = pointEdgeAngle(c, a, b)
    m = Math.min(m, pointEdgeAngle(d, a, b))
    m = Math.min(m, pointEdgeAngle(a, c, d))
    m = Math.min(m, pointEdgeAngle(b, c, d))
    m
  }

  /** Max angle between arcs (max over point pairs).
    * If (a,b) crosses the reflection (-c,-d), the true max is pi — endpoint
    * pairs alone miss that antipodal interior crossing (matches
    * S2FurthestEdgeQuery; see ADVICE.md round 1). */
  def edgeEdgeMaxAngle(a: S2Point, b: S2Point, c: S2Point, d: S2Point): Double = {
    if (S2Pred.crossingSign(a, b, -c, -d) >= 0) return Math.PI
    var m = pointEdgeMaxAngle(c, a, b)
    m = Math.max(m, pointEdgeMaxAngle(d, a, b))
    m = Math.max(m, pointEdgeMaxAngle(a, c, d))
    m = Math.max(m, pointEdgeMaxAngle(b, c, d))
    m
  }
}
