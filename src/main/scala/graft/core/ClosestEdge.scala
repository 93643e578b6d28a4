package graft.core

import scala.collection.mutable

/**
 * Best-first closest/furthest-edge search over cell-bucketed bounding caps —
 * the kernel analogue of S2ClosestEdgeQuery / S2FurthestEdgeQuery (reference
 * behavior: src/s2_binary_index_ops.cpp:546-649; semantics, not code).
 *
 * The indexed side's points and edges are grouped into buckets by S2 cell at
 * an edge-count-derived level; each bucket carries a bounding cap (center +
 * exact max angular radius over member arcs). A query element visits buckets
 * in increasing lower-bound order and prunes against the best distance found
 * so far, so only a handful of exact edge-edge distances are evaluated
 * instead of the full O(E_a * E_b) cross product.
 */
final class DistIndex private (
    val itemS: Array[S2Point],
    val itemE: Array[S2Point],
    val capCenter: Array[S2Point],
    val capRadius: Array[Double],
    val members: Array[Array[Int]]) extends Serializable {
  def numItems: Int = itemS.length
  def numBuckets: Int = capCenter.length
}

object DistIndex {
  def build(shapes: GeoShapes): DistIndex = {
    val ss = mutable.ArrayBuffer[S2Point]()
    val es = mutable.ArrayBuffer[S2Point]()
    // points ride along as degenerate edges so one structure serves all
    var i = 0
    while (i < shapes.points.size) { ss += shapes.points(i); es += shapes.points(i); i += 1 }
    shapes.foreachEdge { (p, q) => ss += p; es += q; true }
    val n = ss.size
    val level = Math.min(12, Math.max(4, (32 - Integer.numberOfLeadingZeros(Math.max(1, n))) / 2 + 2))
    val buckets = new java.util.LinkedHashMap[Long, mutable.ArrayBuffer[Int]]()
    def add(cell: Long, idx: Int): Unit = {
      var b = buckets.get(cell)
      if (b == null) { b = mutable.ArrayBuffer[Int](); buckets.put(cell, b) }
      b += idx
    }
    i = 0
    while (i < n) {
      val s = ss(i); val e = es(i)
      if (s == e) {
        add(S2CellId.parent(S2CellId.fromPoint(s.x, s.y, s.z), level), i)
      } else {
        EdgeIndex.foreachEdgeCell(s, e, level) { cell => add(cell, i) }
      }
      i += 1
    }
    val nb = buckets.size
    val centers = new Array[S2Point](nb)
    val radii = new Array[Double](nb)
    val mems = new Array[Array[Int]](nb)
    val it = buckets.values.iterator
    var bi = 0
    while (it.hasNext) {
      val m = it.next()
      var acc = S2Point(0, 0, 0)
      var k = 0
      while (k < m.size) { acc = acc + ss(m(k)) + es(m(k)); k += 1 }
      var c = acc.normalize
      if (c.norm2 < 0.5) c = ss(m(0)) // degenerate sum: fall back to a member point
      var r = 0.0
      k = 0
      while (k < m.size) {
        val s = ss(m(k)); val e = es(m(k))
        // exact max angle from center to the full arc, not just endpoints
        val d = if (s == e) S2EdgeDist.pointAngle(c, s) else S2EdgeDist.pointEdgeMaxAngle(c, s, e)
        if (d > r) r = d
        k += 1
      }
      centers(bi) = c; radii(bi) = r; mems(bi) = m.toArray
      bi += 1
    }
    new DistIndex(ss.toArray, es.toArray, centers, radii, mems)
  }
}

object ClosestEdge {
  /** Below this many indexed items the bucket machinery costs more than the
    * brute-force scan it avoids. */
  final val MinItems = 48

  /** Exact distance between a query arc (p,q) (degenerate allowed) and an
    * indexed item (s,e) (degenerate allowed). */
  @inline private def itemAngle(p: S2Point, q: S2Point, s: S2Point, e: S2Point): Double =
    if (s == e) { if (p == q) S2EdgeDist.pointAngle(p, s) else S2EdgeDist.pointEdgeAngle(s, p, q) }
    else if (p == q) S2EdgeDist.pointEdgeAngle(p, s, e)
    else S2EdgeDist.edgeEdgeAngle(p, q, s, e)

  @inline private def itemMaxAngle(p: S2Point, q: S2Point, s: S2Point, e: S2Point): Double =
    if (s == e) { if (p == q) S2EdgeDist.pointAngle(p, s) else S2EdgeDist.pointEdgeMaxAngle(s, p, q) }
    else if (p == q) S2EdgeDist.pointEdgeMaxAngle(p, s, e)
    else S2EdgeDist.edgeEdgeMaxAngle(p, q, s, e)

  /** Min angle between shapes, best-first. `stopBelow` enables early exit:
    * once the running best drops to or below it the search returns
    * immediately (used by dwithin — any value <= threshold decides true).
    * Pass -1 for the exact minimum. Does NOT include the intersects()
    * zero-distance shortcut — callers do that first. */
  def minAngle(a: GeoShapes, b: GeoShapes, stopBelow: Double = -1.0): Double = {
    val (query, indexed) = orient(a, b)
    if (indexed.points.size + indexed.numEdges < MinItems)
      return bruteMin(query, indexed, stopBelow)
    val idx = indexed.distIndex
    val nb = idx.numBuckets
    val lbs = new Array[Double](nb)
    val order = new Array[Integer](nb)
    val visited = new java.util.BitSet(idx.numItems)
    var best = Double.PositiveInfinity
    var done = false
    foreachElement(query) { (p, q) =>
      if (!done) {
        // prune against the running best BEFORE sorting: once an earlier
        // query element has tightened `best`, most buckets drop out here
        // and the per-element sort shrinks to a handful of candidates
        // (ADVICE r3: the full per-element sort approached brute-force
        // cost for large query sides)
        var cands = 0
        var bi = 0
        while (bi < nb) {
          val cd =
            if (p == q) S2EdgeDist.pointAngle(p, idx.capCenter(bi))
            else S2EdgeDist.pointEdgeAngle(idx.capCenter(bi), p, q)
          val lb = Math.max(0.0, cd - idx.capRadius(bi))
          lbs(bi) = lb
          if (lb < best) { order(cands) = bi; cands += 1 }
          bi += 1
        }
        java.util.Arrays.sort(order, 0, cands,
          (x: Integer, y: Integer) => java.lang.Double.compare(lbs(x), lbs(y)))
        visited.clear()
        var oi = 0
        var stop = false
        while (oi < cands && !stop) {
          val b = order(oi)
          if (lbs(b) >= best) stop = true
          else {
            val m = idx.members(b)
            var k = 0
            while (k < m.length) {
              val item = m(k)
              if (!visited.get(item)) {
                visited.set(item)
                val d = itemAngle(p, q, idx.itemS(item), idx.itemE(item))
                if (d < best) {
                  best = d
                  if (best <= stopBelow) { stop = true; done = true }
                }
              }
              k += 1
            }
          }
          oi += 1
        }
      }
    }
    best
  }

  /** Max angle between shapes, best-first with cap upper bounds. */
  def maxAngle(a: GeoShapes, b: GeoShapes): Double = {
    val (query, indexed) = orient(a, b)
    if (indexed.points.size + indexed.numEdges < MinItems)
      return bruteMax(query, indexed)
    val idx = indexed.distIndex
    val nb = idx.numBuckets
    val ubs = new Array[Double](nb)
    val order = new Array[Integer](nb)
    val visited = new java.util.BitSet(idx.numItems)
    var best = 0.0
    foreachElement(query) { (p, q) =>
      // candidates pruned against the running best before the sort (see
      // minAngle — same ADVICE r3 fix, mirrored for the upper bound)
      var cands = 0
      var bi = 0
      while (bi < nb) {
        // triangle inequality: angle(x, y) <= maxAngle(x, center) + radius
        val cd =
          if (p == q) S2EdgeDist.pointAngle(p, idx.capCenter(bi))
          else S2EdgeDist.pointEdgeMaxAngle(idx.capCenter(bi), p, q)
        val ub = cd + idx.capRadius(bi)
        ubs(bi) = ub
        if (ub > best) { order(cands) = bi; cands += 1 }
        bi += 1
      }
      java.util.Arrays.sort(order, 0, cands,
        (x: Integer, y: Integer) => java.lang.Double.compare(ubs(y), ubs(x)))
      visited.clear()
      var oi = 0
      var stop = false
      while (oi < cands && !stop) {
        val b = order(oi)
        if (ubs(b) <= best) stop = true
        else {
          val m = idx.members(b)
          var k = 0
          while (k < m.length) {
            val item = m(k)
            if (!visited.get(item)) {
              visited.set(item)
              val d = itemMaxAngle(p, q, idx.itemS(item), idx.itemE(item))
              if (d > best) best = d
            }
            k += 1
          }
        }
        oi += 1
      }
    }
    best
  }

  /** Put the side with more items on the indexed (right) slot. */
  private def orient(a: GeoShapes, b: GeoShapes): (GeoShapes, GeoShapes) = {
    val na = a.points.size + a.numEdges
    val nb = b.points.size + b.numEdges
    if (na <= nb) (a, b) else (b, a)
  }

  /** Visit every query element: points as degenerate (p,p), then edges. */
  private def foreachElement(g: GeoShapes)(f: (S2Point, S2Point) => Unit): Unit = {
    var i = 0
    while (i < g.points.size) { f(g.points(i), g.points(i)); i += 1 }
    g.foreachEdge { (p, q) => f(p, q); true }
  }

  private def bruteMin(query: GeoShapes, indexed: GeoShapes, stopBelow: Double): Double = {
    var best = Double.PositiveInfinity
    var done = false
    foreachElement(query) { (p, q) =>
      if (!done) foreachElement(indexed) { (s, e) =>
        if (!done) {
          val d = itemAngle(p, q, s, e)
          if (d < best) {
            best = d
            if (best <= stopBelow) done = true
          }
        }
      }
    }
    best
  }

  private def bruteMax(query: GeoShapes, indexed: GeoShapes): Double = {
    var best = 0.0
    foreachElement(query) { (p, q) =>
      foreachElement(indexed) { (s, e) =>
        val d = itemMaxAngle(p, q, s, e)
        if (d > best) best = d
      }
    }
    best
  }
}
