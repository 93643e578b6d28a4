package graft.core

import scala.collection.mutable

/**
 * S2RegionCoverer-semantics covering (reference: s2_bounds.cpp:19-144 uses
 * S2RegionCoverer with default max_cells = 8; algorithm re-derived from the
 * public S2 docs: cap-seeded candidates refined through a priority queue
 * that always expands the coarsest / most-refinable candidate first).
 *
 * The per-cell region tests are exact (Covering.mayIntersect and
 * cellContained below), so coverings are deterministic.
 */
object RegionCoverer {
  final val DefaultMaxCells = 8
  final val MaxLevel = 30

  private final class Candidate(val cellId: Long, var isTerminal: Boolean) {
    var children: List[Candidate] = Nil
    var numTerminals: Int = 0
  }

  /** True if the region fully contains the cell (terminal test). */
  private def cellContained(cellId: Long, shapes: GeoShapes): Boolean = {
    if (!shapes.hasPolygons) return false
    val cellPoly = new GeoShapes(
      Geography.Polygons(Vector(Vector(S2CellId.vertices(cellId).toVector))))
    Relate.contains(shapes, cellPoly)
  }

  /** Bounding cap of the region: center + max chord radius over vertices
    * (the S2LatLngRect::GetCapBound "mid cap" flavor — adequate for
    * seeding; the expansion loop corrects any slack). */
  private def capOf(shapes: GeoShapes): (S2Point, Double) = {
    var sx = 0.0; var sy = 0.0; var sz = 0.0; var n = 0
    shapes.g.foreachVertex { p => sx += p.x; sy += p.y; sz += p.z; n += 1 }
    if (n == 0) return (S2Point(1, 0, 0), 0.0)
    val c0 = S2Point(sx, sy, sz)
    val center = if (c0.norm2 < 1e-30) S2Point(1, 0, 0) else c0.normalize
    var maxAngle = 0.0
    shapes.g.foreachVertex { p => maxAngle = Math.max(maxAngle, center.angle(p)) }
    (center, maxAngle)
  }

  /** Level whose min cell width is at least `radians`
    * (S2 kMinWidth metric, quadratic projection: deriv = 2*sqrt(2)/3). */
  private def minWidthLevel(radians: Double): Int = {
    val deriv = 2 * Math.sqrt(2.0) / 3
    if (radians <= 0) return MaxLevel
    val lvl = Math.floor(Math.log(deriv / radians) / Math.log(2.0)).toInt
    Math.max(0, Math.min(MaxLevel, lvl))
  }

  /** The cells at `level` sharing the closest vertex of `leaf`'s level-cell
    * (public S2CellId::AppendVertexNeighbors semantics). */
  private def vertexNeighbors(leaf: Long, level: Int): Array[Long] = {
    val (face, i, j, _) = S2CellId.toFaceIJOrientation(leaf)
    val halfSize = S2CellId.ijSize(level + 1)
    val size = halfSize << 1
    val maxSize = S2CellId.ijSize(0)
    var ioffset = 0; var joffset = 0
    var isame = false; var jsame = false
    if ((i & halfSize) != 0) { ioffset = size; isame = i + size < maxSize }
    else { ioffset = -size; isame = i - size >= 0 }
    if ((j & halfSize) != 0) { joffset = size; jsame = j + size < maxSize }
    else { joffset = -size; jsame = j - size >= 0 }
    val out = mutable.ArrayBuffer[Long]()
    out += S2CellId.parent(leaf, level)
    out += S2CellId.parent(S2CellId.fromFaceIJSame(face, i + ioffset, j, isame), level)
    out += S2CellId.parent(S2CellId.fromFaceIJSame(face, i, j + joffset, jsame), level)
    if (isame || jsame)
      out += S2CellId.parent(
        S2CellId.fromFaceIJSame(face, i + ioffset, j + joffset, isame && jsame), level)
    out.filter(S2CellId.isValid).toArray
  }

  /** Default covering: at most maxCells cells, any levels. */
  def cover(g: Geography, maxCells: Int = DefaultMaxCells): Array[Long] = {
    g match {
      case c: Geography.CellCenter =>
        return if (c.isEmpty) Array.empty else Array(c.cellId)
      case Geography.Points(ps) if ps.size == 1 =>
        val p = ps.head
        return Array(S2CellId.fromPoint(p.x, p.y, p.z))
      case _ => ()
    }
    val shapes = new GeoShapes(g)
    if (shapes.isEmpty) return Array.empty

    val result = mutable.ArrayBuffer[Long]()
    // priority: expand coarsest first; among equals, fewest children, then
    // fewest terminal children (public S2RegionCoverer heuristic)
    val pq = mutable.PriorityQueue.empty[(Long, Candidate)](
      Ordering.by[(Long, Candidate), Long](_._1).reverse)

    def newCandidate(cellId: Long): Candidate = {
      if (!Covering.mayIntersect(cellId, shapes)) return null
      val lvl = S2CellId.level(cellId)
      val terminal = lvl == MaxLevel || cellContained(cellId, shapes)
      new Candidate(cellId, terminal)
    }

    def addCandidate(c: Candidate): Unit = {
      if (c == null) return
      if (c.isTerminal) { result += c.cellId; return }
      // expand one level
      val lvl = S2CellId.level(c.cellId)
      var k = 0
      var kids: List[Candidate] = Nil
      var numTerm = 0
      while (k < 4) {
        val child = S2CellId.child(c.cellId, k)
        val cc = newCandidate(child)
        if (cc != null) {
          kids = cc :: kids
          if (cc.isTerminal) numTerm += 1
        }
        k += 1
      }
      if (kids.isEmpty) return
      if (numTerm == kids.size && kids.size == 4) {
        // all four children terminal -> emit the parent instead
        result += c.cellId
        return
      }
      c.children = kids.reverse
      c.numTerminals = numTerm
      val priority = ((lvl.toLong << 2) + c.children.size << 2) + numTerm
      pq.enqueue((priority, c))
    }

    // --- seeding: small covering of the bounding cap
    val (center, radius) = capOf(shapes)
    // clamp to MaxLevel - 1 (as C++ S2RegionCoverer does for the initial
    // candidates): at level 30 vertexNeighbors' ijSize(31) shift wraps
    // around and all four seeds collapse to the single center leaf
    val seedLevel = Math.min(minWidthLevel(2 * radius), MaxLevel - 1)
    val seeds: Array[Long] =
      if (seedLevel == 0) Array.tabulate(6)(Covering.faceCell)
      else vertexNeighbors(S2CellId.fromPoint(center.x, center.y, center.z), seedLevel)
    seeds.foreach(id => addCandidate(newCandidate(id)))

    while (pq.nonEmpty) {
      val (_, cand) = pq.dequeue()
      if (result.size + pq.size + cand.children.size <= maxCells) {
        cand.children.foreach(addCandidate)
      } else {
        // no room to expand: emit the cell itself
        result += cand.cellId
      }
    }
    Covering.normalize(result.toArray)
  }

  /** Fixed-level covering: every cell at `level` intersecting the region
    * (reference: s2_bounds.cpp:57-104; min_level = max_level = level). */
  def coverFixedLevel(g: Geography, level: Int): Array[Long] = {
    g match {
      case c: Geography.CellCenter =>
        return if (c.isEmpty) Array.empty else Array(S2CellId.parent(c.cellId, level))
      case Geography.Points(ps) if ps.size == 1 =>
        val p = ps.head
        return Array(S2CellId.parent(S2CellId.fromPoint(p.x, p.y, p.z), level))
      case _ => ()
    }
    val shapes = new GeoShapes(g)
    if (shapes.isEmpty) return Array.empty
    val out = mutable.ArrayBuffer[Long]()
    def recurse(cellId: Long): Unit = {
      if (!Covering.mayIntersect(cellId, shapes)) return
      if (S2CellId.level(cellId) == level) { out += cellId; return }
      var k = 0
      while (k < 4) { recurse(S2CellId.child(cellId, k)); k += 1 }
    }
    var f = 0
    while (f < 6) { recurse(Covering.faceCell(f)); f += 1 }
    val sorted = out.toArray.map(S2CellId.sortKey)
    java.util.Arrays.sort(sorted)
    sorted.map(k => k ^ Long.MinValue)
  }
}
