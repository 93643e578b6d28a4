package graft.core

import scala.collection.mutable

/**
 * Planar-graph polygon overlay — the robust core behind s2_intersection /
 * s2_difference / s2_union on polygon inputs (reference semantics:
 * src/s2_binary_index_ops.cpp:157-448, whose S2BooleanOperation gets its
 * degenerate-input robustness from S2Builder snap rounding).
 *
 * The Weiler-Atherton ring-pair traversal in [[PolyClip]] is exact for
 * cleanly crossing / disjoint boundaries but corrupts pieces when a
 * vertex lands ulp-NEAR the other ring's edge (the crossing-node pairing
 * sees an odd count). This engine removes that failure class the way
 * S2BooleanOperation does — make near-incidences EXACT, then operate on
 * a planar subdivision where edges meet only at shared endpoints:
 *
 *   1. SNAP-ALIGN (~[[SnapTol]] = 1e-12 rad ≈ 6 µm): merge cross-input
 *      vertex pairs within tolerance to one canonical point, and reroute
 *      every edge through canonical vertices lying within tolerance of
 *      it. Clean inputs are untouched (nothing is within tolerance), so
 *      exact results and pinned goldens do not move.
 *   2. SUBDIVIDE: split every edge at its proper crossings with the
 *      other input's edges (crossing points computed once per pair and
 *      themselves snapped to nearby canonical vertices). Near-collinear
 *      edge pairs are shared arcs, not crossings — after step 1 both
 *      sides subdivide a shared arc at the SAME canonical vertex chain,
 *      so shared sub-edges match EXACTLY, no tolerance needed.
 *   3. CLASSIFY each directed region-left sub-edge: exact shared-arc
 *      match against the other side (same or opposite direction), else
 *      parity containment of its midpoint in the other (snapped) region.
 *   4. SELECT boundary edges per op (∩ / ∪ / \) and STITCH them into
 *      rings, preferring ring closure, then continuation on the same
 *      source ring (keeps corner-touching rings separate), then any
 *      unused successor.
 *
 * All three ops are selected from ONE subdivision, which makes the
 * self-check nearly free: |A∩B|+|A\B| must equal |A|, |A∩B|+|B\A| = |B|,
 * and |A∪B| = |A|+|B|-|A∩B|. Any violation (or a stitching failure)
 * returns None and the caller falls back to the legacy exact clipper —
 * robustness never regresses below the r5-r7 behavior.
 */
object PolyOverlay {
  import PolyClip.{Group, Ring}

  /** Base snap-alignment tolerance in radians (~6 µm on Earth): generous
    * for ulp-scale degeneracy, far below any real-data feature size. */
  private val SnapTol = 1e-12

  /** Ceiling for the ADAPTIVE snap radius (~2.5 mm on Earth) and the
    * band below which a cross-input distance counts as degenerate. A
    * fixed radius has a cliff: a vertex 1.4x the radius away neither
    * merges nor behaves as a clean crossing, and the classification
    * operates at fp-noise scale (the round-8 fuzz found exactly this).
    * S2Builder solves it by requiring the CALLER to pick a snap radius
    * at/above the data's degeneracy scale; we derive it instead: observe
    * every cross-input vertex-vertex and vertex-edge distance below
    * [[DegenBand]] and set the radius to clear the occupied band
    * (2.5x the largest such distance, capped at [[SnapCap]]). Clean
    * inputs have no sub-band distances and keep [[SnapTol]] — pinned
    * goldens do not move. */
  private val DegenBand = 1e-10
  private val SnapCap = 4e-10

  private def workingTol(aRings: Vector[Ring], bRings: Vector[Ring]): Double = {
    val aV = aRings.flatten.distinct
    val bV = bRings.flatten.distinct
    var maxD = 0.0
    def consider(d: Double): Unit =
      if (d > 0 && d < DegenBand && d > maxD) maxD = d
    for (w <- bV; u <- aV) consider(w.angle(u))
    def edgeDists(verts: Vector[S2Point], rings: Vector[Ring]): Unit =
      for (r <- rings; i <- r.indices; w <- verts) {
        val u = r(i); val v = r((i + 1) % r.size)
        if (w != u && w != v) {
          val n = u.cross(v); val nn = n.norm
          if (nn >= 1e-30 && w.dot(n.cross(u)) > 0 && w.dot(v.cross(n)) > 0)
            consider(Math.abs(w.dot(n)) / nn)
        }
      }
    edgeDists(bV, aRings)
    edgeDists(aV, bRings)
    if (maxD == 0.0) SnapTol
    else Math.max(SnapTol, Math.min(2.5 * maxD, SnapCap))
  }

  def intersect(a: Vector[Group], b: Vector[Group]): Option[Vector[Group]] =
    run(a, b).map(_.and)
  def union(a: Vector[Group], b: Vector[Group]): Option[Vector[Group]] =
    run(a, b).map(_.or)
  def diff(a: Vector[Group], b: Vector[Group]): Option[Vector[Group]] =
    run(a, b).map(_.minus)

  private final case class Results(and: Vector[Group], or: Vector[Group],
                                   minus: Vector[Group])

  /** Directed sub-edge: region on the LEFT walking u -> v; `ring` is a
    * global ring index (source-qualified) used for stitch preference. */
  private final case class DEdge(u: S2Point, v: S2Point, ring: Int)

  private def run(a: Vector[Group], b: Vector[Group]): Option[Results] =
    try runImpl(a, b) catch { case _: Exception => None }

  private def runImpl(aIn: Vector[Group], bIn: Vector[Group]): Option[Results] = {
    // ---- region-left ring chains (shells as stored small-side = CCW;
    // holes reversed), with each ring's GROUP id — containment of a point
    // in the region is per-group (inside the shell AND inside every
    // hole-complement), OR'd across groups; a flat XOR-parity over
    // orientation-aware loops is wrong as soon as a group has a hole
    def leftRings(gs: Vector[Group]): Vector[(Ring, Int)] = gs.zipWithIndex.flatMap {
      case (g, gi) =>
        val rs = PolyClip.normRing(g.shell) +: g.holes.map(h => PolyClip.normRing(h).reverse)
        rs.filter(_.size >= 3).map(r => (r, gi))
    }
    val aPairs = leftRings(aIn)
    val bPairs = leftRings(bIn)
    val aRings0 = aPairs.map(_._1)
    val bRings0 = bPairs.map(_._1)
    if (aRings0.isEmpty || bRings0.isEmpty) return None

    // adaptive snap radius: clears the observed degeneracy band (see
    // [[workingTol]]); SnapTol on clean inputs
    val tol = workingTol(aRings0, bRings0)

    // ---- 1. snap-align: canonicalize B vertices onto A vertices within tol
    val aVerts: Vector[S2Point] = aRings0.flatten.distinct
    val bVertsRaw: Vector[S2Point] = bRings0.flatten.distinct
    val canon = mutable.HashMap[S2Point, S2Point]()
    for (w <- bVertsRaw; if !canon.contains(w)) {
      var best: S2Point = null
      var bestD = tol
      for (u <- aVerts) {
        val d = w.angle(u)
        if (d <= bestD) { best = u; bestD = d }
      }
      if (best != null && best != w) canon(w) = best
    }
    def canonChain(r: Ring): Ring = dedupCycle(r.map(p => canon.getOrElse(p, p)))
    val aRings = aRings0 // A vertices are already canonical
    val aGroupOf: Vector[Int] = aPairs.map(_._2)
    val bKept = bPairs.map { case (r, gi) => (canonChain(r), gi) }.filter(_._1.size >= 3)
    val bRings = bKept.map(_._1)
    val bGroupOf: Vector[Int] = bKept.map(_._2)
    if (bRings.isEmpty) return None
    val bVerts: Vector[S2Point] = bRings.flatten.distinct

    // ---- 2. subdivision: per-edge cut lists
    // edge id space: rings flattened; cuts(ringIdx)(edgeIdx) = points
    type Cuts = Array[Array[mutable.ArrayBuffer[S2Point]]]
    def newCuts(rings: Vector[Ring]): Cuts =
      rings.map(r => Array.fill(r.size)(mutable.ArrayBuffer[S2Point]())).toArray
    val aCuts = newCuts(aRings)
    val bCuts = newCuts(bRings)

    // 2a. vertex-on-edge incidences (the ulp-degenerate class): reroute
    // each edge through canonical vertices of the OTHER input within tol
    def cutAtVertices(rings: Vector[Ring], cuts: Cuts, verts: Vector[S2Point]): Unit =
      for (ri <- rings.indices; r = rings(ri); i <- r.indices) {
        val u = r(i); val v = r((i + 1) % r.size)
        for (w <- verts; if w != u && w != v && onArcWithin(w, u, v, tol))
          cuts(ri)(i) += w
      }
    cutAtVertices(aRings, aCuts, bVerts)
    cutAtVertices(bRings, bCuts, aVerts)

    // 2b. proper crossings between A and B edges; crossing points snapped
    // to nearby canonical vertices, then to previously seen crossings
    val seenCrossings = mutable.ArrayBuffer[S2Point]()
    def canonPoint(p: S2Point, near: Seq[S2Point]): S2Point = {
      for (q <- near) if (p == q || p.angle(q) <= tol) return q
      for (q <- seenCrossings) if (p.angle(q) <= tol) return q
      seenCrossings += p
      p
    }
    // near-collinear at the WORKING tolerance: both endpoints within tol
    // of the other edge's great circle means a quasi-shared arc
    def nearLine(u: S2Point, v: S2Point, w: S2Point): Boolean = {
      val n = u.cross(v); val nn = n.norm
      nn < 1e-30 || Math.abs(w.dot(n)) / nn <= Math.max(tol, 1e-12)
    }
    for (ai <- aRings.indices; ra = aRings(ai); i <- ra.indices) {
      val a1 = ra(i); val a2 = ra((i + 1) % ra.size)
      for (bi <- bRings.indices; rb = bRings(bi); j <- rb.indices) {
        val b1 = rb(j); val b2 = rb((j + 1) % rb.size)
        // near-collinear pairs are shared arcs (subdivided identically by
        // step 2a), never transversal crossings — same guard as PolyClip
        if (S2Pred.crossingSign(a1, a2, b1, b2) > 0 &&
            !(nearLine(a1, a2, b1) && nearLine(a1, a2, b2))) {
          val p = canonPoint(PolyClip.intersectionPoint(a1, a2, b1, b2),
            Seq(a1, a2, b1, b2))
          if (p != a1 && p != a2) aCuts(ai)(i) += p
          if (p != b1 && p != b2) bCuts(bi)(j) += p
        }
      }
    }

    def subdivide(rings: Vector[Ring], cuts: Cuts, ringBase: Int): Vector[DEdge] = {
      val out = mutable.ArrayBuffer[DEdge]()
      for (ri <- rings.indices; r = rings(ri)) {
        val chain = mutable.ArrayBuffer[S2Point]()
        for (i <- r.indices) {
          chain += r(i)
          val u = r(i)
          chain ++= cuts(ri)(i).distinct.sortBy(p => u.angle(p))
        }
        val cyc = dedupCycle(chain.toVector)
        for (i <- cyc.indices)
          out += DEdge(cyc(i), cyc((i + 1) % cyc.size), ringBase + ri)
      }
      out.toVector
    }
    val aEdges = subdivide(aRings, aCuts, 0)
    val bEdges = subdivide(bRings, bCuts, aRings.size)

    // subdivided chains per ring (for the containment index — the
    // classification must test against the SNAPPED geometry, and using
    // identical chains keeps both sides of a shared arc consistent).
    // Containment is per-GROUP: p is in the region iff for some group its
    // shell chain AND every hole chain contain p (hole chains are
    // region-left reversed, so their S2-interior is the hole complement)
    def chainLoopsByGroup(edges: Vector[DEdge], ringBase: Int,
                          groupOf: Vector[Int]): Vector[Vector[S2Loop]] =
      edges.groupBy(_.ring).toVector
        .map { case (rid, es) => (groupOf(rid - ringBase), new S2Loop(es.map(_.u).toArray)) }
        .groupBy(_._1).toVector.sortBy(_._1).map(_._2.map(_._2))
    val aLoops = chainLoopsByGroup(aEdges, 0, aGroupOf)
    val bLoops = chainLoopsByGroup(bEdges, aRings.size, bGroupOf)
    def regionContains(groups: Vector[Vector[S2Loop]], p: S2Point): Boolean =
      groups.exists(_.forall(_.contains(p)))

    // ---- 3. classify + 4. select
    val bSet = bEdges.iterator.map(e => (e.u, e.v)).toSet
    val aSet = aEdges.iterator.map(e => (e.u, e.v)).toSet
    val andSel = mutable.ArrayBuffer[DEdge]()
    val orSel = mutable.ArrayBuffer[DEdge]()
    val minusSel = mutable.ArrayBuffer[DEdge]()
    for (e <- aEdges) {
      if (bSet.contains((e.u, e.v))) { // shared, same direction (A copy)
        andSel += e; orSel += e
      } else if (bSet.contains((e.v, e.u))) { // shared, opposite direction
        minusSel += e
      } else {
        val mid = (e.u + e.v).normalize
        if (regionContains(bLoops, mid)) andSel += e
        else { orSel += e; minusSel += e }
      }
    }
    for (e <- bEdges) {
      if (!aSet.contains((e.u, e.v)) && !aSet.contains((e.v, e.u))) {
        val mid = (e.u + e.v).normalize
        if (regionContains(aLoops, mid)) { andSel += e; minusSel += DEdge(e.v, e.u, e.ring) }
        else orSel += e
      }
    }

    val dbg = sys.env.contains("GRAFT_OVERLAY_DEBUG")
    def fmtE(e: DEdge): String = {
      def f(p: S2Point) = f"(${p.lngDegrees}%.12g ${p.latDegrees}%.12g)"
      s"ring${e.ring} ${f(e.u)}->${f(e.v)}"
    }
    val andG = stitch(andSel.toVector, tol).getOrElse {
      if (dbg) System.err.println(s"[polyoverlay] AND stitch failed (${andSel.size} edges):\n  " +
        andSel.map(fmtE).mkString("\n  "))
      return None }
    val orG = stitch(orSel.toVector, tol).getOrElse {
      if (dbg) System.err.println(s"[polyoverlay] OR stitch failed (${orSel.size} edges)")
      return None }
    val minusG = stitch(minusSel.toVector, tol).getOrElse {
      if (dbg) System.err.println(s"[polyoverlay] MINUS stitch failed (${minusSel.size} edges)")
      return None }

    // ---- self-check: exact area algebra on the snapped geometry
    def regionArea(gs: Vector[Group]): Double = gs.map(PolyClip.groupArea).sum
    val aArea = aIn.map(PolyClip.groupArea).sum
    val bArea = bIn.map(PolyClip.groupArea).sum
    val i = regionArea(andG); val u = regionArea(orG); val m = regionArea(minusG)
    // gross-corruption tripwire, not an exactness proof: sliver-laden
    // outputs carry curvature-area noise ~eps/edge_len at tiny edges, so
    // the tolerance sits at snap-sliver scale; real corruption (a lost or
    // double-counted piece) is orders of magnitude above it
    val areaTol = Math.max(1e-10, 1e-7 * (aArea + bArea))
    val ok = Math.abs(i + m - aArea) <= areaTol &&
      Math.abs(u - (aArea + bArea - i)) <= areaTol
    if (!ok) {
      if (dbg) System.err.println(
        s"[polyoverlay] area check failed: i=$i u=$u m=$m aArea=$aArea bArea=$bArea tol=$areaTol")
      None
    } else Some(Results(andG, orG, minusG))
  }

  /** Stitch directed boundary edges into rings: prefer closing the ring,
    * then continuing on the same source ring (keeps corner-touching rings
    * separate instead of producing a figure-eight), then any unused
    * successor. None on a dangling boundary. */
  private def stitch(edges: Vector[DEdge], tol: Double = SnapTol): Option[Vector[Group]] = {
    if (edges.isEmpty) return Some(Vector.empty)
    val bySrc = mutable.HashMap[S2Point, mutable.ArrayBuffer[Int]]()
    for (i <- edges.indices)
      bySrc.getOrElseUpdate(edges(i).u, mutable.ArrayBuffer.empty) += i
    val used = new Array[Boolean](edges.size)
    val rings = mutable.ArrayBuffer[Ring]()
    for (start <- edges.indices if !used(start)) {
      val ring = mutable.ArrayBuffer[S2Point]()
      val startVertex = edges(start).u
      var cur = start
      var closed = false
      while (!closed) {
        used(cur) = true
        ring += edges(cur).u
        val nxt = edges(cur).v
        if (nxt == startVertex) closed = true
        else {
          val cands = bySrc.getOrElse(nxt, mutable.ArrayBuffer.empty)
            .filter(i => !used(i))
          if (cands.isEmpty) return None // dangling boundary
          val sameRing = cands.find(i => edges(i).ring == edges(cur).ring)
          cur = sameRing.getOrElse(cands.head)
        }
      }
      // output hygiene at 4x the snap tolerance: a pair of corners just
      // OUTSIDE vertex-merge range (e.g. 1.02e-12 rad apart) leaves a stub
      // edge whose turn-angle curvature is fp noise — collapse it here
      // (changes the boundary by <= 4e-12 rad, well inside snap semantics)
      val cyc = dedupeTol(PolyClip.dedupeRing(ring.toVector), 4 * tol)
      if (cyc.size >= 3) rings += cyc
    }
    // canonical storage: small-side rings rotated to lex-min start,
    // parity-nested groups sorted — same form as PolyClip.dissolveSeams
    val stored = rings.toVector.map(PolyClip.normRing).map { r =>
      val k = r.indices.minBy(i => (r(i).x, r(i).y, r(i).z))
      r.drop(k) ++ r.take(k)
    }
    Some(PolyClip.regroupNested(stored)
      .sortBy(g => (g.shell.head.x, g.shell.head.y, g.shell.head.z)))
  }

  /** Drop consecutive vertices within `tol` radians in a cyclic chain. */
  private def dedupeTol(r: Ring, tol: Double): Ring = {
    val out = mutable.ArrayBuffer[S2Point]()
    for (p <- r) if (out.isEmpty || (out.last != p && out.last.angle(p) > tol)) out += p
    while (out.size > 1 && out.head.angle(out.last) <= tol) out.remove(out.size - 1)
    out.toVector
  }

  /** Drop consecutive exact duplicates in a cyclic chain (including the
    * wrap-around pair). */
  private def dedupCycle(r: Ring): Ring = {
    val out = mutable.ArrayBuffer[S2Point]()
    for (p <- r) if (out.isEmpty || out.last != p) out += p
    while (out.size > 1 && out.head == out.last) out.remove(out.size - 1)
    out.toVector
  }

  /** w lies within `tol` of the INTERIOR of arc (u, v): within tol of the
    * great circle and projecting strictly inside the arc's wedge. */
  private def onArcWithin(w: S2Point, u: S2Point, v: S2Point, tol: Double): Boolean = {
    val n = u.cross(v)
    val nn = n.norm
    if (nn < 1e-30) return false
    if (Math.abs(w.dot(n)) / nn > tol) return false
    w.dot(n.cross(u)) > 0 && w.dot(v.cross(n)) > 0
  }
}
