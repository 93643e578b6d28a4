package graft.core

/**
 * Geography value model: (multi)point / (multi)polyline / (multi)polygon /
 * collection on the unit sphere, following the BigQuery-GEOGRAPHY data model
 * the reference implements (reference: README.md:97-101, src/s2_types.cpp).
 *
 * Vertices are stored as exact unit vectors (S2Point) so that WKT output is
 * the lossless round-trip of what was parsed (reference prints e.g.
 * `-64 44.99999999999999` — README.md:89).
 *
 * A polygon is a list of (shell, holes) ring groups; each ring is a closed
 * loop WITHOUT the repeated last vertex. Rings follow the "not larger than a
 * hemisphere" normalization of non-oriented WKT readers.
 */
sealed trait Geography extends Serializable {
  def isEmpty: Boolean
  /** 0 = point, 1 = line, 2 = polygon; collections take the max; empty
    * collection = -1 (reference: s2_accessors.cpp:457-469). */
  def dimension: Int
  def numPoints: Int
  /** All vertices (for bounds / crude coverings). */
  def foreachVertex(f: S2Point => Unit): Unit
}

object Geography {
  final case class Points(points: Vector[S2Point]) extends Geography {
    def isEmpty: Boolean = points.isEmpty
    def dimension: Int = 0
    def numPoints: Int = points.size
    def foreachVertex(f: S2Point => Unit): Unit = points.foreach(f)
  }

  final case class Polylines(lines: Vector[Vector[S2Point]]) extends Geography {
    def isEmpty: Boolean = lines.forall(_.isEmpty)
    def dimension: Int = 1
    def numPoints: Int = lines.map(_.size).sum
    def foreachVertex(f: S2Point => Unit): Unit = lines.foreach(_.foreach(f))
  }

  /** ringGroups: each entry is shell :: holes. */
  final case class Polygons(ringGroups: Vector[Vector[Vector[S2Point]]]) extends Geography {
    def isEmpty: Boolean = ringGroups.forall(_.forall(_.isEmpty))
    def dimension: Int = 2
    def numPoints: Int = ringGroups.map(_.map(_.size).sum).sum
    def foreachVertex(f: S2Point => Unit): Unit =
      ringGroups.foreach(_.foreach(_.foreach(f)))
    def allRings: Vector[Vector[S2Point]] = ringGroups.flatten.filter(_.nonEmpty)
  }

  final case class Collection(items: Vector[Geography]) extends Geography {
    def isEmpty: Boolean = items.forall(_.isEmpty)
    def dimension: Int =
      if (items.isEmpty) -1
      else items.map(_.dimension).max
    def numPoints: Int = items.map(_.numPoints).sum
    def foreachVertex(f: S2Point => Unit): Unit = items.foreach(_.foreachVertex(f))
  }

  /** Point snapped to an S2 leaf cell center — 12-byte encoding; the
    * reference's CELL_CENTER form (src/s2_cell_ops.cpp:514-551). Sentinel
    * cell id (invalid) means EMPTY. */
  final case class CellCenter(cellId: Long) extends Geography {
    def isEmpty: Boolean = !S2CellId.isValid(cellId)
    def dimension: Int = 0
    def numPoints: Int = if (isEmpty) 0 else 1
    def point: S2Point = S2CellId.toPoint(cellId)
    def foreachVertex(f: S2Point => Unit): Unit = if (!isEmpty) f(point)
  }

  val emptyPoint: Points = Points(Vector.empty)
  val emptyCollection: Collection = Collection(Vector.empty)

  def point(lngDeg: Double, latDeg: Double): Points =
    Points(Vector(S2Point.fromLatLngDegrees(latDeg, lngDeg)))

  /** Flatten to simple single-kind pieces (used by predicates/overlays). */
  def flatten(g: Geography): (Vector[S2Point], Vector[Vector[S2Point]], Vector[Vector[Vector[S2Point]]]) = {
    val pts = Vector.newBuilder[S2Point]
    val lns = Vector.newBuilder[Vector[S2Point]]
    val pgs = Vector.newBuilder[Vector[Vector[S2Point]]]
    def go(g: Geography): Unit = g match {
      case Points(ps) => ps.foreach(p => pts += p)
      case Polylines(ls) => ls.filter(_.nonEmpty).foreach(l => lns += l)
      case p: Polygons => p.ringGroups.filter(_.nonEmpty).foreach(rg => pgs += rg)
      case Collection(items) => items.foreach(go)
      case c: CellCenter => if (!c.isEmpty) pts += c.point
    }
    go(g)
    (pts.result(), lns.result(), pgs.result())
  }
}
