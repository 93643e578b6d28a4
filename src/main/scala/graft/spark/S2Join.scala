package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import S2Functions.S2

/**
 * Spatial join helpers (SURVEY §2.8): the scalable default is the
 * cover-then-refine equi-join — explode a fixed-level covering on both
 * sides, equi-join on the cell (SortMergeJoin / ShuffledHashJoin, AQE
 * handles skew), then refine with the exact predicate and dedupe.
 *
 * The reference reaches the same result as a nested-loop predicate join
 * with a per-row covering prefilter (README.md:14-19,
 * s2_binary_index_ops.cpp:450-461); on Spark we hoist that prefilter into
 * the plan as a join key so it shuffles instead of looping.
 */
object S2Join {

  /** Tag rows with a deterministic id, then explode the `level`-covering of
    * geogCol into a `__cell` column (id BEFORE explode — it identifies the
    * original row across its cell copies).
    *
    * The id is a 128-bit content fingerprint (two seeded xxhash64 passes over
    * every column): unlike monotonically_increasing_id it is stable under
    * stage retry and speculative execution, so a recomputed partition can
    * never produce duplicate or lost pairs. Fully identical input rows share
    * a fingerprint and collapse to one output pair — consistent with the
    * dedupe-on-row-identity contract. */
  private def withCells(df: DataFrame, geogCol: String, level: Int, idName: String): DataFrame = {
    val cols = df.columns.map(col).toSeq
    df.withColumn(idName, struct(xxhash64((lit(1L) +: cols): _*), xxhash64((lit(2L) +: cols): _*)))
      .withColumn("__cell", explode(S2.s2_covering_fixed_level(col(geogCol), lit(level))))
  }

  /** Join two cell-exploded sides, refine with `predicate`, and dedupe the
    * multi-cell matches on the lightweight row ids (comparing long ids
    * beats re-hashing whole rows with geography blobs in them). */
  private def refineDedupe(l: DataFrame, r: DataFrame,
                           predicate: org.apache.spark.sql.Column,
                           prefilter: Option[Column] = None): DataFrame = {
    val joined = l.join(r, "__cell")
    // cheap pair prefilter (e.g. id_a < id_b for symmetric self-joins) runs
    // before the exact-geometry predicate, halving the expensive refines
    val pruned = prefilter.fold(joined)(joined.where)
    pruned.where(predicate)
      .dropDuplicates("__lid", "__rid")
      .drop("__cell", "__lid", "__rid")
  }

  /**
   * Cover-then-refine intersects join. Every output row satisfies
   * s2_intersects(left.geogL, right.geogR); duplicates from multi-cell
   * coverings are removed via a final distinct on the input row identity.
   *
   * At 100 TB: both sides shuffle once on the cell key; no broadcast
   * needed; AQE splits skewed cells (e.g. dense metro areas).
   */
  def intersects(left: DataFrame, geogL: String, right: DataFrame, geogR: String,
                 level: Int = 4): DataFrame = {
    val l = withCells(left, geogL, level, "__lid")
    val r = withCells(right, geogR, level, "__rid")
    refineDedupe(l, r, S2.s2_intersects(col(geogL), col(geogR)))
  }

  /** Containment join: rows where left contains right. */
  def contains(left: DataFrame, geogL: String, right: DataFrame, geogR: String,
               level: Int = 4): DataFrame = {
    val l = withCells(left, geogL, level, "__lid")
    val r = withCells(right, geogR, level, "__rid")
    refineDedupe(l, r, S2.s2_contains(col(geogL), col(geogR)))
  }

  /**
   * Broadcast predicate join for a small build side (the reference's
   * prepared-join pattern, docs/function-reference.md:1416-1423): prepare
   * the small side once, broadcast it, evaluate the exact predicate —
   * right plan when one side fits in memory (e.g. 177 countries).
   */
  def broadcastIntersects(small: DataFrame, geogS: String,
                          large: DataFrame, geogL: String): DataFrame = {
    val prepped = small.withColumn(geogS, S2.s2_prepare(col(geogS)))
    large.join(broadcast(prepped), S2.s2_intersects(col(geogS), col(geogL)))
  }

  /**
   * Distance join: pairs within `meters`. The covering level is chosen so
   * a cell diagonal comfortably exceeds `meters`, then each left cell
   * probes its own cell plus edge neighbors (covers the `meters` buffer),
   * refined by exact s2_dwithin.
   */
  def dwithin(left: DataFrame, geogL: String, right: DataFrame, geogR: String,
              meters: Double, pairFilter: Option[Column] = None): DataFrame = {
    val level = levelForDistance(meters)
    // full 8-neighborhood: edge neighbors alone miss pairs that are close
    // across a cell corner (diagonal adjacency)
    val l = withCells(left, geogL, level, "__lid")
      .withColumn("__cell", explode(concat(array(col("__cell")),
        S2.s2_cell_all_neighbors(col("__cell")))))
    val r = withCells(right, geogR, level, "__rid")
    refineDedupe(l, r, S2.s2_dwithin(col(geogL), col(geogR), lit(meters)), pairFilter)
  }

  /** Largest level whose minimum cell width still exceeds `meters`, so the
    * 8-neighbor ring is a sufficient buffer (S2 kMinWidth metric:
    * ~0.9428 rad * 2^-level * R). Finer levels mean ~4x fewer candidate
    * pairs per level step. */
  def levelForDistance(meters: Double): Int = {
    val minWidthL0 = 0.9428090415820634 * 6371010.0 // meters at level 0
    var level = 0
    while (level < 14 && minWidthL0 / (1L << (level + 1)) >= meters) level += 1
    level
  }

  /** Spatially cluster a dataframe by cell key for co-located storage /
    * pruned scans (reference "Great for sorting!" s2_cell_ops.cpp:287-290). */
  def clusterByCell(df: DataFrame, geogCol: String, level: Int): DataFrame = {
    val withKey = df.withColumn("__cell",
      S2.s2_cell_sortkey(S2.s2_cell_parent(S2.s2_geog_to_cellcenter(col(geogCol)), lit(level))))
    withKey.repartitionByRange(col("__cell")).sortWithinPartitions("__cell")
  }
}
