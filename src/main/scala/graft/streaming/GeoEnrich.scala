package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.spark.{S2Functions, S2Join}
import graft.spark.S2Functions.S2

/**
 * Stream-static spatial enrichment: tag each streaming point event with
 * the static region(s) containing it — the streaming twin of the batch
 * flagship join (reference README.md:14-19 countries x cities).
 *
 * Plan shape: the static region side is prepared once (edge index
 * serialized into the blob) and broadcast; the stream is the probe side
 * of a BroadcastNestedLoopJoin whose predicate is the native
 * s2_intersects expression, so per-event refine hits the prepared-blob
 * decode cache. Stream-static inner joins need no watermark and keep no
 * state — at 100 TB/day of events this runs at stream speed as long as
 * the region table fits in a broadcast (the 177-country table is ~3 MB
 * prepared).
 *
 * The same call works on batch frames — the plan is identical minus the
 * streaming source.
 */
object GeoEnrich {

  def enrichPoints(events: DataFrame, lonCol: String, latCol: String,
                   regions: DataFrame, regionGeog: String): DataFrame = {
    S2Functions.ensureRegistered(events.sparkSession)
    val pts = events.withColumn("__pt",
      call_function("s2_geogpoint", col(lonCol), col(latCol)))
    S2Join.broadcastIntersects(regions, regionGeog, pts, "__pt")
      .drop("__pt", regionGeog)
  }

  /**
   * Stream-stream distance join: pairs of point events from two streams
   * that are within `meters` of each other AND within `windowSeconds` of
   * event time — the streaming twin of [[graft.spark.S2Join.dwithin]].
   *
   * Plan shape is exactly what Structured Streaming's symmetric hash join
   * can bound state for: the left side explodes its point cell's ring
   * neighborhood (the distance buffer, same as the batch join), the right
   * side keys by its single fixed-level cell, and the join condition is
   * cell EQUALITY + a two-sided event-time range + the exact chord-band
   * refine (`s2_dwithin_xyz`). Both sides carry watermarks, and the
   * two-sided time range lets Spark evict state older than
   * watermark - window on BOTH sides, so the operator runs forever with
   * state proportional to (rate x window), not the stream.
   *
   * Column names must be distinct across the two sides (the standard
   * constraint for condition-form stream joins). The same call works on
   * batch frames — the watermark nodes fold away and the identical
   * cell-ring equi-join plan runs (oracle-checked by `b_stream_dwithin`).
   */
  def dwithinJoin(left: DataFrame, lonL: String, latL: String, tsL: String,
                  right: DataFrame, lonR: String, latR: String, tsR: String,
                  meters: Double, windowSeconds: Long,
                  watermark: String = "1 hour",
                  pairFilter: Option[Column] = None): DataFrame = {
    S2Functions.ensureRegistered(left.sparkSession)
    val base = S2Join.levelForDistance(meters)
    val offset = S2Join.dwithinLevelOffset(left, right, base)
    val level = Math.min(base + offset, 30)
    val ring = 1 << offset
    val l = left
      .withColumn("__lpt", call_function("s2_geogpoint", col(lonL), col(latL)))
      .withColumn("__lxyz", call_function("s2_point_xyz", col("__lpt")))
      .withColumn("__lcell", explode(call_function("s2_cells_with_ring",
        call_function("s2_covering_fixed_level", col("__lpt"), lit(level)), lit(ring))))
      .withWatermark(tsL, watermark)
    // a point's fixed-level covering is exactly one cell, so the right
    // side needs no explode — and a pair can meet on at most one cell, so
    // no smallest-common-cell reporting either
    val r = right
      .withColumn("__rpt", call_function("s2_geogpoint", col(lonR), col(latR)))
      .withColumn("__rxyz", call_function("s2_point_xyz", col("__rpt")))
      .withColumn("__rcell", element_at(
        call_function("s2_covering_fixed_level", col("__rpt"), lit(level)), 1))
      .withWatermark(tsR, watermark)
    val timeRange =
      col(tsL) >= col(tsR) - expr(s"INTERVAL $windowSeconds SECONDS") &&
        col(tsL) <= col(tsR) + expr(s"INTERVAL $windowSeconds SECONDS")
    val refine = call_function("s2_dwithin_xyz",
      col("__lxyz"), col("__rxyz"), col("__lpt"), col("__rpt"), lit(meters))
    // when() locks evaluation order: cheap pair filter before the refine
    val guarded = pairFilter.fold(refine)(pf => when(pf, refine).otherwise(lit(false)))
    l.join(r, col("__lcell") === col("__rcell") && timeRange && guarded)
      .drop("__lpt", "__lxyz", "__lcell", "__rpt", "__rxyz", "__rcell")
  }
}
