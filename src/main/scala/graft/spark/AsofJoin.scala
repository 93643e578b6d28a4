package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (temporal) join: for every left row, attach the LATEST right row
 * whose timestamp is at-or-before the left row's timestamp, per equi-key
 * — the standard point-in-time lookup of event pipelines (feature values
 * as of an interaction, last price as of a trade, most recent snapshot
 * as of a training example's cutoff). Matches DuckDB's
 * `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts` semantics,
 * which is the oracle the correctness row replays.
 *
 * Scale shape: NOT a range join (quadratic per key) and NOT a broadcast
 * of the right side (arbitrarily large). Both sides are tagged and
 * UNIONED, then a single window pass partitioned by the key and ordered
 * by (ts, side-tag) carries the last-seen right payload forward onto
 * each left row (`last(_, ignoreNulls = true)`): ONE shuffle on the
 * equi-key, each partition processed in one ordered sweep, state bounded
 * by the right payload width. At 100 TB this is the same cost profile as
 * any per-key sessionization; a pathologically hot key serializes its
 * own partition's sort (the usual window caveat) but nothing is
 * quadratic and nothing is collected. The right side must be unique per
 * (key, ts) — pre-aggregate if it is not, or the "latest" row is
 * engine-dependent (ties on ts break toward the right row, i.e.
 * `l.ts >= r.ts` inclusive, exactly as the oracle).
 *
 * `toleranceSeconds`: when >= 0, a match older than the tolerance is
 * nulled out (DuckDB spells this as an extra
 * `l.ts - r.ts <= INTERVAL ...` conjunct on the ASOF condition; same
 * null-not-drop semantics as its LEFT variant).
 */
object AsofJoin {

  /** `left` gains `asof_ts` (matched right timestamp) and the requested
    * right `valueCols` prefixed `asof_` — null when no right row is
    * at-or-before (or within tolerance). `forward = true` flips the
    * direction: the EARLIEST right row at-or-after each left row
    * (DuckDB: `ASOF LEFT JOIN ... ON l.ts <= r.ts`), with the tolerance
    * then bounding how far ahead the match may be. SQL null semantics: a
    * null key or null timestamp never compares equal/ordered, so right
    * rows with nulls match nothing and left rows with nulls emit
    * unmatched (LEFT join). */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, valueCols: Seq[String],
               toleranceSeconds: Long = -1L, forward: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin needs at least one equi-key column")
    require(valueCols.nonEmpty, "asofJoin needs at least one right value column")
    val leftCols = left.columns.toSeq
    // NULL semantics must match the SQL oracle (ASOF ... ON l.k = r.k AND
    // l.ts >= r.ts): a NULL key or NULL ts never compares true. Right
    // rows with nulls can match nothing — drop them (otherwise the
    // window's nulls-first ordering carries their VALUE columns with
    // ignoreNulls while skipping their null ts, leaking a value with no
    // matching timestamp). Left rows with nulls keep LEFT-join semantics:
    // they bypass the window and emit with null matches.
    val keyOrTsNull = (keyCols :+ tsCol).map(col(_).isNull).reduce(_ || _)
    val rightClean = right.where(!keyOrTsNull)
    val leftClean = left.where(!keyOrTsNull)
    val leftNullRows = left.where(keyOrTsNull)
    // tag: right rows sort BEFORE left rows at an equal timestamp (in the
    // scan direction) so the carried state includes a right row with
    // r.ts == l.ts — the inclusive >= / <= semantics
    val carryCols = leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
    val taggedLeft = leftClean.select(
      (keyCols.map(col) :+ col(tsCol).as("__ts") :+ lit(1).as("__side") :+
        lit(null).cast(left.schema(tsCol).dataType).as("__r_ts")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__rv_$c")) ++
        carryCols.map(c => col(c).as(s"__lv_$c")): _*)
    val taggedRight = rightClean.select(
      (keyCols.map(col) :+ col(tsCol).as("__ts") :+ lit(0).as("__side") :+
        col(tsCol).as("__r_ts")) ++
        valueCols.map(c => col(c).as(s"__rv_$c")) ++
        carryCols.map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"__lv_$c")): _*)
    // forward as-of IS backward as-of under time reversal: scan the
    // window descending and carry the last-seen right, which is then the
    // earliest at-or-after — same single shuffle, same running frame
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(if (forward) col("__ts").desc else col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedLeft.unionByName(taggedRight)
      .withColumn("__asof_ts", last(col("__r_ts"), ignoreNulls = true).over(w))
      .withColumns(valueCols.map(c =>
        s"__asof_$c" -> last(col(s"__rv_$c"), ignoreNulls = true).over(w)).toMap)
      .where(col("__side") === 1)
    // tolerance: a stale match nulls out (left row survives — LEFT join).
    // Gap in MICROS — unix_timestamp() truncates to whole seconds, which
    // mis-classifies sub-second gaps against the oracle's interval math
    val gap =
      if (forward) unix_micros(col("__asof_ts")) - unix_micros(col("__ts"))
      else unix_micros(col("__ts")) - unix_micros(col("__asof_ts"))
    val fresh =
      if (toleranceSeconds < 0) lit(true)
      else col("__asof_ts").isNotNull && gap <= toleranceSeconds * 1000000L
    val matched = carried.select(
      keyCols.map(col) ++
        Seq(col("__ts").as(tsCol),
          when(fresh, col("__asof_ts")).otherwise(lit(null)).as("asof_ts")) ++
        valueCols.map(c =>
          when(fresh, col(s"__asof_$c")).otherwise(lit(null)).as(s"asof_$c")) ++
        carryCols.map(c => col(s"__lv_$c").as(c)): _*)
    // null-key/null-ts left rows: LEFT semantics, unmatched by definition
    val nullMatched = leftNullRows.select(
      keyCols.map(col) ++
        Seq(col(tsCol),
          lit(null).cast(left.schema(tsCol).dataType).as("asof_ts")) ++
        valueCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"asof_$c")) ++
        carryCols.map(col(_)): _*)
    matched.unionByName(nullMatched)
  }
}
