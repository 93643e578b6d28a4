package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming operators over the events stream shape
 * (event_id, ts, user_id, event_type, value). The reference has no
 * streaming engine; these are the Spark-native stream counterparts of the
 * batch queries (b_events_hourly / b_events_sessions), built on watermarks
 * + windowed aggregation and flatMapGroupsWithState.
 *
 * All scalar graft operators (geo, text, dedup signatures) are stateless
 * expressions, so they compose with these streams unchanged.
 */
object Sessions {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(sessionStart: Long, lastTs: Long, nEvents: Long)

  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long)

  /** Watermarked hourly rollup (same result as the batch b_events_hourly
    * once the watermark closes each hour). */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), approx_count_distinct("user_id").as("n_users_approx"))
      .select(col("event_type"), col("window.start").as("hour"), col("n"), col("n_users_approx"))

  /** Streaming exact dedup for document ingest: first text per content
    * fingerprint survives; duplicate-detection state is bounded by the
    * watermark (dropDuplicatesWithinWatermark), so the operator runs
    * forever without unbounded state — the streaming twin of
    * llm.Dedup.exactDedup. `tsCol` is the event-time column the watermark
    * rides on. */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String = "ts",
                  watermark: String = "1 hour"): DataFrame =
    docs.withColumn("__h", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")

  /** Streaming NEAR-duplicate detection for document ingest — the
    * streaming twin of llm.Dedup's MinHash-LSH candidate test. Each doc's
    * word-set MinHash signature splits into `bands` bucket keys; the
    * first doc to claim a (band, bucket) within the watermark owns it
    * (dropDuplicatesWithinWatermark — state stays watermark-bounded), and
    * a doc is NOVEL iff it claimed ALL its bands: any lost band means an
    * earlier doc collided there, which is exactly the batch LSH
    * candidate-pair test. Identical word sets lose every band to their
    * earlier twin and vanish from the output; partial collisions surface
    * with `novel = false`; unrelated docs claim all bands (up to the
    * usual LSH false-positive rate — tune numHashes/bands as in batch).
    *
    * CONTRACT: `novel` is the LSH CANDIDATE test, not a verified
    * duplicate — a doc that loses a band to a false-positive collider
    * (a non-duplicate that happens to share a bucket) is reported
    * `novel = false`, exactly as batch LSH emits that candidate pair.
    * Precision filtering (e.g. a Jaccard check on flagged docs against
    * the band owners) is a downstream concern, as in batch; the
    * StreamingSpec FP case pins this edge.
    *
    * Two chained stateful operators (bucket dedup, then a windowed
    * per-doc count) — append mode, so rows emit when the watermark
    * closes their `windowSize` event-time window. Output:
    * (idCol, win_start, n_bands, novel). */
  def nearDedupStream(docs: DataFrame, idCol: String, textCol: String,
                      tsCol: String = "ts", watermark: String = "1 hour",
                      windowSize: String = "10 minutes",
                      numHashes: Int = 64, bands: Int = 8): DataFrame = {
    val sig = graft.llm.Dedup.minhashSignature(col(textCol), numHashes)
    docs
      .withColumn("__bks", graft.llm.Dedup.lshBandBuckets(sig, numHashes, bands))
      .select(col(idCol), col(tsCol),
        posexplode(col("__bks")).as(Seq("__band", "__bucket")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__band", "__bucket")
      .groupBy(col(idCol), window(col(tsCol), windowSize))
      .agg(count(lit(1)).as("n_bands"))
      .select(col(idCol), col("window.start").as("win_start"),
        col("n_bands"), (col("n_bands") === bands).as("novel"))
  }

  /** Stream-vs-INDEX near-dedup: flag incoming docs that are LSH
    * candidates against a STATIC [[graft.llm.Dedup.bandIndex]] of the
    * historical corpus — the streaming twin of
    * [[graft.llm.Dedup.nearDupAgainstIndex]] and the ingest shape at
    * 100 TB: the corpus text is never touched, the stream side computes
    * its own signatures statelessly, the (band, bucket) semi-join prunes
    * against the at-rest index, and the only state is the
    * watermark-bounded first-collision dedup per doc id. Output: one row
    * per flagged doc (idCol, tsCol) — its word-set MinHash collided with
    * the index in at least one band (the LSH CANDIDATE test, same
    * contract as [[nearDedupStream]]: false-positive colliders flag too;
    * verification is downstream). Novel docs do not appear; feed the
    * flags to a left-anti against the batch, or invert with a join, as
    * the pipeline needs. */
  def nearDupAgainstIndexStream(docs: DataFrame, index: DataFrame,
                                idCol: String, textCol: String,
                                tsCol: String = "ts", watermark: String = "1 hour",
                                numHashes: Int = 64, bands: Int = 8): DataFrame = {
    val sig = graft.llm.Dedup.minhashSignature(col(textCol), numHashes)
    val idxBuckets = index.select(col("band"), col("bucket")).distinct()
    docs
      .withColumn("__bks", graft.llm.Dedup.lshBandBuckets(sig, numHashes, bands))
      .select(col(idCol), col(tsCol),
        posexplode(col("__bks")).as(Seq("band", "bucket")))
      .join(idxBuckets, Seq("band", "bucket"), "left_semi")
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)
      .select(col(idCol), col(tsCol))
  }

  /** Stream-static dedup/decontamination: drop incoming docs whose
    * content fingerprint already exists in a STATIC reference corpus
    * (historical data, an eval set to keep out of training). A
    * stream-static LEFT ANTI join on the md5 key — stateless on the
    * stream side, no watermark required; Spark broadcasts the static
    * fingerprint table when it fits and hash-joins otherwise. Composes
    * with [[dedupStream]] for within-stream duplicates. */
  def dedupAgainstCorpus(docs: DataFrame, textCol: String,
                         corpus: DataFrame, corpusTextCol: String): DataFrame = {
    val ref = corpus.select(md5(col(corpusTextCol)).as("__h")).distinct()
    docs.withColumn("__h", md5(col(textCol)))
      .join(ref, Seq("__h"), "left_anti")
      .drop("__h")
  }

  /** Gap-based sessionization (30-min idle gap) with explicit state:
    * one state record per user, timeout-driven emission. */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new Timestamp(s.sessionStart),
              new Timestamp(s.lastTs), s.nEvents))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val out = Seq.newBuilder[SessionOut]
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapSeconds * 1000 =>
                  cur = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1))
                case Some(s) =>
                  out += SessionOut(userId, new Timestamp(s.sessionStart),
                    new Timestamp(s.lastTs), s.nEvents)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapSeconds * 1000)
            }
            out.result().iterator
          }
      }
  }

  // ----------------------------------------------------- streaming as-of

  case class AsofLeft(key: Long, ts: Timestamp, left_id: Long)
  case class AsofRight(key: Long, ts: Timestamp, value: Double)
  case class AsofOut(left_id: Long, key: Long, ts: Timestamp,
                     asof_ts: Option[Timestamp], asof_value: Option[Double])
  /** Internal tagged-union row of [[asofJoinStream]] (public only because
    * encoder codegen must construct it). */
  case class AsofRow(key: Long, ts: Timestamp, side: Int,
                     left_id: Long, value: Double)
  /** Internal state of [[asofJoinStream]] (public for encoder codegen). */
  case class AsofState(rights: List[(Long, Double)], maxSeen: Long)

  /** Streaming AS-OF join — the streaming twin of
    * [[graft.spark.AsofJoin.asofJoin]]: each left event picks up the
    * latest right value at-or-before its event time, per key. Both
    * streams are tagged and unioned (the same trick as the batch union +
    * window carry), grouped by key, and matched in one
    * flatMapGroupsWithState pass whose state is the per-key RIGHT
    * HISTORY, pruned to the watermark: rights older than the watermark
    * cannot match any future left row except as the newest-before-
    * watermark carry, so the state keeps exactly that one plus the
    * in-watermark tail — watermark-bounded, like every operator here.
    * Keys idle past `idleRetention` drop their state entirely via
    * event-time timeout.
    *
    * Ordering contract: rows are sorted by (event time, side) WITHIN a
    * micro-batch (rights before lefts at equal ts — the batch `>=`
    * semantics), so the result is exactly the batch as-of when data
    * arrives in event-time order across batches (the spec pins parity).
    * A right row arriving AFTER a left row it should have matched (in a
    * later micro-batch, i.e. later than the left in processing time but
    * earlier in event time) cannot retro-update the already-emitted left
    * row — it serves later lefts only. That is the standard append-mode
    * lateness trade; tighten the watermark source-side if it matters.
    * (Rows older than the watermark itself are dropped at the input by
    * Spark's standard late-data filter, like every stateful operator.) */
  def asofJoinStream(left: Dataset[AsofLeft], right: Dataset[AsofRight],
                     watermark: String = "1 hour",
                     idleRetentionMs: Long = 24L * 3600 * 1000): Dataset[AsofOut] = {
    import left.sparkSession.implicits._
    // null event times cannot ride a watermark (and would NPE the group
    // sort) — dropped on both sides, the streaming analogue of the batch
    // operator's null-never-matches rule
    val taggedLeft = left.filter(_.ts != null)
      .map(l => AsofRow(l.key, l.ts, 1, l.left_id, 0.0))
    val taggedRight = right.filter(_.ts != null)
      .map(r => AsofRow(r.key, r.ts, 0, -1L, r.value))
    taggedLeft.unionByName(taggedRight)
      .withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsofState, AsofOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[AsofRow], state: GroupState[AsofState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // rights DESCENDING by ts: match = first entry with ts <= l.ts
            var rights = state.getOption.map(_.rights).getOrElse(Nil)
            var maxSeen = state.getOption.map(_.maxSeen).getOrElse(Long.MinValue)
            val out = Seq.newBuilder[AsofOut]
            for (r <- rows.toSeq.sortBy(x => (x.ts.getTime, x.side))) {
              val t = r.ts.getTime
              maxSeen = math.max(maxSeen, t)
              if (r.side == 0) {
                // in-batch rows are sorted, but state may hold newer rows
                // than a late right — insert in descending-ts position
                val (newer, older) = rights.span(_._1 > t)
                rights = newer ::: ((t, r.value) :: older)
              } else {
                val m = rights.find(_._1 <= t)
                out += AsofOut(r.left_id, key, r.ts,
                  m.map(x => new Timestamp(x._1)), m.map(_._2))
              }
            }
            // prune: drop rights at-or-before the watermark, keeping the
            // newest of them as the carry for in-watermark future lefts
            val wm = state.getCurrentWatermarkMs()
            val (live, old) = rights.span(_._1 > wm)
            val pruned = live ::: old.take(1)
            state.update(AsofState(pruned, maxSeen))
            state.setTimeoutTimestamp(maxSeen + idleRetentionMs)
            out.result().iterator
          }
      }
  }
}
