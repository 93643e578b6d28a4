package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming ordered conversion funnel — the stateful twin of the batch
 * `b_events_funnel` query (Queries.scala): a user advances from stage
 * k to k+1 on the FIRST event of the next stage type that is strictly
 * later than the stage-k timestamp and within `windowSeconds` of it.
 * Because "first qualifying event in time order" IS the batch query's
 * `min(ts) WHERE ts > prev AND ts - prev <= window`, the stream emits
 * exactly the batch funnel's stage rows when events arrive in event-time
 * order per user (FunnelStreamSpec pins the parity against the batch SQL).
 *
 * At 100 TB: state is one (stage, ts) pair per user — bounded by the
 * user population, not the event volume — and expires via event-time
 * timeout once the funnel horizon (stages x window, doubled for slack)
 * has passed with no activity, so abandoned funnels cannot accumulate
 * state forever. The DELIBERATE consequence: a user who goes silent past
 * the horizon and then reappears starts a NEW funnel (their prior stage
 * rows stand; fresh stage rows are emitted) — bounded state cannot
 * remember every user forever, and "re-engagement opens a new funnel" is
 * the standard production semantics. Batch parity therefore holds for
 * event histories within one horizon (FunnelStreamSpec pins both the
 * parity and the post-expiry re-entry). Late events below the watermark
 * are dropped by the engine, same as every other stateful op here.
 *
 * DELIVERY-ORDER CONTRACT: [[funnelStream]] processes each trigger's
 * events in event-time order but applies them to state IMMEDIATELY, so
 * batch parity requires per-user event-time-ordered delivery ACROSS
 * triggers, not just within one — a click delivered in trigger N is
 * consumed (or discarded at stage 0) before a still-above-watermark
 * earlier view arriving in trigger N+1 can start the funnel. When the
 * transport reorders within the watermark slack — the normal streaming
 * case the watermark exists for — use [[funnelStreamBuffered]], which
 * holds events in state until the watermark passes them and replays
 * them in event-time order: exact batch parity under ANY above-watermark
 * arrival order, at the cost of one-watermark-delay emission and a
 * per-user buffer bounded by (event rate x watermark slack) — the same
 * bounded-history discipline as the streaming as-of join.
 */
object Funnel {

  case class FunnelEvent(ts: Timestamp, user_id: Long, event_type: String)

  /** One row per stage ADVANCE: stage is 1-based (1 = first stage hit). */
  case class FunnelOut(user_id: Long, stage: Int, ts: Timestamp)

  case class FunnelState(stage: Int, stageTs: Long)

  def funnelStream(events: Dataset[FunnelEvent], stages: Seq[String],
                   windowSeconds: Long,
                   watermark: String = "1 hour"): Dataset[FunnelOut] = {
    require(stages.nonEmpty, "funnelStream: need at least one stage")
    require(windowSeconds > 0, "funnelStream: window must be positive")
    import events.sparkSession.implicits._
    val horizonMs = stages.length * windowSeconds * 1000L * 2
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // funnel horizon passed: whatever stage the user reached is
            // final; advances were already emitted incrementally
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            val out = Seq.newBuilder[FunnelOut]
            for (e <- sorted if cur.stage < stages.length) {
              if (e.event_type == stages(cur.stage)) {
                val t = e.ts.getTime
                val qualifies =
                  if (cur.stage == 0) true
                  else t > cur.stageTs && t - cur.stageTs <= windowSeconds * 1000L
                if (qualifies) {
                  cur = FunnelState(cur.stage + 1, t)
                  out += FunnelOut(userId, cur.stage, e.ts)
                }
              }
            }
            state.update(cur)
            // expire once no event could still advance this user: the
            // newest activity (stage hit OR seen event) plus the full
            // horizon. Anchoring on the newest event matters twice over —
            // it keeps an active user's state alive, and it keeps the
            // timeout timestamp ABOVE the current watermark (events below
            // the watermark are dropped before this function runs), which
            // Spark requires: a stage-k timestamp far in the past would
            // otherwise make setTimeoutTimestamp throw and kill the query.
            val newest = sorted.lastOption.map(_.ts.getTime).getOrElse(0L)
            val anchor = math.max(cur.stageTs, newest)
            state.setTimeoutTimestamp(anchor + horizonMs)
            out.result().iterator
          }
      }
  }

  case class BufferedState(stage: Int, stageTs: Long,
                           pending: List[(Long, String)])

  /** The funnel advance loop shared by the buffered paths: consume
    * `ripe` (event-time-sorted) against the current (stage, stageTs). */
  private def advanceStages(userId: Long, stage0: Int, stageTs0: Long,
                            ripe: Seq[(Long, String)], stages: Seq[String],
                            windowMs: Long): (Seq[FunnelOut], Int, Long) = {
    var stage = stage0
    var stageTs = stageTs0
    val out = Seq.newBuilder[FunnelOut]
    for ((t, tpe) <- ripe if stage < stages.length) {
      if (tpe == stages(stage)) {
        val qualifies =
          if (stage == 0) true
          else t > stageTs && t - stageTs <= windowMs
        if (qualifies) {
          stage += 1; stageTs = t
          out += FunnelOut(userId, stage, new Timestamp(t))
        }
      }
    }
    (out.result(), stage, stageTs)
  }

  /**
   * Watermark-exact funnel: events are BUFFERED in per-user state until
   * the watermark passes them, then replayed in event-time order — so
   * the emitted stage rows equal the batch funnel under ANY arrival
   * order the watermark admits (the cross-trigger reordering
   * [[funnelStream]]'s contract excludes). Emission lags one watermark
   * delay; the buffer holds only events inside the watermark slack
   * (bounded by rate x slack per user) and the horizon timeout finalizes
   * and clears each user exactly as in [[funnelStream]] — at timeout
   * every buffered event is below the watermark by construction
   * (timeout ts > newest buffered ts + horizon), so the final replay is
   * complete, not a truncation.
   */
  def funnelStreamBuffered(events: Dataset[FunnelEvent], stages: Seq[String],
                           windowSeconds: Long,
                           watermark: String = "1 hour"): Dataset[FunnelOut] = {
    require(stages.nonEmpty, "funnelStreamBuffered: need at least one stage")
    require(windowSeconds > 0, "funnelStreamBuffered: window must be positive")
    import events.sparkSession.implicits._
    val windowMs = windowSeconds * 1000L
    val horizonMs = stages.length * windowMs * 2
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BufferedState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[FunnelEvent], state: GroupState[BufferedState]) =>
          if (state.hasTimedOut) {
            // horizon passed: everything still buffered is below the
            // watermark — replay it all, emit the final advances, clear
            val st = state.getOption.getOrElse(BufferedState(0, Long.MinValue, Nil))
            val (out, _, _) = advanceStages(userId, st.stage, st.stageTs,
              st.pending.sortBy(identity), stages, windowMs)
            state.remove()
            out.iterator
          } else {
            val st = state.getOption.getOrElse(BufferedState(0, Long.MinValue, Nil))
            val incoming = rows.map(e => (e.ts.getTime, e.event_type)).toList
            val all = st.pending ++ incoming
            val wm = state.getCurrentWatermarkMs()
            // process what the watermark has sealed; hold the rest.
            // STRICTLY below (ADVICE r14): Spark's stateful late-record
            // filter still admits rows with eventTime == watermark in
            // later triggers, so sealing at <= could replay an exact-
            // boundary arrival after its same-timestamp peers were
            // consumed; with < every admissible late arrival (ts >= wm)
            // is provably ordered at-or-after all sealed events (< wm)
            val (ripe, hold) = all.partition(_._1 < wm)
            val (out, stage, stageTs) = advanceStages(userId, st.stage, st.stageTs,
              ripe.sortBy(identity), stages, windowMs)
            // a completed funnel needs no buffer — state shrinks to the pair
            state.update(BufferedState(stage, stageTs,
              if (stage == stages.length) Nil else hold))
            val newest = all.iterator.map(_._1).foldLeft(stageTs)(math.max)
            state.setTimeoutTimestamp(newest + horizonMs)
            out.iterator
          }
      }
  }
}
