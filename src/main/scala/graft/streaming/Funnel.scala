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
}
