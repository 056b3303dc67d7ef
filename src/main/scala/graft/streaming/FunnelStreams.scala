package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel conversion — the incremental sibling of
  * operators.Funnel.conversionByCohort: emit a conversion record the moment
  * a user's first `toStep` lands within the window after their first
  * `fromStep`, across micro-batches.
  *
  * State per user is two scalars (first-from time + converted flag) —
  * bounded regardless of event volume, the 100 TB streaming invariant. In
  * production the state store is additionally bounded in USERS via
  * `GroupStateTimeout.ProcessingTimeTimeout` (expire users whose window
  * passed); tests drive NoTimeout because ProcessingTimeTimeout schedules
  * continuous empty micro-batches and never quiesces under
  * `processAllAvailable` (same note as EventStreams.sessionize).
  */
object FunnelStreams {

  final case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class FunnelState(fromUs: Long, converted: Boolean)
  final case class Conversion(user_id: Long, from_ts: Timestamp,
      to_ts: Timestamp, lag_ms: Long)

  /** Conversions of first `fromStep` → first strictly-later `toStep` within
    * `windowMs`. Exactly one record per converting user (the flag stays in
    * state so later `toStep` events don't re-emit); `toStep` events with no
    * prior `fromStep` never convert (ordering inside a batch is by event
    * time, so a from→to pair arriving together still converts).
    */
  def conversions(events: Dataset[FunnelEvent], fromStep: String,
      toStep: String, windowMs: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout())
      : Dataset[Conversion] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Conversion](
        OutputMode.Append(), timeout) {
        (userId: Long, rows: Iterator[FunnelEvent],
         state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val out = Seq.newBuilder[Conversion]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case None if e.event_type == fromStep =>
                  cur = Some(FunnelState(t, converted = false))
                case Some(s) if !s.converted && e.event_type == toStep &&
                    t > s.fromUs && t - s.fromUs <= windowMs =>
                  out += Conversion(userId, new Timestamp(s.fromUs),
                    new Timestamp(t), t - s.fromUs)
                  cur = Some(s.copy(converted = true))
                case _ => () // later fromSteps, early/late toSteps: no-ops
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (timeout == GroupStateTimeout.ProcessingTimeTimeout())
                state.setTimeoutDuration(windowMs)
            }
            out.result().iterator
          }
      }
  }
}
