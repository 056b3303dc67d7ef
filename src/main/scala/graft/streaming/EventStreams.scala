package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Generic Structured-Streaming operators over the events schema
  * (SURVEY.md §2.11: the reference has file-at-a-time batch semantics —
  * covered by ChurnStream — and these are the declared engine capabilities
  * beyond it: event-time windows with watermarks, and custom state via
  * flatMapGroupsWithState).
  *
  * All operators take/return untyped or typed Datasets and work identically
  * on batch frames (Spark's unified semantics) — specs drive them through
  * MemoryStream with event-time control.
  */
object EventStreams {

  /** Tumbling event-time window aggregate with a watermark: counts + value
    * sum per (window, event_type). Late data beyond the watermark is
    * dropped; state is bounded by watermark horizon — the 100 TB streaming
    * invariant.
    */
  def tumblingCounts(events: DataFrame, windowLen: String,
      watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding window variant. */
  def slidingCounts(events: DataFrame, windowLen: String, slide: String,
      watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"), col("n"))

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, end: Long, n: Int, sum: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int, sum_value: Double)

  /** Custom sessionization via flatMapGroupsWithState: a session closes
    * after `gapMs` of user inactivity — detected from event-time gaps in
    * arriving data, and (with `timeout = ProcessingTimeTimeout`) also by
    * wall-clock timeout for users that stop sending entirely. The state per
    * user is four scalars — bounded regardless of input volume.
    *
    * Note on timeouts: ProcessingTimeTimeout makes the engine schedule
    * continuous empty micro-batches to fire expirations — correct on a real
    * cluster, but it never quiesces under `processAllAvailable`, so tests
    * drive the NoTimeout variant.
    */
  def sessionize(events: Dataset[Event], gapMs: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout()): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start),
              new Timestamp(s.end), s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += Session(userId, new Timestamp(s.start),
                    new Timestamp(s.end), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (timeout == GroupStateTimeout.ProcessingTimeTimeout())
                state.setTimeoutDuration(gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
