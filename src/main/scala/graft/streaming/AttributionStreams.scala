package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution — the incremental sibling of the batch
  * q114 operator (Temporal.scala): the moment a purchase lands, credit the
  * user's most recent non-purchase touch within the lookback window, or
  * "direct" when none qualifies.
  *
  * State per user is TWO scalars (last touch type + its timestamp) —
  * bounded regardless of event volume, the 100 TB streaming invariant; the
  * batch operator needs the full per-user history window, the stream folds
  * it away. Semantics are ingestion-ordered: within a micro-batch events
  * sort by (event time, event_id) exactly like the batch window, while a
  * cross-batch late-arriving touch cannot retroactively re-credit an
  * already-emitted purchase (append-mode streaming attribution's standard
  * contract; the batch operator is the reconciliation path).
  *
  * In production the state store is bounded in USERS via
  * `GroupStateTimeout.ProcessingTimeTimeout`. The timeout runs on
  * processing time while crediting uses event time, so losslessness holds
  * only when processing time tracks event time with bounded lag — set the
  * timeout to lookbackMs PLUS the allowed-lateness margin, or a purchase
  * still inside the event-time lookback arriving after the wall-clock
  * timeout would find its touch expired and be mis-credited as "direct".
  * Tests
  * drive NoTimeout because ProcessingTimeTimeout schedules continuous
  * empty micro-batches and never quiesces under `processAllAvailable`
  * (same note as FunnelStreams).
  */
object AttributionStreams {

  final case class TouchEvent(user_id: Long, event_id: Long, ts: Timestamp,
      event_type: String)
  final case class TouchState(touchType: String, touchMs: Long)
  final case class Attribution(user_id: Long, event_id: Long,
      purchase_ts: Timestamp, touch: String)

  /** One attribution record per purchase event, credited to the last
    * preceding non-purchase touch no older than `lookbackMs`, else
    * "direct". A purchase never updates the touch state (purchases don't
    * attribute to each other — same predicate as the batch CASE).
    */
  def lastTouch(events: Dataset[TouchEvent], lookbackMs: Long,
      purchaseType: String = "purchase",
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout())
      : Dataset[Attribution] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, Attribution](
        OutputMode.Append(), timeout) {
        (userId: Long, rows: Iterator[TouchEvent],
         state: GroupState[TouchState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val out = Seq.newBuilder[Attribution]
            sorted.foreach { e =>
              if (e.event_type == purchaseType) {
                val touch = cur
                  .filter(s => e.ts.getTime - s.touchMs <= lookbackMs)
                  .map(_.touchType).getOrElse("direct")
                out += Attribution(userId, e.event_id, e.ts, touch)
              } else cur = Some(TouchState(e.event_type, e.ts.getTime))
            }
            cur.foreach { s =>
              state.update(s)
              if (timeout == GroupStateTimeout.ProcessingTimeTimeout())
                state.setTimeoutDuration(lookbackMs)
            }
            out.result().iterator
          }
      }
  }
}
