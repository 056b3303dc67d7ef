package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD2: the type-2 dimension history of `TemporalOps.scd2History`
  * maintained incrementally over an event stream. Per-key state is THREE
  * scalars (current state string, its valid_from, its version ordinal) —
  * bounded regardless of stream length; every state CHANGE emits the closed
  * version as an append-mode row identical to the batch operator's
  * closed-interval rows (valid_to = the succeeding version's valid_from).
  *
  * Delivery contract: events must arrive in (ts, event_id) order PER KEY
  * across micro-batches (within a batch any order is fine — the handler
  * sorts). That is the same per-key-ordered contract the CDC apply stream
  * (MergeStreams) documents; [[TemporalStreams.scd2Late]] is the
  * bounded-lateness variant — it buffers a watermark horizon per key
  * before folding, trading state for reorder tolerance.
  */
object TemporalStreams {

  final case class StateEvent(user_id: Long, state: String, ts_us: Long,
      event_id: Long)
  final case class VersionState(state: String, validFrom: Long, version: Long)
  final case class ClosedVersion(user_id: Long, state: String, valid_from: Long,
      valid_to: Long, version: Long)
  final case class IntervalEvent(user_id: Long, ts_us: Long)
  final case class OpenIsland(start: Long, end: Long, island: Long)
  final case class ClosedIsland(user_id: Long, island: Long, start_us: Long,
      end_us: Long, len_us: Long)

  /** Closed SCD2 versions of the stream; the OPEN version per key lives in
    * the group state (queryable via the state store, emitted only when a
    * later state change closes it — append-mode semantics).
    */
  def scd2(events: Dataset[StateEvent]): Dataset[ClosedVersion] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[VersionState, ClosedVersion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[StateEvent],
            state: GroupState[VersionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
          val closed = Seq.newBuilder[ClosedVersion]
          var cur = state.getOption
          sorted.foreach { e =>
            cur match {
              case None =>
                cur = Some(VersionState(e.state, e.ts_us, 1L))
              case Some(v) if v.state != e.state =>
                closed += ClosedVersion(userId, v.state, v.validFrom,
                  e.ts_us, v.version)
                cur = Some(VersionState(e.state, e.ts_us, v.version + 1))
              case Some(_) => () // same state: the run extends, nothing closes
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  /** Bounded state for the late-tolerant fold: the open version plus the
    * reorder buffer of events not yet releasable by the watermark. The
    * buffer holds AT MOST the key's events inside the lateness horizon —
    * bounded by horizon × per-key rate, not by stream length.
    */
  final case class LateScd2State(pending: List[StateEvent],
      cur: Option[VersionState])

  /** `StateEvent` + the event-time column: the watermark attribute must
    * flow INTO the stateful operator (projecting it away severs the
    * watermark and `getCurrentWatermarkMs` throws), so the late fold
    * groups this wrapper and strips it on buffering. Public because
    * encoder codegen instantiates it from generated classes.
    */
  final case class WmStateEvent(user_id: Long, state: String,
      ts_us: Long, event_id: Long, ets: java.sql.Timestamp)

  /** Bounded-lateness SCD2: tolerates out-of-order delivery up to
    * `latenessMs` of event time, the relaxation `scd2`'s per-key-ordered
    * contract calls out. Buffer-and-reorder under the watermark: incoming
    * events append to a per-key pending buffer; each micro-batch folds —
    * in (ts, event_id) order — exactly the buffered events at or below
    * the current event-time watermark (Spark guarantees no later-arriving
    * event can precede them), and keeps the rest buffered. Closed
    * versions emit identically to `scd2` fed in order; an event arriving
    * later than the lateness bound is DROPPED with no effect on state
    * (the standard watermark contract — late data past the horizon is
    * excluded, never applied out of order).
    *
    * The watermark advances on the batch AFTER the max-event-time batch
    * commits (Spark computes it between micro-batches), so a quiesced
    * stream needs one more (possibly empty-effect) batch — or a
    * watermark-advancing heartbeat event — before the tail of the buffer
    * folds. Production deployments emit such heartbeats anyway to close
    * idle keys; the spec drives both shapes.
    */
  def scd2Late(events: Dataset[StateEvent],
      latenessMs: Long): Dataset[ClosedVersion] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ets", timestamp_micros(col("ts_us")))
      .withWatermark("ets", s"$latenessMs milliseconds")
      .as[WmStateEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LateScd2State, ClosedVersion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[WmStateEvent],
            state: GroupState[LateScd2State]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(LateScd2State(Nil, None))
          // an arrival already at/below the watermark is PAST the lateness
          // horizon — it could sort before history the fold already
          // emitted, so it drops (standard watermark exclusion); buffered
          // events reaching the watermark are releasable, no earlier
          // arrival is possible anymore
          val incoming = rows.filter(_.ts_us > wmUs)
            .map(e => StateEvent(e.user_id, e.state, e.ts_us, e.event_id))
            .toList
          val (ripe, hold) = (st.pending ++ incoming)
            .partition(_.ts_us <= wmUs)
          val closed = Seq.newBuilder[ClosedVersion]
          var cur = st.cur
          ripe.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            cur match {
              case None =>
                cur = Some(VersionState(e.state, e.ts_us, 1L))
              case Some(v) if v.state != e.state =>
                closed += ClosedVersion(userId, v.state, v.validFrom,
                  e.ts_us, v.version)
                cur = Some(VersionState(e.state, e.ts_us, v.version + 1))
              case Some(_) => ()
            }
          }
          state.update(LateScd2State(hold, cur))
          closed.result().iterator
      }
  }

  /** Streaming twin of `TemporalOps.intervalCoverage`'s island merge: each
    * event opens [ts, ts + durUs); overlapping or touching intervals extend
    * the open island; a gap closes it and emits the island as an
    * append-mode row (the open island stays in state — TWO longs + an
    * ordinal per key). Same per-key-ordered delivery contract as `scd2`.
    * Downstream per-key coverage totals are `sum(len_us)` over the emitted
    * islands plus the open one in the state store.
    */
  def intervalIslands(events: Dataset[IntervalEvent],
      durUs: Long): Dataset[ClosedIsland] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenIsland, ClosedIsland](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[IntervalEvent],
            state: GroupState[OpenIsland]) =>
          val sorted = rows.toSeq.sortBy(_.ts_us)
          val closed = Seq.newBuilder[ClosedIsland]
          var cur = state.getOption
          sorted.foreach { e =>
            val s = e.ts_us
            val en = e.ts_us + durUs
            cur match {
              case None => cur = Some(OpenIsland(s, en, 1L))
              case Some(o) if s <= o.end =>
                cur = Some(o.copy(end = math.max(o.end, en)))
              case Some(o) =>
                closed += ClosedIsland(userId, o.island, o.start, o.end,
                  o.end - o.start)
                cur = Some(OpenIsland(s, en, o.island + 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }
}
