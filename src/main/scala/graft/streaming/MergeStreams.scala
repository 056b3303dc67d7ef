package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC apply — the incremental sibling of `operators.Merge`
  * (batch upsert/delete): fold a continuously-arriving change log into the
  * CURRENT state of a keyed table, emitting one record per key per
  * micro-batch in which that key's current row actually changed (an
  * update-mode changelog a downstream sink compacts — the streaming half of
  * the lakehouse MERGE pattern).
  *
  * Ordering contract: changes carry a monotone per-key sequence number (the
  * CDC log offset); a change only applies if its `seq` exceeds the state's
  * — so late/reordered deliveries across micro-batches resolve exactly as
  * the log order, not arrival order. Deletes are ordinary changes (op "D"):
  * a tombstone with a newer seq supersedes any buffered update, and an
  * older update arriving after the tombstone is ignored — the same
  * delete-wins discipline as the batch operator, generalized to
  * per-key log order.
  *
  * State: one (seq, deleted, payload) record per LIVE key — bounded by
  * table cardinality, not stream length (the keyed-table invariant). For
  * retention-bounded tables, pass a ProcessingTimeTimeout and the handler
  * evicts silently on timeout (tests drive NoTimeout; see
  * FunnelStreams' note on processAllAvailable).
  */
object MergeStreams {

  /** One CDC record: op ∈ {"U" (upsert), "D" (delete)}. */
  final case class Change(key: Long, seq: Long, op: String, payload: String)

  final case class KeyState(seq: Long, deleted: Boolean, payload: String)

  /** Current-row changelog entry: `deleted = true` is a tombstone. */
  final case class TableRow(key: Long, seq: Long, deleted: Boolean,
      payload: String)

  def applyChanges(changes: Dataset[Change],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout())
      : Dataset[TableRow] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, TableRow](
        OutputMode.Update(), timeout) {
        (key: Long, rows: Iterator[Change], state: GroupState[KeyState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val entry = state.getOption
            var cur = entry
            // apply in log order; stale seqs (≤ current) never regress state
            rows.toSeq.sortBy(_.seq).foreach { c =>
              if (cur.forall(_.seq < c.seq))
                cur = Some(KeyState(c.seq, c.op == "D", c.payload))
            }
            cur match {
              case Some(st) if entry != cur =>
                state.update(st)
                Iterator.single(TableRow(key, st.seq, st.deleted, st.payload))
              case _ => Iterator.empty
            }
          }
      }
  }
}
