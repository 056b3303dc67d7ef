package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.SubstringDedup

/** Streaming repeated-passage detection — the ingestion-time counterpart of
  * `operators.SubstringDedup` (batch): window hashes of arriving documents
  * probe a state-store index of every window hash seen so far; a re-occurring
  * hash emits a match against the hash's FIRST sighting. Contract mirrors
  * `DedupStreams.dedupForever`: the first occurrence of a passage streams
  * through unflagged (a stream cannot retract it), every later occurrence is
  * reported — so the match stream equals the batch operator's repeated
  * positions MINUS one first-sighting per distinct hash (the spec pins this
  * equation across micro-batch boundaries).
  *
  * State: ONE (long, int) first-sighting per distinct window hash — fixed
  * width, never text; the exchange carries (hash, id, pos) only. Unbounded
  * streams that cannot afford forever-state bound it the same way
  * `DedupStreams.dedupWithinWatermark` does — dedup at the horizon, with the
  * periodic batch pass catching what fell past it.
  */
object SubstrStreams {
  final case class WindowHit(id: Long, i: Int, h: Long)
  final case class FirstSeen(id: Long, i: Int)
  final case class PassageMatch(id: Long, i: Int, first_id: Long, first_i: Int)

  /** (id, i, h) window-hash stream for arriving documents — the streaming
    * side of `SubstringDedup.windowHashes` (same kernel, same hashes).
    */
  def windowHits(docs: DataFrame, idCol: String, textCol: String,
      minLen: Int = 10): Dataset[WindowHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    SubstringDedup.windowHashes(docs, idCol, textCol, minLen)
      .as[WindowHit]
  }

  /** Match stream: every window whose hash was already in the index gets a
    * row pointing at the hash's first sighting. Within one micro-batch the
    * (id, i)-minimal occurrence claims an unseen hash and the rest match
    * against it — the same total order a batch replay would pick.
    */
  def matches(hits: Dataset[WindowHit]): Dataset[PassageMatch] = {
    val spark = hits.sparkSession
    import spark.implicits._
    hits
      .groupByKey(_.h)
      .flatMapGroupsWithState[FirstSeen, PassageMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[WindowHit], state: GroupState[FirstSeen]) =>
          val sorted = rows.toSeq.sortBy(r => (r.id, r.i))
          val out = Seq.newBuilder[PassageMatch]
          var first = state.getOption
          sorted.foreach { r =>
            first match {
              case None => first = Some(FirstSeen(r.id, r.i))
              case Some(f) => out += PassageMatch(r.id, r.i, f.id, f.i)
            }
          }
          first.foreach(state.update)
          out.result().iterator
      }
  }
}
