package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Streaming exact deduplication — the ingestion-time counterpart of
  * `operators.Dedup.incrementalExact` (batch) for a continuously-arriving
  * document stream (builder brief §LLM-data: dedup belongs at ingest, before
  * anything expensive touches the row).
  *
  * Spark-first shape: `dropDuplicates` on the 16-byte md5 fingerprint —
  * Structured Streaming keeps the seen-key set in the state store, so the
  * raw text is neither shuffled nor retained.
  *
  *  - `dedupForever` keeps state for every fingerprint ever seen (exact,
  *    state grows with distinct-document count — right when the stream is
  *    bounded or dedup must be global);
  *  - `dedupWithinWatermark` bounds state with an event-time watermark
  *    (`dropDuplicatesWithinWatermark`): duplicates arriving within the
  *    watermark horizon are dropped, older state is evicted — the unbounded-
  *    stream shape, trading global exactness for bounded state (a late
  *    duplicate beyond the horizon re-admits; the periodic batch
  *    `incrementalExact` compaction catches those).
  */
object DedupStreams {

  /** Append a `fp` fingerprint column (16-byte md5 of the text column). */
  def withFingerprint(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))

  /** Exact global streaming dedup on content fingerprint. State: one
    * fingerprint per distinct document, forever.
    */
  def dedupForever(docs: DataFrame, textCol: String): DataFrame =
    withFingerprint(docs, textCol).dropDuplicates("fp")

  /** Watermark-bounded streaming dedup: drops duplicates whose fingerprint
    * was seen within the watermark horizon on `tsCol`; state is evicted
    * beyond it.
    */
  def dedupWithinWatermark(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String): DataFrame =
    withFingerprint(docs, textCol)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
}
