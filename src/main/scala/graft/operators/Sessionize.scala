package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: group an entity's event stream into sessions
  * separated by more than `gapMicros` of inactivity. Batch analog of the
  * Structured Streaming session windows in `streaming/EventStreams`
  * (reference trigger cadence: one upload every 30 s,
  * upload_simulation_script.py:23-35 — session grouping is how that event
  * stream is analyzed after the fact).
  *
  * Scale notes: ONE shuffle on the session keys; the lag window and the
  * running-sum window share the same (keys, order) frame so Catalyst plans a
  * single sort under a single Window exec. Rows per key are bounded by
  * per-entity activity (a user's events), never by table size — the 100 TB
  * shape (billions of keys x thousands of events each) partitions evenly and
  * there is no global window anywhere. Gap arithmetic is exact integer
  * microseconds (`unix_micros`), so session assignment is deterministic and
  * replayable across engines.
  */
object Sessionize {

  /** Adds `session_id` (1-based, per key, in time order): a new session
    * starts when the gap from the key's previous event exceeds `gapMicros`.
    * `tieBreakCol` totalizes the order when timestamps collide, keeping the
    * assignment deterministic.
    */
  def byGap(df: DataFrame, keys: Seq[String], tsCol: String,
            tieBreakCol: String, gapMicros: Long): DataFrame = {
    require(keys.nonEmpty, "sessionization needs at least one key")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieBreakCol))
    val tus = graft.core.Tables.epochUs(col(tsCol))
    val prev = lag(tus, 1).over(w)
    df.withColumn("__new_session",
        when(prev.isNull || tus - prev > gapMicros, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("__new_session"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }

  /** Per-key session summary: session count, event count, and the longest /
    * total session durations in exact integer microseconds. Two grouped
    * aggregates over the `byGap` output — the first collapses to session
    * grain (already co-partitioned by the window shuffle, so it is
    * shuffle-free), the second to key grain.
    */
  def stats(df: DataFrame, keys: Seq[String], tsCol: String,
            tieBreakCol: String, gapMicros: Long): DataFrame = {
    val keyCols = keys.map(col)
    val perSession = byGap(df, keys, tsCol, tieBreakCol, gapMicros)
      .groupBy(keyCols :+ col("session_id"): _*)
      .agg(
        count(lit(1)).as("n_ev"),
        (max(graft.core.Tables.epochUs(col(tsCol))) -
          min(graft.core.Tables.epochUs(col(tsCol)))).as("dur_us"))
    perSession.groupBy(keyCols: _*)
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_ev")).as("n_events"),
        max(col("dur_us")).as("longest_session_us"),
        sum(col("dur_us")).as("total_session_us"))
  }
}
