package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.drift.{KsTest, SketchKs}

/** Streaming drift monitoring (SURVEY.md §2.11 × §4.3): per-window
  * distribution sketches over an event stream, scored for drift against a
  * static reference distribution each micro-batch.
  *
  * Scale design: the per-window state is ONE mergeable histogram sketch
  * (≤ maxBins bins — HistogramSketchAgg partial-aggregates map-side like
  * any built-in), the watermark bounds the number of open windows, and the
  * drift decision consumes only the tiny sketch rows — the same
  * report-granularity the batch DriftReport collects. Works identically on
  * batch frames (Spark's unified semantics), which is how the spec
  * cross-checks streaming output.
  */
object DriftStreams {

  /** Tumbling-window histogram sketches of `valueCol`: one row per closed
    * window carrying (window bounds, sketch bins, n). Append-mode safe —
    * windows emit once the watermark passes.
    */
  def windowedSketches(events: DataFrame, valueCol: String, windowLen: String,
      watermark: String, maxBins: Int = 256): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(
        SketchKs.histogramSketch(col(valueCol), maxBins).as("sketch"),
        count(col(valueCol)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("sketch"), col("n"))

  final case class WindowDrift(windowStart: Timestamp, windowEnd: Timestamp,
      n: Long, ksStat: Double, pValue: Double, drifted: Boolean)

  /** Score one (micro-)batch of sketch rows against the reference
    * distribution: KS D from the two sketch CDFs + asymptotic p-value.
    * Input rows are windows, not events — driver-size by construction.
    */
  def evaluate(sketchRows: DataFrame, reference: Seq[(Double, Long)],
      alpha: Double = 0.05): Seq[WindowDrift] = {
    val nRef = reference.map(_._2).sum
    sketchRows.collect().toSeq.map { r =>
      val bins = r.getAs[scala.collection.Seq[Row]]("sketch")
        .map(b => (b.getDouble(0), b.getLong(1))).toSeq
      val n = r.getAs[Long]("n")
      val d = SketchKs.ksFromHistograms(bins, reference)
      val p = KsTest.pValue(d, n, nRef)
      WindowDrift(r.getAs[Timestamp]("window_start"),
        r.getAs[Timestamp]("window_end"), n, d, p, p < alpha)
    }.sortBy(_.windowStart.getTime)
  }

  /** Build the reference sketch from a static frame (e.g. the registry's
    * reference data) — the stream-side comparand.
    */
  def referenceSketch(df: DataFrame, valueCol: String,
      maxBins: Int = 256): Seq[(Double, Long)] =
    df.agg(SketchKs.histogramSketch(col(valueCol), maxBins).as("sketch"))
      .first().getAs[scala.collection.Seq[Row]]("sketch")
      .map(b => (b.getDouble(0), b.getLong(1))).toSeq
}
