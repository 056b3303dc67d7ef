package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sketch aggregation (SURVEY.md §2.11 × the §2.10 sketch
  * family): per-window heavy hitters and quantile sketches over an event
  * stream — the streaming face of the batch `heavy_hitters` /
  * `kll_quantiles` aggregates (q56/q57/q62/q63).
  *
  * Scale design: both aggregates are mergeable `TypedImperativeAggregate`s,
  * so Structured Streaming treats them like any built-in — partial
  * aggregation map-side, merge in the state store, O(capacity)/O(k) bytes
  * of state per open window. The watermark bounds open windows; append
  * mode emits each window exactly once when it closes. Identical plans run
  * on batch frames (Spark's unified semantics), which is how the spec
  * cross-checks the streaming output against the batch aggregate.
  */
object SketchStreams {

  /** Tumbling-window Space-Saving heavy hitters over `itemCol`: one row
    * per (closed window, rank) with the sketch's (cnt, err) bounds, top
    * `k` items per window by estimate (ties to the item). The top-k cut is
    * an expression-level `array_sort` + `slice` over the ≤capacity tracked
    * items — window-rank functions are not allowed downstream of a
    * streaming aggregate, and the array form needs no second shuffle.
    */
  def windowedHeavyHitters(events: DataFrame, itemCol: String,
      windowLen: String, watermark: String, k: Int,
      capacity: Int = 256): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, SpaceSavingAgg}
    val hh = Bridge.column(
      SpaceSavingAgg(Bridge.expression(col(itemCol)), capacity)
        .toAggregateExpression())
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(hh.as("items"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        posexplode(expr(
          s"""slice(array_sort(items, (a, b) ->
             |  CASE WHEN a.cnt > b.cnt THEN -1 WHEN a.cnt < b.cnt THEN 1
             |       WHEN a.item < b.item THEN -1 WHEN a.item > b.item THEN 1
             |       ELSE 0 END), 1, $k)""".stripMargin)).as(Seq("pos", "it")))
      .select(col("window_start"), col("window_end"),
        (col("pos") + 1).cast("long").as("rank"),
        col("it.item").as("item"), col("it.cnt").as("cnt"),
        col("it.err").as("err"))
  }

  /** Tumbling-window KLL quantiles of `valueCol`: one row per closed
    * window with the requested quantile values.
    */
  def windowedQuantiles(events: DataFrame, valueCol: String,
      windowLen: String, watermark: String, qs: Seq[(String, Double)],
      kllK: Int = 4096): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, KllSketchAgg}
    val sk = Bridge.column(
      KllSketchAgg(Bridge.expression(col(valueCol)), k = kllK,
        qs = qs.map(_._2)).toAggregateExpression())
    val base = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(sk.as("q"))
      .select(col("window.start").as("window_start") +:
        col("window.end").as("window_end") +:
        qs.zipWithIndex.map { case ((name, _), i) =>
          col("q")(i).as(name) }: _*)
    base
  }
}
