package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary-classification metric aggregates (SURVEY.md §2.4 A4–A9).
  *
  * Reference semantics: confusion-matrix-derived accuracy / precision /
  * recall / F1 with positive label 1 (churn_prediction_pipeline.py:452-470,
  * churn_model_training.py:271), per-label variants flattened to
  * `f1bylabel_<label>` rows (churn_prediction_pipeline.py:513-523), log-loss
  * (churn_model_training.py:156).
  *
  * Every metric here is ONE conditional-aggregation pass over the scored
  * DataFrame — a map-side partial aggregate shuffling four longs per
  * partition, no matter the input size. Nothing is collected; results are
  * returned as (tiny) DataFrames so they compose into metric-store appends.
  */
object Classification {

  /** Confusion matrix counts: one row per (label, prediction) pair. */
  def confusionCounts(df: DataFrame, labelCol: String, predCol: String): DataFrame =
    df.groupBy(
        col(labelCol).cast("int").as("label"),
        col(predCol).cast("int").as("prediction"))
      .agg(count(lit(1)).as("n"))

  /** Single-row tp/fp/fn/tn frame — the shared input of every derived
    * metric; computed in one pass with conditional sums.
    */
  def binaryStats(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val y = col(labelCol).cast("int")
    val p = col(predCol).cast("int")
    def n(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    df.agg(
      n(y === 1 && p === 1).as("tp"),
      n(y === 0 && p === 1).as("fp"),
      n(y === 1 && p === 0).as("fn"),
      n(y === 0 && p === 0).as("tn"))
  }

  /** Tall (metric_name, value) frame with the reference's four headline
    * scores, named exactly as the metric store expects
    * (churn_prediction_pipeline.py:537-541): accuracy, precision, recall,
    * f1score. All derived from exact integer counts, so values are
    * bit-deterministic.
    */
  def metrics(df: DataFrame, labelCol: String, predCol: String): DataFrame =
    binaryStats(df, labelCol, predCol).select(expr(
      """stack(4,
        |  'accuracy',  cast(tp + tn AS DOUBLE) / (tp + fp + fn + tn),
        |  'precision', cast(tp AS DOUBLE) / (tp + fp),
        |  'recall',    cast(tp AS DOUBLE) / (tp + fn),
        |  'f1score',   cast(2 * tp AS DOUBLE) / (2 * tp + fp + fn)
        |) AS (metric_name, value)""".stripMargin))

  /** Per-label F1 rows, flattened to `f1bylabel_<label>` names (the
    * dict-flatten operator, churn_prediction_pipeline.py:514-523).
    */
  def f1ByLabel(df: DataFrame, labelCol: String, predCol: String): DataFrame =
    binaryStats(df, labelCol, predCol).select(expr(
      // for label 0 the "positives" are the zeros: tp0 = tn, fp0 = fn, fn0 = fp
      """stack(2,
        |  'f1bylabel_0', cast(2 * tn AS DOUBLE) / (2 * tn + fn + fp),
        |  'f1bylabel_1', cast(2 * tp AS DOUBLE) / (2 * tp + fp + fn)
        |) AS (metric_name, value)""".stripMargin))

  /** Mean binary cross-entropy over a calibrated probability column
    * (churn_model_training.py:156). Clipping guards log(0) the same way
    * sklearn does (eps clip).
    */
  def logLoss(df: DataFrame, labelCol: String, probCol: String,
      eps: Double = 1e-15): DataFrame = {
    val y = col(labelCol).cast("double")
    val p = least(greatest(col(probCol), lit(eps)), lit(1 - eps))
    // n rides the same single aggregate (value stays column 0 for the
    // positional readers) — callers wanting (loss, n) never rescan.
    df.agg(avg(-(y * log(p) + (lit(1) - y) * log(lit(1) - p))).as("value"),
      count(lit(1)).as("n"))
  }

  /** F1 at each candidate decision threshold (SURVEY.md §2.8 M7). The
    * candidate list is tiny and rides a broadcast cross join, so cost is
    * |thresholds| conditional aggregates in one shuffle — no per-threshold
    * rescans of the input.
    */
  def thresholdSweep(df: DataFrame, labelCol: String, probCol: String,
      thresholds: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val t = broadcast(thresholds.toDF("threshold"))
    val y = col(labelCol).cast("int")
    val pred = (col(probCol) >= col("threshold")).cast("int")
    def n(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    df.crossJoin(t)
      .groupBy($"threshold")
      .agg(
        n(y === 1 && pred === 1).as("tp"),
        n(y === 0 && pred === 1).as("fp"),
        n(y === 1 && pred === 0).as("fn"))
      .withColumn("f1", expr("cast(2 * tp AS DOUBLE) / (2 * tp + fp + fn)"))
  }

  /** Scale path for threshold tuning: F1 at EVERY distinct probability value
    * in one pass — group by probability, then cumulative sums over the
    * (small) distinct-probability frame. Use when the candidate set is "all
    * observed scores" rather than a fixed grid.
    */
  def thresholdSweepAllScores(df: DataFrame, labelCol: String, probCol: String): DataFrame = {
    val byP = df.groupBy(col(probCol).as("threshold"))
      .agg(
        sum(col(labelCol).cast("long")).as("pos"),
        count(lit(1)).as("n"))
    // Descending cumulative counts: predicting positive iff prob >= t.
    // ParallelRank keeps every stage parallel even when score cardinality
    // is linear in row count; the positives total rides a broadcast cross
    // join on byP's shared shuffle instead of a separate full scan.
    val cum = graft.operators.ParallelRank.runningSums(
      byP, Nil, "threshold", Seq("pos", "n"), Seq("tp", "predicted_pos"),
      descending = true)
    val totals = byP.agg(sum(col("pos")).as("total_pos"))
    cum.crossJoin(broadcast(totals))
      .select(col("threshold"),
        col("tp"),
        (col("predicted_pos") - col("tp")).as("fp"),
        (col("total_pos") - col("tp")).as("fn"))
      .withColumn("f1", expr("cast(2 * tp AS DOUBLE) / (2 * tp + fp + fn)"))
  }
}
