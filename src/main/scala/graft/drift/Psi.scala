package graft.drift

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Population Stability Index (SURVEY.md §2.4 A10 family): the industry-
  * standard scalar drift score for a model input or score column — the
  * number every churn-model monitoring dashboard alarms on (PSI < 0.1
  * stable, 0.1–0.25 moderate shift, > 0.25 action). Same J2 current-vs-
  * reference shape as KsTest/ChiSquared (churn_prediction_pipeline.py:
  * 322,417-423 consumes drift per column); PSI complements them: KS is
  * rank-based and saturates, chi² needs categories — PSI is the binned,
  * magnitude-carrying score practitioners track over time.
  *
  *   PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref)
  *
  * with proportions floored at `eps` so empty bins contribute a finite,
  * deterministic penalty (the standard practical convention).
  *
  * Plan shape: one min/max aggregate to fix the bin grid, then ONE grouped
  * aggregate collapsing the input to `bins` rows — per-bin math is pure
  * arithmetic on exact integer counts, so the per-bin contributions are
  * bit-deterministic; the cumulative PSI is an ordered running sum over the
  * bounded bin frame (single light task by construction). At 100 TB the
  * cost is the two scans; nothing downstream exceeds `bins` rows.
  */
object Psi {

  /** Per-bin PSI table between rows where `isCurrent` holds (current
    * sample) and the rest (reference). Returns one row per occupied
    * fixed-width bin: (bin, n_cur, n_ref, contribution, psi_cum) — the
    * last psi_cum is the headline PSI. The running sum is windowed over
    * the ordered bounded bin frame, so its value is order-deterministic
    * (engine-portable), unlike a free-order float total.
    */
  def binned(df: DataFrame, valueCol: String, isCurrent: Column,
      bins: Int = 10, eps: Double = 1e-6): DataFrame = {
    val totals = binCounts(df, valueCol, isCurrent, bins)
    val pCur = greatest(col("n_cur").cast("double") / col("t_cur"), lit(eps))
    val pRef = greatest(col("n_ref").cast("double") / col("t_ref"), lit(eps))
    val contrib = (pCur - pRef) * log(pCur / pRef)
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ln() is libm-dependent (JVM intrinsic vs the oracle's C library can
    // differ in the last double ulp) — float32-cast the transcendental
    // outputs, the house parity rule for accumulated/inexact values. The
    // running sum accumulates the FULL-precision doubles in bin order
    // (deterministic), rounding only at the edge.
    totals
      .withColumn("__c", contrib)
      .withColumn("contribution", col("__c").cast("float"))
      .withColumn("psi_cum", sum(col("__c")).over(wCum).cast("float"))
      .select(col("bin"), col("n_cur"), col("n_ref"),
        col("contribution"), col("psi_cum"))
  }

  /** Weight-of-Evidence encoding table + Information Value — the classic
    * credit/churn-scoring feature transform (Siddiqi 2006): per bin,
    * WOE = ln((pos_b/pos_tot)/(neg_b/neg_tot)) is the encoded value a
    * feature pipeline substitutes for the raw bin, and the running
    * IV = Σ (p_pos − p_neg)·WOE scores the feature's predictive power
    * (IV > 0.3 strong). Same binning, clamping and float32-edge rules as
    * `binned` — WOE is literally the PSI log term with (current,
    * reference) = (positives, negatives).
    */
  def woeTable(df: DataFrame, valueCol: String, isPositive: Column,
      bins: Int = 10, eps: Double = 1e-6): DataFrame = {
    val totals = binCounts(df, valueCol, isPositive, bins)
      .withColumnRenamed("n_cur", "n_pos").withColumnRenamed("n_ref", "n_neg")
    val pPos = greatest(col("n_pos").cast("double") / col("t_cur"), lit(eps))
    val pNeg = greatest(col("n_neg").cast("double") / col("t_ref"), lit(eps))
    val woe = log(pPos / pNeg)
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    totals
      .withColumn("__w", woe)
      .withColumn("__ivc", (pPos - pNeg) * col("__w"))
      .withColumn("woe", col("__w").cast("float"))
      .withColumn("iv_cum", sum(col("__ivc")).over(wCum).cast("float"))
      .select(col("bin"), col("n_pos"), col("n_neg"), col("woe"),
        col("iv_cum"))
  }

  /** Shared binning: per fixed-width bin, side counts plus side totals. */
  private def binCounts(df: DataFrame, valueCol: String, isCurrent: Column,
      bins: Int): DataFrame = {
    val v = col(valueCol)
    val bounds = df.agg(
      min(v.cast("double")).as("lo"), max(v.cast("double")).as("hi")).first()
    val lo = bounds.getDouble(0)
    val hi = bounds.getDouble(1)
    val width = if (hi > lo) (hi - lo) / bins else 1.0
    val bin = least(floor((v.cast("double") - lit(lo)) / lit(width)),
      lit(bins - 1L)).cast("long")
    val perBin = df.groupBy(bin.as("bin")).agg(
      sum(when(isCurrent, 1L).otherwise(0L)).as("n_cur"),
      sum(when(isCurrent, 0L).otherwise(1L)).as("n_ref"))
    val w = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    perBin
      .withColumn("t_cur", sum(col("n_cur")).over(w))
      .withColumn("t_ref", sum(col("n_ref")).over(w))
  }
}
