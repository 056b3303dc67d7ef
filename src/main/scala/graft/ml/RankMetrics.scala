package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact rank-statistic metrics for binary scorers (SURVEY.md §2.8 M10 /
  * §2.4 A9): the distributed, bit-exact computation of ROC AUC — the
  * headline number `mlflow.models.evaluate` reports for a classifier
  * (churn_model_training.py:144-168). MLlib's
  * BinaryClassificationEvaluator approximates AUC on a 1000-bin curve and
  * is driver-opaque; this operator computes the EXACT Mann–Whitney
  * statistic with integer arithmetic, so the result is reproducible across
  * engines, partitionings and scales:
  *
  *   AUC = P(s⁺ > s⁻) + ½ P(s⁺ = s⁻)
  *       = Σ_s pos_s · (2·cumneg_<s + neg_s) / (2·nPos·nNeg)
  *
  * over distinct scores s ascending — the tie-midrank form of the
  * Wilcoxon rank-sum, summed exactly in decimal(38,0) (order-independent,
  * overflow-safe past 10^9×10^9 pairs), with ONE double division at the
  * edge.
  *
  * Plan shape: one grouped aggregate collapses the input to its distinct
  * scores (each carrying pos/neg counts); the cumulative negative count
  * comes from ParallelRank.runningSums — a range exchange plus broadcast
  * partition offsets, every stage parallel even for continuous scores
  * (same skeleton as KsTest). The numerator is a map-side-combined sum of
  * the bounded per-score products.
  */
object RankMetrics {

  /** Exact ROC AUC of `scoreCol` against binary `labelIsPos`.
    * Returns one row: (roc_auc double, n_pos, n_neg).
    */
  def rocAuc(df: DataFrame, scoreCol: String, labelIsPos: Column): DataFrame = {
    val perScore = df.groupBy(col(scoreCol).as("__s")).agg(
      sum(when(labelIsPos, 1L).otherwise(0L)).as("__pos"),
      sum(when(labelIsPos, 0L).otherwise(1L)).as("__neg"))
    val cum = graft.operators.ParallelRank.runningSums(
      perScore, Nil, "__s", Seq("__neg"), Seq("__cumneg"))
    val dec = DecimalType(38, 0)
    // pos·(2·cumneg_incl − neg) = pos·(2·cumneg_below + neg): beats-below
    // pairs twice plus ties once — decimal BEFORE the multiply so no
    // intermediate ever sees long overflow.
    val term = col("__pos").cast(dec) *
      (col("__cumneg").cast(dec) * 2 - col("__neg").cast(dec))
    cum.agg(
      sum(term).as("__num"),
      sum(col("__pos")).as("n_pos"),
      sum(col("__neg")).as("n_neg"))
      .select(
        (col("__num").cast("double") /
          (col("n_pos").cast("double") * col("n_neg") * 2.0)).as("roc_auc"),
        col("n_pos"), col("n_neg"))
  }
}
