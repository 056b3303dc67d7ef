package graft.drift

import org.apache.commons.math3.distribution.ChiSquaredDistribution
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-sample chi-squared homogeneity test (SURVEY.md §2.4 A10): Evidently's
  * stattest for low-cardinality ("categorical-ish") columns. Tests whether
  * the category distribution of the current sample matches the reference.
  *
  * Plan shape: one grouped aggregate to the (category × side) contingency
  * table — tiny by construction for a categorical column — then windowed
  * marginals over that table. Everything after the first aggregate is
  * dozens of rows regardless of input size.
  */
object ChiSquared {

  /** Pearson chi² statistic over the 2×k contingency table of `catCol`
    * split by `isCurrent`. Returns one row:
    * (chi2_stat, dof, n_current, n_reference).
    */
  def statistic(df: DataFrame, catCol: String, isCurrent: Column): DataFrame = {
    val obs = df.groupBy(col(catCol).as("cat"))
      .agg(
        sum(when(isCurrent, 1L).otherwise(0L)).as("o_cur"),
        sum(when(isCurrent, 0L).otherwise(1L)).as("o_ref"))
    // marginals via a broadcast cross join on obs' shared shuffle — not a
    // global window (single-partition by construction, even if harmless on
    // a contingency table this small)
    val totals = obs.agg(
      sum(col("o_cur")).as("n_cur"), sum(col("o_ref")).as("n_ref"))
    val withMarginals = obs.crossJoin(broadcast(totals))
      .withColumn("total", col("n_cur") + col("n_ref"))
      .withColumn("col_tot", col("o_cur") + col("o_ref"))
      .withColumn("e_cur",
        col("col_tot").cast("double") * col("n_cur") / col("total"))
      .withColumn("e_ref",
        col("col_tot").cast("double") * col("n_ref") / col("total"))
    withMarginals.agg(
      sum(
        pow(col("o_cur") - col("e_cur"), 2) / col("e_cur")
          + pow(col("o_ref") - col("e_ref"), 2) / col("e_ref")).as("chi2_stat"),
      (count(lit(1)) - 1).as("dof"),
      max(col("n_cur")).as("n_current"),
      max(col("n_ref")).as("n_reference"))
  }

  /** Upper-tail p-value of the chi² distribution with `dof` degrees of
    * freedom (commons-math3, which ships on the Spark classpath).
    */
  def pValue(stat: Double, dof: Long): Double = {
    if (dof <= 0) return 1.0
    if (stat <= 0) return 1.0
    1.0 - new ChiSquaredDistribution(dof.toDouble).cumulativeProbability(stat)
  }

  /** Driver-side convenience: statistic + p-value + drift decision. */
  def test(df: DataFrame, catCol: String, isCurrent: Column,
      alpha: Double = 0.05): ChiSquaredResult = {
    val r = statistic(df, catCol, isCurrent).first()
    val stat = r.getAs[Double]("chi2_stat")
    val dof = r.getAs[Long]("dof")
    val p = pValue(stat, dof)
    ChiSquaredResult(stat, p, dof,
      r.getAs[Long]("n_current"), r.getAs[Long]("n_reference"), p < alpha)
  }
}

final case class ChiSquaredResult(statistic: Double, pValue: Double, dof: Long,
    nCurrent: Long, nReference: Long, drifted: Boolean)
