package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact weighted quantiles per group, defined the distribution-function
  * way: wq(q) = the smallest value v whose cumulative weight (over all rows
  * with value ≤ v — RANGE tie semantics) reaches q of the group's total
  * weight. Thresholds are passed as exact rationals (num/den) and compared
  * as `cumw * den >= total * num`: when the weights are integral the whole
  * decision is integer arithmetic — no q*W float rounding can move a
  * boundary row, so the result is bit-identical across engines and
  * partitionings. (Plain quantiles are the weight ≡ 1 special case.)
  *
  * Scale: the cumulative weights come from `ParallelRank.runningSums` — a
  * range exchange on the value column plus per-partition window sums with
  * broadcast offsets, never a single sort task per group; per-group totals
  * are a map-side-combined aggregate broadcast back to the ranked rows
  * (group cardinality is bounded in every practical grouping — per-flag,
  * per-type, per-day; a billion-group shape would swap the broadcast for a
  * plain equi-join, which AQE does on its own if the totals frame grows).
  */
object WeightedQuantiles {

  /** @param qs (outputName, num, den) exact-rational quantile list,
    *           e.g. ("p50", 1, 2).
    */
  def byGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
      weight: Column, qs: Seq[(String, Int, Int)]): DataFrame = {
    val base = df.select(
      (groupCols.map(col) :+ col(valueCol) :+ weight.as("__w")): _*)
    val cum = ParallelRank.runningSums(base, groupCols, valueCol,
      Seq("__w"), Seq("__cw"))
    val tot = base.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__w")).as("__wtot"))
    val aggs = qs.map { case (name, num, den) =>
      min(when(col("__cw") * den >= col("__wtot") * num, col(valueCol)))
        .as(name)
    }
    cum.join(broadcast(tot), groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
