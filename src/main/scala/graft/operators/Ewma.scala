package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-key exponentially-weighted moving average — the smoother behind
  * "metric trending away from its EWMA" alerting on a monitoring page
  * (the W2 metric-time-series surface). EWMA is an inherently sequential
  * recurrence (ewma_t = α·x_t + (1−α)·ewma_{t−1}, seeded at x_0), so the
  * pow-weight rewrite Σ α(1−α)^(t−i)·x_i is numerically explosive for
  * long series ((1/(1−α))^t overflows) and engine-unportable (libm pow).
  * This operator instead runs the recurrence literally — the
  * q139/SequencePacking shape: one exchange on the key, external
  * sort-within-partitions on the order column, then a streaming
  * `mapPartitions` fold with O(1) state that resets at key boundaries.
  * Each step is two multiplies and an add on doubles in a deterministic
  * order, so an oracle replaying the same recurrence (recursive CTE)
  * matches bit-exactly — no float fuzz, no cast at the edge.
  *
  * At scale: the sort spills, a billion-row key streams through at sort
  * speed, and state is three scalars. Series per key must merely be
  * ordered, never resident.
  */
object Ewma {

  /** (keyCol, orderCol, valueCol, ewma) — ewma over each key's series in
    * `orderCol` order, seeded with the first value.
    */
  def perKey(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha $alpha not in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(orderCol).cast("long"),
        col(valueCol).cast("double"))
      .as[(String, Long, Double)]
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(orderCol))
      .mapPartitions { it =>
        var curKey: String = null
        var started = false
        var ewma = 0.0
        it.map { case (key, ord, x) =>
          if (!started || key != curKey) {
            curKey = key; started = true; ewma = x
          } else {
            ewma = alpha * x + (1 - alpha) * ewma
          }
          (key, ord, x, ewma)
        }
      }
      .toDF(keyCol, orderCol, valueCol, "ewma")
  }
}
