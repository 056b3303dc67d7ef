package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel conversion and retention-cohort analytics over an event stream —
  * the product-analytics companions of sessionization (operators.Sessionize).
  *
  * All time math is exact integer microseconds: `unix_micros` + the SQL
  * `div` operator (integral division — `/` on longs is double division in
  * Spark, and a quotient landing within an ulp of the next integer would
  * truncate wrong). Results are bit-deterministic and SQL-replayable.
  * Shapes: funnel = one groupBy(user) with conditional-min partials + one
  * groupBy(cohort) — two shuffles, both map-side combined; retention = one
  * linear chain: a per-user aggregate carrying (cohort week, distinct
  * active-week set), exploded to offsets and counted per cohort — two
  * shuffles, no join. Nothing is windowed over a global order and nothing
  * collects.
  */
object Funnel {

  private val DayUs = 86400000000L

  private def us(tsCol: String): Column = graft.core.Tables.epochUs(col(tsCol))

  /** Per-user first-touch times of the two funnel steps: (user_id, from_us,
    * to_us) with nulls where the step never happened.
    */
  def firstTouch(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, fromStep: String, toStep: String): DataFrame =
    events.groupBy(col(userCol).as("user_id"))
      .agg(
        min(when(col(typeCol) === fromStep, us(tsCol))).as("from_us"),
        min(when(col(typeCol) === toStep, us(tsCol))).as("to_us"))

  /** Daily-cohort funnel conversion: for users whose first `fromStep` lands
    * on a given day, the share whose first `toStep` follows within
    * `windowMicros`. Returns (cohort_day, n_entered, n_converted,
    * conversion_rate) — cohort_day = epoch days as a plain integer (no
    * engine-specific date casting).
    */
  def conversionByCohort(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, fromStep: String, toStep: String,
      windowMicros: Long): DataFrame = {
    val ft = firstTouch(events, userCol, tsCol, typeCol, fromStep, toStep)
      .filter(col("from_us").isNotNull)
      .select(
        expr(s"from_us div $DayUs").as("cohort_day"),
        when(col("to_us").isNotNull && col("to_us") > col("from_us") &&
          col("to_us") - col("from_us") <= windowMicros, 1L)
          .otherwise(0L).as("conv"))
    ft.groupBy("cohort_day")
      .agg(count(lit(1)).as("n_entered"),
        sum(col("conv")).as("n_converted"),
        (sum(col("conv")).cast("double") / count(lit(1))).as("conversion_rate"))
  }

  /** Weekly retention cohorts: users grouped by first-activity week; wN =
    * distinct users of the cohort active N weeks after their first week.
    * `horizon` controls how many offsets are emitted (w0..w{horizon}).
    */
  def weeklyRetention(events: DataFrame, userCol: String, tsCol: String,
      horizon: Int = 3): DataFrame = {
    require(horizon >= 0 && horizon <= 12, "retention horizon 0..12")
    val weekUs = 7L * DayUs
    // ONE linear chain, no join: the per-user aggregate carries BOTH the
    // cohort week (min) and the distinct active-week set — after it, each
    // (user, week) exists at most once, so the per-cohort distinct-user
    // counts become plain conditional counts on the exploded offsets. Two
    // exchanges total (user grain, cohort grain) vs the previous
    // first-touch ⋈ distinct-actives shape's three plus a join build. The
    // per-user set is bounded by calendar weeks, never by event volume.
    val perUser = events
      .select(col(userCol).as("user_id"), us(tsCol).as("t_us"))
      .select(col("user_id"), expr(s"t_us div $weekUs").as("w"))
      .groupBy("user_id")
      .agg(min(col("w")).as("cohort_week"), collect_set(col("w")).as("ws"))
    val counts = (0 to horizon).map(k =>
      count(when(col("k") === k, lit(1))).as(s"w$k"))
    perUser.select(col("cohort_week"), explode(col("ws")).as("w"))
      .select(col("cohort_week"), (col("w") - col("cohort_week")).as("k"))
      .groupBy("cohort_week").agg(counts.head, counts.tail: _*)
  }
}
