package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Temporal state/interval operators over keyed event streams: SCD2 history
  * construction, merged-interval coverage (gaps-and-islands), and
  * consecutive-day streaks. All three are single-exchange plans — every
  * window and aggregate partitions by the entity key, so one hash exchange
  * by key feeds the whole chain, and all time arithmetic is exact integer
  * microseconds (`Tables.epochUs`), bit-identical to a SQL replay.
  *
  * At scale the key cardinality (users, devices) is the parallelism unit;
  * no global sort or single-partition window appears anywhere, and the
  * per-key sorted runs are what Spark's window operator already spills.
  */
object TemporalOps {

  /** Type-2 slowly-changing-dimension history from an event log: collapse
    * each key's consecutive runs of equal `stateCol` (ordered by event time
    * with `tieCol` as deterministic tie-break) into versioned validity
    * intervals. Output: (key, state, valid_from, valid_to, version) —
    * valid_to is NULL for the open current version, version is the per-key
    * 1-based change ordinal.
    */
  def scd2History(df: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val byTime = Window.partitionBy(keyCol).orderBy(col("__ts"), col(tieCol))
    val run = Window.partitionBy(keyCol).orderBy(col("__ts"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = df
      .select(col(keyCol), col(stateCol), col(tieCol),
        Tables.epochUs(col(tsCol)).as("__ts"))
      .withColumn("__prev", lag(col(stateCol), 1).over(byTime))
      .withColumn("__chg",
        when(col("__prev").isNull || col("__prev") =!= col(stateCol), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("__chg")).over(run))
    val grouped = marked
      .groupBy(col(keyCol), col("version"))
      .agg(min(col(stateCol)).as("state"), min(col("__ts")).as("valid_from"))
    grouped
      .withColumn("valid_to",
        lead(col("valid_from"), 1)
          .over(Window.partitionBy(keyCol).orderBy(col("version"))))
      .select(col(keyCol), col("state"), col("valid_from"), col("valid_to"),
        col("version"))
  }

  /** Merged-interval coverage per key: each event opens the interval
    * [ts, ts + durUs); overlapping or touching-at-a-point intervals merge
    * (classic gaps-and-islands via the running max of interval ends).
    * Output: (key, n_islands, covered_us, longest_us).
    */
  def intervalCoverage(df: DataFrame, keyCol: String, tsCol: String,
      durUs: Long): DataFrame = {
    val ord = Window.partitionBy(keyCol).orderBy(col("__s"), col("__e"))
    val marked = df
      .select(col(keyCol), Tables.epochUs(col(tsCol)).as("__s"))
      .withColumn("__e", col("__s") + lit(durUs))
      .withColumn("__prev_max",
        max(col("__e")).over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__island",
        sum(when(col("__prev_max").isNull || col("__s") > col("__prev_max"), 1L)
          .otherwise(0L))
          .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked
      .groupBy(col(keyCol), col("__island"))
      .agg((max(col("__e")) - min(col("__s"))).as("__len"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("__len")).as("covered_us"),
        max(col("__len")).as("longest_us"))
  }

  /** Longest consecutive-day activity streak per key (calendar days in the
    * session time zone): the date-minus-row-number constant groups each
    * run of consecutive distinct days. Output: (key, streak, streak_start)
    * — streak in days, streak_start the first day of the earliest
    * longest run.
    */
  def streaks(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val days = df
      .select(col(keyCol), to_date(col(tsCol)).as("__d"))
      .distinct()
    val rn = row_number().over(Window.partitionBy(keyCol).orderBy(col("__d")))
    days
      .withColumn("__grp", date_sub(col("__d"), rn))
      .groupBy(col(keyCol), col("__grp"))
      .agg(count(lit(1)).as("__len"), min(col("__d")).as("__start"))
      // max length, earliest start among ties: one struct-min aggregate
      .groupBy(col(keyCol))
      .agg(min(struct((-col("__len")).as("n"), col("__start").as("s"))).as("__m"))
      .select(col(keyCol), (-col("__m.n")).as("streak"),
        col("__m.s").as("streak_start"))
  }
}
