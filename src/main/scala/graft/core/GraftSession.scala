package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's standard configuration.
  *
  * Defaults are chosen for correctness-at-scale first: UTC session time zone
  * (the reference stamps all metric timestamps in UTC,
  * churn_prediction_pipeline.py:509,521), adaptive query execution on (runtime
  * shuffle-partition coalescing + skew-join splitting), and a shuffle
  * partition count sized for the local test harness. On a real cluster the
  * caller overrides `shufflePartitions` (rule of thumb: 2-3x total cores, or
  * let AQE coalesce from a higher initial number).
  */
object GraftSession {

  /** Apply the engine's standard configs to any builder. */
  def configure(
      b: SparkSession.Builder,
      shufflePartitions: Int = 32
  ): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Broadcast anything under 32 MiB: the dimension tables (region,
      // nation, supplier, part metadata) stay broadcast-able even at large
      // scale factors, keeping fact-table joins shuffle-free on one side.
      .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      // The events table carries parquet TIMESTAMP(NANOS), which Spark's
      // vectorized reader rejects; read as long and rebuild a timestamp in
      // Tables.events (micros truncation).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Local session for tests and the bench/verify mains. */
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = configure(
      SparkSession
        .builder()
        .master(s"local[$cores]")
        .appName(appName),
      shufflePartitions = cores
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
