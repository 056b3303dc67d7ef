package graft.churn

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.metrics.MetricNames

/** The drift_metrics metric store (SURVEY.md §1.1, §2.1 S7/S8): an
  * append-only (metric_name, value, created_at) table, Parquet-backed here
  * (JDBC in the reference, churn_prediction_pipeline.py:78-84,529-530 — the
  * write path is `df.write.mode("append")` either way).
  *
  * Also carries the 22 Grafana dashboard queries (SURVEY.md §3.3) verbatim,
  * runnable through `spark.sql` against the registered view — Spark SQL is a
  * first-class entry point of the engine.
  */
object MetricStore {

  val TableName = "drift_metrics"

  /** parse_and_save_drift_metrics (churn_prediction_pipeline.py:488-530):
    * scalar metrics keep their simplified name; dict values flatten to
    * `name[key]` rows; anything else is skipped.
    */
  def toRows(spark: SparkSession, report: Seq[ReportMetric],
      createdAt: Timestamp): DataFrame = {
    import spark.implicits._
    val rows = report.flatMap { m =>
      val simple = MetricNames.simplify(m.metricId)
      m.scalar.map(v => (simple, v, createdAt)).toSeq ++
        m.dict.toSeq.sortBy(_._1).map { case (k, v) =>
          (MetricNames.flattenKey(simple, k), v, createdAt)
        }
    }
    rows.toDF("metric_name", "value", "created_at")
  }

  /** Append to the Parquet-backed store (S7; DDL-on-first-write = S8). */
  def append(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Register the store as the `drift_metrics` view (SURVEY.md §3.3). */
  def registerView(spark: SparkSession, path: String): Unit =
    spark.read.parquet(path).createOrReplaceTempView(TableName)

  /** W1: latest value for one metric. */
  def latestValue(spark: SparkSession, metricName: String): DataFrame =
    spark.table(TableName)
      .filter(col("metric_name") === metricName)
      .orderBy(col("created_at").desc)
      .select("value")
      .limit(1)

  /** W2: full time series for one metric. */
  def series(spark: SparkSession, metricName: String): DataFrame =
    spark.table(TableName)
      .filter(col("metric_name") === metricName)
      .orderBy("created_at")
      .select("created_at", "value")

  /** The 22 dashboard rawSql texts (SURVEY.md §3.3; grafana dashboard
    * churn-model-evaluation.json), normalized only in line endings. The
    * p-value rename uses a double-quoted identifier — Spark needs
    * `spark.sql.ansi.doubleQuotedIdentifiers=true` for verbatim execution
    * (see runDashboardQuery).
    */
  val scoreMetrics: Seq[String] = Seq("f1score", "precision", "recall", "accuracy")
  val seriesMetrics: Seq[String] = scoreMetrics ++
    Seq("driftedcolumnscount[count]", "driftedcolumnscount[share]")
  val pValueMetrics: Seq[String] = Seq(
    "valuedrift_churn", "valuedrift_age_group", "valuedrift_call_failure",
    "valuedrift_charge_amount", "valuedrift_complains",
    "valuedrift_customer_value", "valuedrift_distinct_called_numbers",
    "valuedrift_frequency_of_sms", "valuedrift_frequency_of_use",
    "valuedrift_seconds_of_use", "valuedrift_status",
    "valuedrift_subscription_length")

  def dashboardQueries: Seq[String] =
    scoreMetrics.map(m =>
      s"select value \nfrom drift_metrics \nwhere metric_name = '$m'\norder by created_at \ndesc limit 1") ++
      seriesMetrics.map(m =>
        s"select created_at, value\nfrom drift_metrics \nwhere metric_name = '$m'\norder by created_at") ++
      pValueMetrics.map(m =>
        "select created_at, value as \"p-value\"\nfrom drift_metrics \n" +
          s"where metric_name = '$m'\norder by created_at")

  /** Run one dashboard query verbatim (double-quoted identifiers enabled for
    * the duration, restoring the previous setting).
    */
  def runDashboardQuery(spark: SparkSession, sql: String): DataFrame = {
    val key = "spark.sql.ansi.doubleQuotedIdentifiers"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try spark.sql(sql)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
