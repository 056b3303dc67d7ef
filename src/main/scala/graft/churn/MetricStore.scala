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

  // --- JDBC store (S7/S8/S9) --------------------------------------------
  // The reference's metric store is a Postgres table written with
  // df.write-style appends (churn_prediction_pipeline.py:78-84,529-530) and
  // read by Grafana over JDBC. Same surface here: DDL bootstrap on first
  // write, GRANT pass-through, append via df.write.jdbc. Exercised against
  // embedded Derby (on the Spark classpath) in MetricStoreSpec; the code
  // path is identical for any JDBC url + driver.

  /** S8: create the metric table if it does not exist (first-write DDL).
    * Unquoted identifiers so the engine's own case normalization applies —
    * Spark's JDBC reader/writer then resolves them case-insensitively.
    */
  def ensureJdbcTable(url: String,
      props: java.util.Properties = new java.util.Properties): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      var exists = false
      while (rs.next())
        if (rs.getString("TABLE_NAME").equalsIgnoreCase(TableName)) exists = true
      if (!exists)
        conn.createStatement().executeUpdate(
          s"CREATE TABLE $TableName (" +
            "metric_name VARCHAR(255), value DOUBLE, created_at TIMESTAMP)")
    } finally conn.close()
  }

  /** S9: statement pass-through for GRANT / custom DDL, the analog of the
    * reference's post-bootstrap `GRANT SELECT ... TO grafana` statements
    * (churn_prediction_pipeline.py:797-801).
    */
  def executeJdbcStatements(url: String, statements: Seq[String],
      props: java.util.Properties = new java.util.Properties): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      statements.foreach(st.executeUpdate)
    } finally conn.close()
  }

  /** S7: append metric rows over JDBC (bootstraps the table first). The
    * frame is a handful of rows per pipeline run — single-partition write.
    */
  def appendJdbc(df: DataFrame, url: String,
      props: java.util.Properties = new java.util.Properties): Unit = {
    ensureJdbcTable(url, props)
    df.coalesce(1).write.mode("append").jdbc(url, TableName, props)
  }

  /** Register the JDBC-backed store as the `drift_metrics` view, so W1/W2
    * and the 22 dashboard queries run unchanged against it.
    */
  def registerJdbcView(spark: SparkSession, url: String,
      props: java.util.Properties = new java.util.Properties): Unit =
    spark.read.jdbc(url, TableName, props).createOrReplaceTempView(TableName)

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
