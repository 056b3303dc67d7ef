package graft.churn

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

class MetricStoreSpec extends SparkSpec {

  private def sampleReport: Seq[ReportMetric] = Seq(
    ReportMetric("Accuracy()", scalar = Some(0.9)),
    ReportMetric("F1Score(conf_matrix=True)", scalar = Some(0.8)),
    ReportMetric("F1ByLabel()", dict = Map("0" -> 0.85, "1" -> 0.8)),
    ReportMetric("ValueDrift(column=age_group)", scalar = Some(0.03)),
    ReportMetric("DriftedColumnsCount(drift_share=0.5)",
      dict = Map("count" -> 1.0, "share" -> 1.0 / 12)))

  test("toRows flattens with the exact metric-name contract") {
    val df = MetricStore.toRows(spark, sampleReport, new Timestamp(1000L))
    val names = df.collect().map(_.getString(0)).toSeq
    assert(names == Seq(
      "accuracy", "f1score", "f1bylabel[0]", "f1bylabel[1]",
      "valuedrift_age_group",
      "driftedcolumnscount[count]", "driftedcolumnscount[share]"))
    assert(df.columns.toSeq == Seq("metric_name", "value", "created_at"))
  }

  test("JDBC store: DDL bootstrap + append + GRANT + W1/W2 + dashboard SQL") {
    val dir = Files.createTempDirectory("graft-derby")
    System.setProperty("derby.stream.error.file",
      dir.resolve("derby.log").toString)
    val db = dir.resolve("metricsdb").toString
    def conn(attrs: String) =
      java.sql.DriverManager.getConnection(s"jdbc:derby:$db$attrs")
    // create the db with SQL authorization so GRANT is a real statement
    val c0 = conn(";create=true")
    c0.createStatement().executeUpdate(
      "CALL SYSCS_UTIL.SYSCS_SET_DATABASE_PROPERTY(" +
        "'derby.database.sqlAuthorization', 'true')")
    c0.close()
    intercept[java.sql.SQLException](conn(";shutdown=true")) // reboot for the property
    val url = s"jdbc:derby:$db"

    // two appends with rising created_at (S7 + S8 first-write DDL)
    Seq(0.5, 0.7).zipWithIndex.foreach { case (v, i) =>
      val report = Seq(
        ReportMetric("F1Score(conf_matrix=True)", scalar = Some(v)),
        ReportMetric("DriftedColumnsCount(drift_share=0.5)",
          dict = Map("count" -> i.toDouble, "share" -> i / 12.0)))
      MetricStore.appendJdbc(
        MetricStore.toRows(spark, report, new Timestamp(1000L * (i + 1))), url)
    }
    // S9: GRANT pass-through, verified against the catalog
    MetricStore.executeJdbcStatements(url,
      Seq(s"GRANT SELECT ON ${MetricStore.TableName} TO grafana"))
    val cg = conn("")
    val rs = cg.createStatement().executeQuery(
      "SELECT COUNT(*) FROM SYS.SYSTABLEPERMS WHERE GRANTEE = 'GRAFANA'")
    rs.next()
    assert(rs.getInt(1) == 1, "GRANT not recorded in SYSTABLEPERMS")
    cg.close()

    // W1/W2 + a Grafana rawSql text against the JDBC-backed view
    MetricStore.registerJdbcView(spark, url)
    assert(MetricStore.latestValue(spark, "f1score").first().getDouble(0) == 0.7)
    assert(MetricStore.series(spark, "f1score").collect().map(_.getDouble(1))
      .toSeq == Seq(0.5, 0.7))
    val rows = MetricStore.runDashboardQuery(spark,
      MetricStore.dashboardQueries.head).collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(0.7))
  }

  test("pipeline-shaped JDBC append: metricAppend strategy round-trips") {
    val dir = Files.createTempDirectory("graft-derby2")
    val url = s"jdbc:derby:${dir.resolve("db")};create=true"
    // the strategy ChurnPipeline(metricAppend = ...) would receive
    val sink: org.apache.spark.sql.DataFrame => Unit =
      MetricStore.appendJdbc(_, url.stripSuffix(";create=true"))
    // first connection creates the db
    java.sql.DriverManager.getConnection(url).close()
    sink(MetricStore.toRows(spark, sampleReport, new Timestamp(5000L)))
    MetricStore.registerJdbcView(spark, url.stripSuffix(";create=true"))
    assert(MetricStore.latestValue(spark, "accuracy").first().getDouble(0) == 0.9)
  }

  test("append + view + all 22 dashboard queries run verbatim") {
    val path = Files.createTempDirectory("graft-metrics").toString + "/store"
    // three runs with increasing created_at; f1score rises so latest != first
    Seq(0.5, 0.6, 0.7).zipWithIndex.foreach { case (v, i) =>
      val report = Seq(
        ReportMetric("F1Score(conf_matrix=True)", scalar = Some(v)),
        ReportMetric("Precision()", scalar = Some(v + 0.1)),
        ReportMetric("Recall()", scalar = Some(v + 0.05)),
        ReportMetric("Accuracy()", scalar = Some(v + 0.2)),
        ReportMetric("DriftedColumnsCount(drift_share=0.5)",
          dict = Map("count" -> i.toDouble, "share" -> i / 12.0))) ++
        MetricStore.pValueMetrics.map { m =>
          val col = m.stripPrefix("valuedrift_")
          ReportMetric(s"ValueDrift(column=$col)", scalar = Some(0.5 - i * 0.1))
        }
      MetricStore.append(
        MetricStore.toRows(spark, report, new Timestamp(1000L * (i + 1))), path)
    }
    MetricStore.registerView(spark, path)

    // W1 semantics: latest f1score is the third run's 0.7
    assert(MetricStore.latestValue(spark, "f1score").first().getDouble(0) == 0.7)
    // W2 semantics: series in ascending created_at
    val series = MetricStore.series(spark, "f1score").collect().map(_.getDouble(1))
    assert(series.toSeq == Seq(0.5, 0.6, 0.7))

    // all 22 Grafana rawSql texts run verbatim through spark.sql
    val qs = MetricStore.dashboardQueries
    assert(qs.size == 22)
    qs.foreach { sql =>
      val rows = MetricStore.runDashboardQuery(spark, sql).collect()
      assert(rows.nonEmpty, s"no rows for: $sql")
    }
    // p-value rename resolves as a column name, not a string literal
    val pq = qs.last
    val df = MetricStore.runDashboardQuery(spark, pq)
    assert(df.columns.contains("p-value"))
  }
}
