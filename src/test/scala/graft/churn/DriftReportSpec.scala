package graft.churn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftReportSpec extends SparkSpec {

  /** Prepared churn frame (11 features + churn) with a synthetic
    * churn_prediction: predicts churn iff customer_value below its rough
    * median — deterministic, mixed-quality predictions.
    */
  private lazy val scored: DataFrame = {
    val raw = spark.read.schema(ChurnSchema.RawSchema)
      .option("header", "true")
      .csv("/root/reference/data/customer_churn_0.csv")
    ChurnSchema.prepareData(raw)
      .withColumn("churn_prediction",
        (col("customer_value") < 450).cast("int"))
      .cache()
  }

  test("no drift against itself: all p-values 1, nothing drifted") {
    val report = DriftReport.run(scored, scored)
    val vd = report.filter(_.metricId.startsWith("ValueDrift"))
    assert(vd.size == 12)
    assert(vd.forall(_.scalar.exists(_ > 0.99)))
    val (isDrifted, n, cols) = DriftReport.assessDataDrift(report)
    assert(!isDrifted && n == 0 && cols.isEmpty)
    val dcc = report.find(_.metricId.startsWith("DriftedColumnsCount")).get
    assert(dcc.dict("count") == 0.0 && dcc.dict("share") == 0.0)
  }

  test("shifted current drifts: shifted columns flagged, share computed") {
    val current = scored
      .withColumn("seconds_of_use", col("seconds_of_use") * 3 + 5000)
      .withColumn("customer_value", col("customer_value") * 2 + 1000)
    val report = DriftReport.run(scored, current)
    val byCol = report.filter(_.metricId.startsWith("ValueDrift"))
      .map(m => m.metricId -> m.scalar.get).toMap
    assert(byCol("ValueDrift(column=seconds_of_use)") < 0.05)
    assert(byCol("ValueDrift(column=customer_value)") < 0.05)
    assert(byCol("ValueDrift(column=complains)") > 0.05)
    val (_, n, cols) = DriftReport.assessDataDrift(report)
    assert(n >= 2 && cols.contains("seconds_of_use") && cols.contains("customer_value"))
  }

  test("classification metric ids and exact count-derived values") {
    val report = DriftReport.classificationMetrics(scored)
    val ids = report.map(_.metricId)
    assert(ids == Seq("Accuracy()", "Precision()", "Recall()",
      "F1Score(conf_matrix=True)", "F1ByLabel()"))
    val acc = report.head.scalar.get
    // cross-check against a direct aggregate
    val expected = scored.agg(
      avg((col("churn") === col("churn_prediction")).cast("double"))).first().getDouble(0)
    assert(acc == expected)
    val f1s = report.find(_.metricId == "F1ByLabel()").get.dict
    assert(f1s.keySet == Set("0", "1"))
  }

  test("stattest selection: binary columns chi2, continuous KS") {
    val drift = DriftReport.valueDriftAll(scored, scored,
      Seq("complains", "customer_value"))
    val byName = drift.map(d => d._1 -> d._2).toMap
    assert(byName("complains") == "chi2")
    assert(byName("customer_value") == "ks")
  }

  test("score assessment flags sub-threshold scores in check order") {
    val report = Seq(
      ReportMetric("Accuracy()", scalar = Some(0.70)),
      ReportMetric("Precision()", scalar = Some(0.50)),
      ReportMetric("Recall()", scalar = Some(0.90)),
      ReportMetric("F1Score(conf_matrix=True)", scalar = Some(0.60)))
    val (any, n, below) = DriftReport.assessPredictionScores(report, 0.70)
    assert(any && n == 2)
    // F1Score checked before Precision (reference order)
    assert(below == Seq("F1Score" -> 0.60, "Precision" -> 0.50))
  }

  test("alert strings match the reference templates") {
    val drift = Alerts.driftAlert("data/processing/file_1.csv", 2,
      Seq("age_group", "status"), "http://ui/report/1")
    assert(drift.subject == "Customer Data Drift Alert: 2 Column(s) Drifted")
    assert(drift.message ==
      "Majority of columns drifted from reference data in the latest run.\n\n" +
        "Filename: file_1.csv.\n\n" +
        "2 Column(s) Drifted:\n" +
        "- age_group\n" +
        "- status\n" +
        "\nPlease review the Evidently report at http://ui/report/1 and take necessary actions.")

    val scores = Alerts.scoresAlert("data/processing/file_1.csv", 1,
      Seq("F1Score" -> 0.612345))
    assert(scores.subject ==
      "Customer Prediction Scores Alert: 1 Score(s) Below Threshold")
    assert(scores.message ==
      "Predictions scored below threshold in the latest run.\n\n" +
        "Filename: file_1.csv.\n\n" +
        "1 Score(s) Below Threshold:\n" +
        "- F1Score: 0.612\n")
    assert(Alerts.decorateSubject(scores.subject).startsWith("🚨 "))
  }
}
