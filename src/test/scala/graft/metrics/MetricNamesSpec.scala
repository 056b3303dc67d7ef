package graft.metrics

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Golden cases from churn_prediction_pipeline.py:537-541 (see FIXTURES.md §3). */
class MetricNamesSpec extends SparkSpec {
  import spark.implicits._

  private val golden = Seq(
    "Accuracy()" -> "accuracy",
    "F1Score(conf_matrix=True)" -> "f1score",
    "Precision()" -> "precision",
    "Recall()" -> "recall",
    "ValueDrift(column=age_group)" -> "valuedrift_age_group",
    "ValueDrift(column=subscription_length)" -> "valuedrift_subscription_length",
    "DriftedColumnsCount(drift_share=0.5)" -> "driftedcolumnscount",
    "F1ByLabel()" -> "f1bylabel"
  )

  test("driver-side simplify matches the reference's golden cases") {
    golden.foreach { case (in, out) => assert(MetricNames.simplify(in) == out, in) }
  }

  test("column-side simplifyCol agrees with driver-side simplify") {
    val df = golden.map(_._1).toDF("metric_id")
      .select(col("metric_id"), MetricNames.simplifyCol(col("metric_id")).as("simple"))
    df.collect().foreach { r =>
      assert(r.getString(1) == MetricNames.simplify(r.getString(0)), r.getString(0))
    }
  }

  test("flattenKey formats dict-flatten names") {
    assert(MetricNames.flattenKey("driftedcolumnscount", "share") == "driftedcolumnscount[share]")
    assert(MetricNames.flattenKey("driftedcolumnscount", "count") == "driftedcolumnscount[count]")
  }
}
