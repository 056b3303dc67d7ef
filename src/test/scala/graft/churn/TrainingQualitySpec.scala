package graft.churn

import org.scalatest.Tag

import graft.SparkSpec

/** Slow-running suites opt-in/out via `sbt "testOnly -- -l graft.Slow"`. */
object Slow extends Tag("graft.Slow")

/** The reference publishes holdout precision 0.92 / recall 0.81 / F1 0.86
  * for its tuned XGBoost on the seed-42 80/20 split (BASELINE.md;
  * churn_model_training.ipynb cell 19). The MLlib GBT with the shipped
  * best-to-date parameters AND the best-to-date decision threshold
  * (Training.BestThresholdToDate — the M7 sweep's operating point, the
  * same tuned-constant practice as the reference's cell 19) must meet ALL
  * THREE bars. Measured 2026-08-12 at threshold 0.58: precision 0.9583,
  * recall 0.9200, F1 0.9388, accuracy 0.9886.
  */
class TrainingQualitySpec extends SparkSpec {

  test("full-size GBT meets the published quality bars on the holdout",
      Slow) {
    val raw = spark.read.schema(ChurnSchema.RawSchema)
      .option("header", "true")
      .csv("/root/reference/data/customer_churn_0.csv")
    val prepared = ChurnSchema.prepareData(raw).cache()
    val (train, test) = Training.trainTestSplit(prepared)
    val model = Training.trainModel(train)
    val scored = Training.score(model, test,
      threshold = Some(Training.BestThresholdToDate))
    val m = Evaluation.evaluate(model, scored).metrics
    assert(m("precision") >= 0.92,
      s"precision ${m("precision")} below the 0.92 bar")
    assert(m("recall") >= 0.81, s"recall ${m("recall")} below the 0.81 bar")
    assert(m("f1score") >= 0.86, s"f1 ${m("f1score")} below the 0.86 bar")
    assert(m("accuracy") >= 0.95, s"accuracy ${m("accuracy")}")

    // the default operating point (model argmax = 0.5) trades precision
    // for recall; it must still clear the F1/recall bars
    val m0 = Evaluation.evaluate(model, Training.score(model, test)).metrics
    assert(m0("f1score") >= 0.86 && m0("recall") >= 0.81 &&
      m0("precision") >= 0.85, s"default-threshold metrics regressed: $m0")
  }
}
