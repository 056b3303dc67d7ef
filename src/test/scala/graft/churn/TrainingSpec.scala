package graft.churn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrainingSpec extends SparkSpec {

  /** Fast test params: small forest, everything else best-to-date shape. */
  private val fastParams = Training.GbtParams(maxIter = 20)

  private lazy val prepared: DataFrame = {
    val raw = spark.read.schema(ChurnSchema.RawSchema)
      .option("header", "true")
      .csv("/root/reference/data/customer_churn_0.csv")
    ChurnSchema.prepareData(raw).cache()
  }

  test("pickThreshold: max-F1 under the precision constraint, with fallback") {
    val s = spark
    import s.implicits._
    // labels + probabilities constructed so precision varies by threshold:
    // probs .9/.8 are true positives, .7 a false positive, .6 a true
    // positive, .3/.2 negatives. Thresholds and their stats:
    //   t=.6: tp=3 fp=1 fn=0 -> P=.75  F1=.857
    //   t=.7: tp=2 fp=1 fn=1 -> P=.667 F1=.667
    //   t=.8: tp=2 fp=0 fn=1 -> P=1.0  F1=.8
    //   t=.9: tp=1 fp=0 fn=2 -> P=1.0  F1=.5
    val scored = Seq(
      (1, 0.9), (1, 0.8), (0, 0.7), (1, 0.6), (0, 0.3), (0, 0.2)
    ).toDF(ChurnSchema.TargetColumn, "churn_probability")
    // constraint satisfiable: best F1 among P >= 0.9 rows is t=0.8
    assert(Training.pickThreshold(scored, 0.9) == 0.8)
    // loose constraint: global F1 argmax t=0.6 qualifies (P=.75 >= .7)
    assert(Training.pickThreshold(scored, 0.7) == 0.6)
    // unattainable constraint (>1): falls back to max precision, best F1
    assert(Training.pickThreshold(scored, 1.1) == 0.8)
  }

  test("stratified folds: balanced sizes and per-class proportions") {
    val folded = Training.stratifiedFolds(prepared, k = 3, seed = 42L)
    val sizes = folded.groupBy("fold").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set(0, 1, 2))
    assert(sizes.values.max - sizes.values.min <= 2)
    // per-class round robin keeps each class's fold counts within 1
    val perClass = folded.groupBy("churn", "fold").count().collect()
      .groupBy(_.getInt(0)).values
    perClass.foreach { rows =>
      val counts = rows.map(_.getLong(2))
      assert(counts.max - counts.min <= 1)
    }
  }

  test("train/test split is deterministic at seed 42") {
    val (tr1, te1) = Training.trainTestSplit(prepared)
    val (tr2, te2) = Training.trainTestSplit(prepared)
    assert(tr1.count() == tr2.count() && te1.count() == te2.count())
    assert(tr1.count() + te1.count() == 1050)
  }

  test("GBT trains and beats the 0.70 score threshold in-sample") {
    val model = Training.trainModel(prepared, fastParams)
    val scored = Training.score(model, prepared)
    assert(scored.columns.contains("churn_prediction"))
    assert(scored.columns.contains("churn_probability"))
    assert(scored.schema("churn_prediction").dataType.typeName == "integer")
    val report = DriftReport.classificationMetrics(scored)
    val byId = report.flatMap(m => m.scalar.map(m.metricId -> _)).toMap
    // reference quality bars (in-sample, so comfortably above)
    assert(byId("Accuracy()") > 0.85, s"accuracy ${byId("Accuracy()")}")
    assert(byId("F1Score(conf_matrix=True)") > 0.70)
    // probability is a real probability
    val mm = scored.agg(min("churn_probability"), max("churn_probability")).first()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("Platt calibration yields monotone probabilities in [0,1]") {
    val model = Training.trainModel(prepared, fastParams)
    val calibrator = Training.fitPlatt(model, prepared)
    val cal = Training.calibratedProbability(model, calibrator, prepared)
    assert(cal.columns.contains("churn_probability"))
    val mm = cal.agg(min("churn_probability"), max("churn_probability")).first()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
    // calibrated probabilities separate the classes reasonably (AUC proxy):
    val meanByLabel = cal.groupBy("churn").agg(avg("churn_probability")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(meanByLabel(1) > meanByLabel(0))
  }

  test("crossValF1 returns a sane mean F1") {
    val f1 = Training.crossValF1(prepared,
      Training.GbtParams(maxIter = 10), threshold = 0.5)
    assert(f1 > 0.5 && f1 <= 1.0, s"cv f1 $f1")
  }
}
