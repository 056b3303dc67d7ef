package graft.ml

import graft.SparkSpec

class ClassificationSpec extends SparkSpec {
  import spark.implicits._

  // tp=4, fp=2, fn=1, tn=3
  private def scored = (
    Seq.fill(4)((1, 1)) ++ Seq.fill(2)((0, 1)) ++
      Seq.fill(1)((1, 0)) ++ Seq.fill(3)((0, 0))
  ).toDF("label", "prediction")

  test("binaryStats counts the confusion quadrants exactly") {
    val r = Classification.binaryStats(scored, "label", "prediction").first()
    assert(r.getAs[Long]("tp") == 4)
    assert(r.getAs[Long]("fp") == 2)
    assert(r.getAs[Long]("fn") == 1)
    assert(r.getAs[Long]("tn") == 3)
  }

  test("headline metrics match hand-derived values and reference names") {
    val m = Classification.metrics(scored, "label", "prediction")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m.keySet == Set("accuracy", "precision", "recall", "f1score"))
    assert(math.abs(m("accuracy") - 0.7) < 1e-12)
    assert(math.abs(m("precision") - 4.0 / 6.0) < 1e-12)
    assert(math.abs(m("recall") - 0.8) < 1e-12)
    assert(math.abs(m("f1score") - 8.0 / 11.0) < 1e-12)
  }

  test("f1ByLabel flattens to f1bylabel_<label> rows") {
    val m = Classification.f1ByLabel(scored, "label", "prediction")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m.keySet == Set("f1bylabel_0", "f1bylabel_1"))
    assert(math.abs(m("f1bylabel_1") - 8.0 / 11.0) < 1e-12)
    // label 0 as positive: tp=3, fp=1, fn=2 → f1 = 6/9
    assert(math.abs(m("f1bylabel_0") - 6.0 / 9.0) < 1e-12)
  }

  test("logLoss matches hand-computed cross-entropy with eps clipping") {
    val df = Seq((1, 0.9), (0, 0.1), (1, 0.4), (0, 1.0)).toDF("label", "p")
    val v = Classification.logLoss(df, "label", "p").first().getDouble(0)
    // Mirror the engine's arithmetic exactly: clip then 1-p in doubles
    // (1 - (1 - 1e-15) is not bit-equal to 1e-15).
    val expected = Seq(
      -math.log(0.9), -math.log(1.0 - 0.1), -math.log(0.4),
      -math.log(1.0 - (1.0 - 1e-15))).sum / 4
    assert(math.abs(v - expected) < 1e-9)
  }

  test("threshold sweep agrees with the all-scores single-pass variant") {
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(500) {
      val p = rnd.nextDouble()
      (if (rnd.nextDouble() < p) 1 else 0, p)
    }.toDF("label", "p")
    val all = Classification.thresholdSweepAllScores(df, "label", "p")
      .collect().map(r => r.getAs[Double]("threshold") -> r.getAs[Double]("f1")).toMap
    val some = all.keys.take(20).toSeq
    val grid = Classification.thresholdSweep(df, "label", "p", some)
      .collect().map(r => r.getAs[Double]("threshold") -> r.getAs[Double]("f1")).toMap
    some.foreach { t => assert(math.abs(all(t) - grid(t)) < 1e-12, s"t=$t") }
  }

  test("confusionCounts covers all (label, prediction) pairs") {
    val m = Classification.confusionCounts(scored, "label", "prediction")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Long]("n")).toMap
    assert(m == Map((1, 1) -> 4L, (0, 1) -> 2L, (1, 0) -> 1L, (0, 0) -> 3L))
  }
}
