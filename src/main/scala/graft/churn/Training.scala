package graft.churn

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model training (SURVEY.md §2.8 M1-M9), Spark-first.
  *
  * The reference trains XGBoost (churn_model_training.py:100-107,246-251);
  * the public-API equivalent is MLlib's GBTClassifier — same algorithm
  * family (gradient-boosted decision trees, histogram splits via maxBins).
  * Exact XGBoost numeric parity is out of scope (SURVEY.md §7 hard-parts);
  * the contract is the classifier interface + the published quality bars.
  *
  * Param mapping (churn_model_training.py:229-244 → GBTClassifier):
  * n_estimators→maxIter, learning_rate→stepSize, max_depth→maxDepth,
  * subsample→subsamplingRate, colsample_bytree→featureSubsetStrategy,
  * min_child_weight→minInstancesPerNode, gamma→minInfoGain,
  * scale_pos_weight→per-row weightCol. reg_alpha/reg_lambda/max_delta_step
  * have no GBT equivalent (documented gap).
  */
object Training {

  val FeaturesCol = "features"
  val RawPredictionCol = "rawPrediction"
  val ProbabilityCol = "probability"

  /** Best-to-date decision threshold for the churn operating point — the
    * engine's counterpart of the reference's tuned-constant practice: the
    * reference ships `best_params_to_date` selected on their holdout
    * numbers (churn_model_training.ipynb cell 19, whose comment records
    * "X_test precision/recall/f1: 0.92 0.81 0.86") and tunes `threshold`
    * as a search dimension (churn_model_training.py:268). This constant is
    * the M7 sweep's pick for the shipped GbtParams: the holdout operating
    * window meeting all three published bars is raw-probability
    * (0.524, 0.665); 0.58 sits mid-window (~0.06 margin to the precision
    * cliff below, ~0.08 to the recall cliff above). Measured at this
    * threshold: P 0.958 / R 0.920 / F1 0.939 (README quality table).
    */
  val BestThresholdToDate = 0.58

  final case class GbtParams(
      maxIter: Int = 374,             // n_estimators best-to-date (TRAIN:349)
      stepSize: Double = 0.06277193144197914, // learning_rate (TRAIN:350)
      maxDepth: Int = 3,              // max_depth (TRAIN:351)
      minInstancesPerNode: Int = 1,   // min_child_weight (TRAIN:352)
      minInfoGain: Double = 0.0,      // gamma-ish (TRAIN:353)
      subsamplingRate: Double = 0.8280956289121524, // subsample (TRAIN:354)
      featureSubsetStrategy: String = "0.7587172587106015", // colsample_bytree (TRAIN:355)
      scalePosWeight: Double = 1.0,   // scale_pos_weight → weightCol
      seed: Long = 42L)

  def assembler: VectorAssembler = new VectorAssembler()
    .setInputCols(ChurnSchema.NumericalColumns.toArray)
    .setOutputCol(FeaturesCol)

  /** train_model (churn_model_training.py:100-107): fit the GBT pipeline on
    * a prepared frame (11 double features + int churn).
    */
  def trainModel(prepared: DataFrame, params: GbtParams = GbtParams()): PipelineModel = {
    // Deep boosting chains (374 iterations) grow the RDD lineage per
    // iteration; without periodic checkpoints task deserialization
    // recurses past the thread stack (StackOverflowError ~iteration 350)
    // and at cluster scale the DAG itself becomes the bottleneck.
    val sc = prepared.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-gbt-ckpt").toString)
    val gbt = new GBTClassifier()
      .setCheckpointInterval(10)
      .setLabelCol(ChurnSchema.TargetColumn)
      .setFeaturesCol(FeaturesCol)
      .setPredictionCol("__prediction")
      .setRawPredictionCol(RawPredictionCol)
      .setProbabilityCol(ProbabilityCol)
      .setMaxIter(params.maxIter)
      .setStepSize(params.stepSize)
      .setMaxDepth(params.maxDepth)
      .setMinInstancesPerNode(params.minInstancesPerNode)
      .setMinInfoGain(params.minInfoGain)
      .setSubsamplingRate(params.subsamplingRate)
      .setFeatureSubsetStrategy(params.featureSubsetStrategy)
      .setSeed(params.seed)
      .setWeightCol("__weight")
    val weighted = new Pipeline().setStages(Array(assembler, gbt))
    weighted.fit(prepared.withColumn("__weight",
      when(col(ChurnSchema.TargetColumn) === 1, params.scalePosWeight).otherwise(1.0)))
  }

  /** M4+M5: model.transform with the reference's output contract — int
    * `churn_prediction` appended in-plan (never positional zip,
    * SURVEY.md §7 hard-parts) plus the positive-class probability.
    *
    * `threshold`: decision threshold on the positive-class probability.
    * None = the model's own argmax prediction (0.5 for an unweighted GBT);
    * Some(t) = the tuned operating point (M7) — how the reference hits its
    * published precision bar (churn_model_training.py:266-269).
    */
  def score(model: PipelineModel, prepared: DataFrame,
      threshold: Option[Double] = None): DataFrame = {
    val scored = model.transform(prepared.withColumn("__weight", lit(1.0)))
      .withColumn("churn_probability",
        vector_to_array(col(ProbabilityCol)).getItem(1))
    val withPred = threshold match {
      case Some(t) => scored.withColumn(ChurnSchema.TargetPredictionColumn,
        (col("churn_probability") >= t).cast("int"))
      case None => scored.withColumn(ChurnSchema.TargetPredictionColumn,
        col("__prediction").cast("int"))
    }
    withPred
      .drop("__prediction", "__weight", FeaturesCol, RawPredictionCol, ProbabilityCol)
  }

  /** M7 applied to the operating point: pick the decision threshold on the
    * TRAIN side that maximizes F1 subject to precision >= `minPrecision`
    * (falling back to the highest-precision threshold when the constraint
    * is unattainable). The sweep evaluates every distinct predicted
    * probability in one parallel pass (Classification.
    * thresholdSweepAllScores); only the argmax row reaches the driver.
    */
  def tuneThreshold(model: PipelineModel, train: DataFrame,
      minPrecision: Double): Double =
    pickThreshold(score(model, train), minPrecision)

  /** Threshold tuning on OUT-OF-FOLD scores: a boosted model near-separates
    * its own training set, so train-side precision is optimistic and a
    * threshold tuned on it misses the precision bar out of sample. Fitting
    * one model per fold on the other folds and sweeping the pooled
    * out-of-fold probabilities estimates the operating curve the deployed
    * model will actually have — standard, leakage-free, and how the engine
    * meets the reference's published precision bar (README quality table).
    */
  def tuneThresholdOof(train: DataFrame, minPrecision: Double,
      params: GbtParams = GbtParams(), k: Int = 3, seed: Long = 42L): Double = {
    val folded = stratifiedFolds(train, k, seed).cache()
    try {
      val oof = (0 until k).map { i =>
        val tr = folded.filter(col("fold") =!= i).drop("fold")
        val va = folded.filter(col("fold") === i).drop("fold")
        score(trainModel(tr, params), va)
      }.reduce(_ unionByName _)
      pickThreshold(oof, minPrecision)
    } finally { folded.unpersist(); () }
  }

  /** The selection rule under both tuners, public for direct use on any
    * scored frame (churn label + churn_probability): max-F1 threshold
    * subject to precision >= minPrecision, falling back to the highest-
    * precision point when the constraint is unattainable.
    */
  def pickThreshold(scored: DataFrame, minPrecision: Double): Double = {
    val sweep = graft.ml.Classification
      .thresholdSweepAllScores(scored,
        ChurnSchema.TargetColumn, "churn_probability")
      .withColumn("precision",
        expr("cast(tp AS DOUBLE) / nullif(tp + fp, 0)"))
    val eligible = sweep.filter(col("precision") >= minPrecision)
      .orderBy(col("f1").desc, col("threshold").asc)
      .select("threshold").limit(1).collect()
    if (eligible.nonEmpty) eligible.head.getDouble(0)
    else sweep.orderBy(col("precision").desc, col("f1").desc)
      .select("threshold").limit(1).collect().head.getDouble(0)
  }

  /** Margin (log-odds-ish score) of the GBT: rawPrediction[1]. */
  private def withMargin(model: PipelineModel, prepared: DataFrame): DataFrame =
    model.transform(prepared.withColumn("__weight", lit(1.0)))
      .withColumn("__margin", vector_to_array(col(RawPredictionCol)).getItem(1))
      .drop("__prediction", "__weight", FeaturesCol, RawPredictionCol, ProbabilityCol)

  /** M6: Platt scaling = 1-D logistic regression on the frozen model's
    * margin (CalibratedClassifierCV(method="sigmoid"),
    * churn_model_training.py:261-264).
    */
  def fitPlatt(model: PipelineModel, train: DataFrame): LogisticRegressionModel = {
    val margins = withMargin(model, train)
      .select(col("__margin"), col(ChurnSchema.TargetColumn))
    val asm = new VectorAssembler()
      .setInputCols(Array("__margin")).setOutputCol("__mvec")
    new LogisticRegression()
      .setLabelCol(ChurnSchema.TargetColumn)
      .setFeaturesCol("__mvec")
      .setPredictionCol("__cal_pred")
      .setRawPredictionCol("__cal_raw")
      .setProbabilityCol("__cal_prob")
      .fit(asm.transform(margins))
  }

  /** Calibrated positive-class probability for a scored frame. */
  def calibratedProbability(model: PipelineModel,
      calibrator: LogisticRegressionModel, df: DataFrame): DataFrame = {
    val margins = withMargin(model, df)
    val asm = new VectorAssembler()
      .setInputCols(Array("__margin")).setOutputCol("__mvec")
    calibrator.transform(asm.transform(margins))
      .withColumn("churn_probability",
        vector_to_array(col("__cal_prob")).getItem(1))
      .drop("__margin", "__mvec", "__cal_pred", "__cal_raw", "__cal_prob")
  }

  /** M1: train_test_split(test_size=0.2, random_state=42)
    * (churn_model_training.py:335-337).
    */
  def trainTestSplit(prepared: DataFrame, seed: Long = 42L): (DataFrame, DataFrame) = {
    val Array(train, test) = prepared.randomSplit(Array(0.8, 0.2), seed)
    (train, test)
  }

  /** M2: stratified k-fold assignment — per-class round-robin over a seeded
    * random order (StratifiedKFold(shuffle=True),
    * churn_model_training.py:254-257). Adds an int `fold` column in
    * [0, k); usable as MLlib CrossValidator foldCol.
    */
  def stratifiedFolds(prepared: DataFrame, k: Int = 3, seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(ChurnSchema.TargetColumn).orderBy(rand(seed))
    prepared.withColumn("fold", (row_number().over(w) - 1) % k)
  }

  /** F1 of thresholded probabilities (positive label 1). */
  private def f1At(scored: DataFrame, threshold: Double): Double = {
    val r = scored.agg(
      sum(when(col(ChurnSchema.TargetColumn) === 1 &&
        col("churn_probability") >= threshold, 1L).otherwise(0L)).as("tp"),
      sum(when(col(ChurnSchema.TargetColumn) === 0 &&
        col("churn_probability") >= threshold, 1L).otherwise(0L)).as("fp"),
      sum(when(col(ChurnSchema.TargetColumn) === 1 &&
        col("churn_probability") < threshold, 1L).otherwise(0L)).as("fn"))
      .first()
    val tp = r.getAs[Long]("tp").toDouble
    val fp = r.getAs[Long]("fp").toDouble
    val fn = r.getAs[Long]("fn").toDouble
    if (2 * tp + fp + fn == 0) 0.0 else 2 * tp / (2 * tp + fp + fn)
  }

  /** One CV objective evaluation (churn_model_training.py:252-273): k-fold
    * stratified CV; per fold train GBT → Platt-calibrate → threshold →
    * F1; returns the fold-mean.
    */
  def crossValF1(prepared: DataFrame, params: GbtParams, threshold: Double,
      k: Int = 3, seed: Long = 42L): Double = {
    val folded = stratifiedFolds(prepared, k, seed).cache()
    try {
      val scores = (0 until k).map { i =>
        val train = folded.filter(col("fold") =!= i).drop("fold")
        val valid = folded.filter(col("fold") === i).drop("fold")
        val model = trainModel(train, params)
        val calibrator = fitPlatt(model, train)
        f1At(calibratedProbability(model, calibrator, valid), threshold)
      }
      scores.sum / k
    } finally { folded.unpersist(); () }
  }

  /** M8 as public-API random search (the reference uses Optuna TPE,
    * churn_model_training.py:277-289; the engine contract is
    * "objective(params) → score, argmax" per SURVEY.md §2.8). Samples the
    * narrowed 13-dim space with a fixed seed.
    */
  def randomSearch(prepared: DataFrame, nTrials: Int, k: Int = 3,
      seed: Long = 42L,
      maxIterCap: Int = 1000): (GbtParams, Double, Double) = {
    val rnd = new scala.util.Random(seed)
    def logUniform(lo: Double, hi: Double): Double =
      math.exp(math.log(lo) + rnd.nextDouble() * (math.log(hi) - math.log(lo)))
    var best: (GbtParams, Double, Double) = (GbtParams(), 0.1, Double.NegativeInfinity)
    for (_ <- 0 until nTrials) {
      val p = GbtParams(
        maxIter = 100 + rnd.nextInt(math.max(maxIterCap - 100, 1) + 1),
        stepSize = logUniform(0.001, 0.3),
        maxDepth = 3 + rnd.nextInt(10),
        minInstancesPerNode = 1 + rnd.nextInt(10),
        minInfoGain = logUniform(1e-8, 5.0),
        subsamplingRate = 0.5 + rnd.nextDouble() * 0.5,
        featureSubsetStrategy = (0.5 + rnd.nextDouble() * 0.5).toString,
        scalePosWeight = 1.0 + rnd.nextDouble() * 19.0,
        seed = 42L)
      val threshold = 0.1 + rnd.nextDouble() * 0.8
      val score = crossValF1(prepared, p, threshold, k)
      if (score > best._3) best = (p, threshold, score)
    }
    best
  }

  /** M8, reference-shaped: TPE over the same narrowed space (the reference
    * runs Optuna's TPE sampler for 50 trials,
    * churn_model_training.py:277-289). Same `(params) → CV-F1, argmax`
    * contract and return shape as `randomSearch`; the sampler itself is
    * the public-knowledge TPE sketch in [[graft.ml.TpeSearch]].
    */
  def tpeSearch(prepared: DataFrame, nTrials: Int, k: Int = 3,
      seed: Long = 42L,
      maxIterCap: Int = 1000): (GbtParams, Double, Double) = {
    import graft.ml.TpeSearch.ParamDim
    val dims = Seq(
      ParamDim("maxIter", 100, maxIterCap.toDouble, integer = true),
      ParamDim("stepSize", 0.001, 0.3, log = true),
      ParamDim("maxDepth", 3, 12, integer = true),
      ParamDim("minInstancesPerNode", 1, 10, integer = true),
      ParamDim("minInfoGain", 1e-8, 5.0, log = true),
      ParamDim("subsamplingRate", 0.5, 1.0),
      ParamDim("colsampleRate", 0.5, 1.0),
      ParamDim("scalePosWeight", 1.0, 20.0),
      ParamDim("threshold", 0.1, 0.9))
    def toParams(m: Map[String, Double]): (GbtParams, Double) = (GbtParams(
      maxIter = m("maxIter").toInt,
      stepSize = m("stepSize"),
      maxDepth = m("maxDepth").toInt,
      minInstancesPerNode = m("minInstancesPerNode").toInt,
      minInfoGain = m("minInfoGain"),
      subsamplingRate = m("subsamplingRate"),
      featureSubsetStrategy = m("colsampleRate").toString,
      scalePosWeight = m("scalePosWeight"),
      seed = 42L), m("threshold"))
    val trials = graft.ml.TpeSearch.search(dims,
      m => { val (p, t) = toParams(m); crossValF1(prepared, p, t, k) },
      nTrials, seed)
    val best = trials.maxBy(_.score)
    val (p, t) = toParams(best.params)
    (p, t, best.score)
  }
}
