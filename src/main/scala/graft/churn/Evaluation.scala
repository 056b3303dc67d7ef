package graft.churn

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.classification.GBTClassificationModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ml.Classification

/** Model evaluation suite (SURVEY.md §2.8 M10): the engine-native
  * equivalent of `mlflow.models.evaluate(model_type="classifier")`
  * (churn_model_training.py:144-168) — headline scores, log-loss, ROC/PR
  * AUC, confusion counts, calibration and lift tables, and feature
  * importances (the public-API stand-in for SHAP, SURVEY.md §7
  * hard-parts).
  *
  * Everything is one or two conditional-aggregation passes over the scored
  * frame; curve tables group by probability decile, so their size is fixed
  * regardless of input rows.
  */
object Evaluation {

  final case class EvalResult(
      metrics: Map[String, Double],
      confusion: Seq[(Int, Int, Long)],
      calibration: DataFrame,
      lift: DataFrame,
      featureImportances: Seq[(String, Double)])

  /** Probability-decile table shared by calibration and lift. */
  private def deciles(scored: DataFrame): DataFrame = {
    val d = least(floor(col("churn_probability") * 10), lit(9)).cast("int")
    scored.groupBy(d.as("decile")).agg(
      count(lit(1)).as("n"),
      avg(col("churn_probability")).as("avg_predicted"),
      avg(col(ChurnSchema.TargetColumn).cast("double")).as("avg_actual"))
  }

  /** Evaluate a scored frame (churn + churn_prediction + churn_probability
    * columns, as produced by Training.score).
    */
  def evaluate(model: PipelineModel, scored: DataFrame): EvalResult = {
    val stats = Classification.binaryStats(scored,
      ChurnSchema.TargetColumn, ChurnSchema.TargetPredictionColumn).first()
    val tp = stats.getAs[Long]("tp").toDouble
    val fp = stats.getAs[Long]("fp").toDouble
    val fn = stats.getAs[Long]("fn").toDouble
    val tn = stats.getAs[Long]("tn").toDouble
    val n = tp + fp + fn + tn

    val logLoss = Classification.logLoss(scored,
      ChurnSchema.TargetColumn, "churn_probability").first().getDouble(0)

    // ROC/PR AUC from the probability column (MLlib binary metrics)
    val evaluator = new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
      .setLabelCol(ChurnSchema.TargetColumn)
      .setRawPredictionCol("churn_probability")
    val rocAuc = evaluator.setMetricName("areaUnderROC").evaluate(scored)
    val prAuc = evaluator.setMetricName("areaUnderPR").evaluate(scored)

    val confusion = Classification.confusionCounts(scored,
        ChurnSchema.TargetColumn, ChurnSchema.TargetPredictionColumn)
      .collect().map(r => (r.getAs[Int]("label"),
        r.getAs[Int]("prediction"), r.getAs[Long]("n"))).toSeq.sorted

    val dec = deciles(scored)
    val overallRate = (tp + fn) / math.max(n, 1.0)
    val lift = dec.withColumn("lift",
      col("avg_actual") / lit(math.max(overallRate, 1e-12)))

    // feature importances: GBT split-gain importances, the SHAP stand-in
    val importances = model.stages.collectFirst {
      case m: GBTClassificationModel =>
        ChurnSchema.NumericalColumns.zip(m.featureImportances.toArray)
    }.getOrElse(Seq.empty)

    EvalResult(
      metrics = Map(
        "accuracy" -> (tp + tn) / math.max(n, 1.0),
        "precision" -> (if (tp + fp == 0) 0.0 else tp / (tp + fp)),
        "recall" -> (if (tp + fn == 0) 0.0 else tp / (tp + fn)),
        "f1score" -> (if (2 * tp + fp + fn == 0) 0.0 else 2 * tp / (2 * tp + fp + fn)),
        "log_loss" -> logLoss,
        "roc_auc" -> rocAuc,
        "pr_auc" -> prAuc),
      confusion = confusion,
      calibration = dec.orderBy("decile"),
      lift = lift.orderBy("decile"),
      featureImportances = importances)
  }

  /** Permutation feature importance — the honest distributed stand-in for
    * the reference's SHAP artifacts (churn_model_training.py:137-142; SHAP
    * itself has no public Spark API). For each feature, permute its column
    * uniformly at random (breaking the feature↔label association), rescore,
    * and report the F1 drop vs the unpermuted baseline — model-agnostic,
    * public-knowledge (Breiman 2001).
    *
    * Scale shape: the permutation is two fully parallel ParallelRank
    * row-numbers over independent random orders joined on rank — no global
    * single-task sort, no driver materialization. Cost is one rescored scan
    * per feature by construction (any permutation importance is); run it as
    * a diagnostic job, not in a hot path.
    */
  def permutationImportance(model: PipelineModel, prepared: DataFrame,
      features: Seq[String] = ChurnSchema.NumericalColumns,
      seed: Long = 42L): Seq[(String, Double)] = {
    def f1Of(df: DataFrame): Double = {
      val s = Classification.binaryStats(Training.score(model, df),
        ChurnSchema.TargetColumn, ChurnSchema.TargetPredictionColumn).first()
      val tp = s.getAs[Long]("tp").toDouble
      val fp = s.getAs[Long]("fp").toDouble
      val fn = s.getAs[Long]("fn").toDouble
      if (2 * tp + fp + fn == 0) 0.0 else 2 * tp / (2 * tp + fp + fn)
    }
    val base = f1Of(prepared)
    features.map { f =>
      f -> (base - f1Of(permuteColumn(prepared, f, seed)))
    }
  }

  /** Per-ROW feature contribution estimates — the row-level SHAP-artifact
    * stand-in (churn_model_training.py:137-142; SHAP has no public Spark
    * API). Interventional single-feature effects: for row x and feature j,
    *
    *   phi_j(x) = f(x) − E_b[ f(x with x_j ← b_j) ]
    *
    * with the expectation over a small background sample b — the
    * marginal/interventional formulation (public knowledge: Breiman's
    * permutation logic applied row-wise; equals the Shapley value for the
    * single-feature coalition term). Positive phi = this row's value of j
    * pushes its score above the background-typical score.
    *
    * Scale shape: per feature, ONE model.transform over the frame with the
    * background values EXPLODED in-scan (B row-multiplication, no
    * crossJoin shuffle), then a slim (id, prob) aggregate — F features ×
    * B backgrounds cost F scans of B× rows by construction (inherent to
    * interventional sampling; run as a diagnostic job). The background
    * sample is collected once (nBackground rows) and inlined as literals.
    *
    * Output: (idCol, feature, phi) long-format, one row per input row per
    * feature.
    */
  def rowContributions(model: PipelineModel, prepared: DataFrame,
      idCol: String,
      features: Seq[String] = ChurnSchema.NumericalColumns,
      nBackground: Int = 16, seed: Long = 42L): DataFrame = {
    val bg = prepared.select(features.map(c => col(c).cast("double").as(c)): _*)
      .withColumn("__r", rand(seed)).orderBy(col("__r")).limit(nBackground)
      .drop("__r").collect()
    require(bg.nonEmpty, "rowContributions needs a non-empty background sample")
    val baseScored = Training.score(model, prepared)
      .select(col(idCol), col("churn_probability").as("__base"))
    val perFeature = features.zipWithIndex.map { case (f, i) =>
      val bvals = bg.map(_.getDouble(i))
      val variants = prepared
        .withColumn("__bv", explode(array(bvals.map(lit(_)): _*)))
        .withColumn(f, col("__bv")).drop("__bv")
      Training.score(model, variants)
        .groupBy(col(idCol))
        .agg(avg(col("churn_probability")).as("__cf"))
        .select(col(idCol), lit(f).as("feature"), col("__cf"))
    }
    perFeature.reduce(_ union _)
      .join(baseScored, idCol)
      .select(col(idCol), col("feature"),
        (col("__base") - col("__cf")).as("phi"))
  }

  /** Uniform random permutation of one column, every stage parallel: rank
    * the rows and (independently) the values over two random orders, then
    * join rank-to-rank.
    */
  private def permuteColumn(df: DataFrame, c: String, seed: Long): DataFrame = {
    val ranked = graft.operators.ParallelRank.rowNumber(
      df.withColumn("__po", rand(seed)), Nil, "__po", "__prn").drop("__po")
    val shuffled = graft.operators.ParallelRank.rowNumber(
      df.select(col(c).as("__pv")).withColumn("__po", rand(seed + 1)),
      Nil, "__po", "__prn")
      .select(col("__prn"), col("__pv"))
    ranked.drop(c).join(shuffled, "__prn")
      .withColumn(c, col("__pv"))
      .drop("__prn", "__pv")
  }

}
