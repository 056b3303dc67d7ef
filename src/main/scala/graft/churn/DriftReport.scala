package graft.churn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.drift.{ChiSquared, KsTest}

/** One report metric: Evidently-style metric_id with a scalar or dict value
  * (churn_prediction_pipeline.py:412-423, 498-527).
  */
final case class ReportMetric(
    metricId: String,
    scalar: Option[Double] = None,
    dict: Map[String, Double] = Map.empty)

/** Drift + classification report (SURVEY.md §2.9 R1) — the Spark-native
  * equivalent of `Report([DataDriftPreset(), ClassificationPreset()])
  * .run(reference, current)` (churn_prediction_pipeline.py:299-326).
  *
  * Scale design: ALL per-column drift statistics are computed in ONE Spark
  * job — the 12 columns are melted into a tall (col_name, value, side)
  * frame, collapsed by (col_name, value) with per-side counts, then KS and
  * chi² statistics come from fully parallel running sums (ParallelRank)
  * over that collapsed frame. Cost is one shuffle of per-distinct-value
  * counts, independent of the number of columns and with no single-task
  * sort; the reference loops Evidently column-by-column in Python.
  *
  * Only the final per-column statistics (a dozen rows) and the 2×2 confusion
  * counts are collected — the same granularity the reference materializes as
  * its report dict.
  */
object DriftReport {

  val Alpha = 0.05
  /** Evidently-style stattest auto-selection: columns with at most this many
    * distinct values are tested with chi² (categorical-ish), the rest with
    * KS (SURVEY.md §2.4 A10).
    */
  val ChiSquareMaxCardinality = 5L

  /** Per-column two-sample drift over `cols`, in one Spark job.
    * Returns (col_name, stattest, statistic, p_value) driver-side.
    */
  def valueDriftAll(reference: DataFrame, current: DataFrame,
      cols: Seq[String]): Seq[(String, String, Double, Double)] = {
    val stackExpr = s"stack(${cols.size}, " +
      cols.map(c => s"'$c', cast(`$c` as double)").mkString(", ") +
      ") as (col_name, v)"
    val melted =
      reference.selectExpr(stackExpr).withColumn("is_cur", lit(false))
        .unionByName(current.selectExpr(stackExpr).withColumn("is_cur", lit(true)))

    val perValue = melted.groupBy(col("col_name"), col("v").as("v"))
      .agg(
        sum(when(col("is_cur"), 1L).otherwise(0L)).as("c_cur"),
        sum(when(not(col("is_cur")), 1L).otherwise(0L)).as("c_ref"))

    // Running CDFs via ParallelRank (no one-task-per-column window sort;
    // a continuous column's distinct-value frame is linear in row count);
    // per-column totals ride a broadcast join — perValue's shuffle is
    // shared across all three branches by ReuseExchange.
    val cum = graft.operators.ParallelRank.runningSums(
      perValue, Seq("col_name"), "v",
      Seq("c_cur", "c_ref"), Seq("cum_cur", "cum_ref"))
    val totals = perValue.groupBy(col("col_name")).agg(
      sum(col("c_cur")).as("n_cur"), sum(col("c_ref")).as("n_ref"))

    val enriched = cum
      .join(broadcast(totals), "col_name")
      .withColumn("col_tot", col("c_cur") + col("c_ref"))
      .withColumn("e_cur",
        col("col_tot").cast("double") * col("n_cur") / (col("n_cur") + col("n_ref")))
      .withColumn("e_ref",
        col("col_tot").cast("double") * col("n_ref") / (col("n_cur") + col("n_ref")))

    val stats = enriched.groupBy("col_name").agg(
      max(abs(col("cum_cur").cast("double") / col("n_cur")
        - col("cum_ref").cast("double") / col("n_ref"))).as("ks_d"),
      sum(pow(col("c_cur") - col("e_cur"), 2) / col("e_cur")
        + pow(col("c_ref") - col("e_ref"), 2) / col("e_ref")).as("chi2"),
      count(lit(1)).as("n_distinct"),
      max(col("n_cur")).as("n_cur"),
      max(col("n_ref")).as("n_ref"))
      .collect()

    cols.map { c =>
      val r = stats.find(_.getAs[String]("col_name") == c).getOrElse(
        throw new IllegalStateException(s"no drift stats for column $c"))
      val nDistinct = r.getAs[Long]("n_distinct")
      val nCur = r.getAs[Long]("n_cur")
      val nRef = r.getAs[Long]("n_ref")
      if (nDistinct <= ChiSquareMaxCardinality) {
        val stat = r.getAs[Double]("chi2")
        (c, "chi2", stat, ChiSquared.pValue(stat, nDistinct - 1))
      } else {
        val d = r.getAs[Double]("ks_d")
        (c, "ks", d, KsTest.pValue(d, nCur, nRef))
      }
    }
  }

  /** ClassificationPreset metrics on the current frame: the four headline
    * scores as `Name(...)`-style metric ids plus the per-label F1 dict —
    * exactly the ids the reference's parser dispatches on
    * (churn_prediction_pipeline.py:413,417,460,537-541).
    */
  def classificationMetrics(current: DataFrame): Seq[ReportMetric] = {
    val r = graft.ml.Classification
      .binaryStats(current, ChurnSchema.TargetColumn, ChurnSchema.TargetPredictionColumn)
      .first()
    val tp = r.getAs[Long]("tp").toDouble
    val fp = r.getAs[Long]("fp").toDouble
    val fn = r.getAs[Long]("fn").toDouble
    val tn = r.getAs[Long]("tn").toDouble
    val f1_1 = if (2 * tp + fp + fn == 0) 0.0 else 2 * tp / (2 * tp + fp + fn)
    val f1_0 = if (2 * tn + fn + fp == 0) 0.0 else 2 * tn / (2 * tn + fn + fp)
    Seq(
      ReportMetric("Accuracy()",
        scalar = Some((tp + tn) / math.max(tp + fp + fn + tn, 1.0))),
      ReportMetric("Precision()",
        scalar = Some(if (tp + fp == 0) 0.0 else tp / (tp + fp))),
      ReportMetric("Recall()",
        scalar = Some(if (tp + fn == 0) 0.0 else tp / (tp + fn))),
      ReportMetric("F1Score(conf_matrix=True)", scalar = Some(f1_1)),
      ReportMetric("F1ByLabel()", dict = Map("0" -> f1_0, "1" -> f1_1)))
  }

  /** Full report: classification metrics + per-column ValueDrift p-values +
    * DriftedColumnsCount — the row set parse_and_save_drift_metrics consumes.
    */
  def run(reference: DataFrame, current: DataFrame,
      driftColumns: Seq[String] = ChurnSchema.NumericalColumns :+ ChurnSchema.TargetColumn)
      : Seq[ReportMetric] = {
    val drift = valueDriftAll(reference, current, driftColumns)
    val valueDriftMetrics = drift.map { case (c, _, _, p) =>
      ReportMetric(s"ValueDrift(column=$c)", scalar = Some(p))
    }
    val nDrifted = drift.count(_._4 < Alpha)
    val driftedCount = ReportMetric("DriftedColumnsCount(drift_share=0.5)",
      dict = Map(
        "count" -> nDrifted.toDouble,
        "share" -> nDrifted.toDouble / driftColumns.size))
    classificationMetrics(current) ++ valueDriftMetrics :+ driftedCount
  }

  // --- Assessments (SURVEY.md §2.9 R3/R4) -------------------------------

  /** assess_data_drift (churn_prediction_pipeline.py:395-431): drifted iff
    * share > 0.5; drifted column list from ValueDrift ids with p < 0.05,
    * names extracted with the reference's split-parse.
    */
  def assessDataDrift(report: Seq[ReportMetric]): (Boolean, Int, Seq[String]) = {
    var isDrifted = false
    var numDrifted = 0
    val drifted = Seq.newBuilder[String]
    report.foreach { m =>
      if (m.metricId.startsWith("DriftedColumnsCount")) {
        isDrifted = m.dict("share") > 0.5
        numDrifted = m.dict("count").toInt
      } else if (m.metricId.startsWith("ValueDrift")) {
        if (m.scalar.exists(_ < Alpha)) {
          val columnName =
            m.metricId.split("\\(")(1).split("=")(1).stripSuffix(")")
          drifted += columnName
        }
      }
    }
    (isDrifted, numDrifted, drifted.result())
  }

  /** assess_prediction_scores (churn_prediction_pipeline.py:434-485):
    * any of F1Score/Precision/Recall/Accuracy below threshold, in that
    * check order.
    */
  def assessPredictionScores(report: Seq[ReportMetric],
      scoreThreshold: Double = 0.70): (Boolean, Int, Seq[(String, Double)]) = {
    val scoreNames = Seq("F1Score", "Precision", "Recall", "Accuracy")
    val below = for {
      score <- scoreNames
      m <- report
      if m.metricId.startsWith(s"$score(")
      v <- m.scalar
      if v < scoreThreshold
    } yield (score, v)
    (below.nonEmpty, below.size, below)
  }
}
