package graft.churn

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Outcome of one pipeline run over one file (observable contract of
  * churn_prediction_pipeline.py:813-905).
  */
final case class PipelineResult(
    status: String, // "processed" | "errored" | "skipped"
    finalKey: String,
    report: Seq[ReportMetric] = Seq.empty,
    alerts: Seq[Alerts.Alert] = Seq.empty,
    error: Option[String] = None)

/** The batch inference pipeline (SURVEY.md §3.1): one run per dropped file —
  * move to processing, validate, prepare, score, persist predictions,
  * drift+classification report, metric-store append, assessments, alerts,
  * lifecycle finish.
  *
  * Everything data-sized is a lazy DataFrame plan executed by Spark; only
  * report scalars and file-lifecycle bookkeeping touch the driver — the
  * per-file granularity is the reference's own unit of work.
  */
final class ChurnPipeline(
    spark: SparkSession,
    lifecycle: FileLifecycle,
    registry: ModelSource,
    rootDir: String,
    metricStorePath: String,
    reportUrl: String = "http://evidently.local/report",
    scoreThreshold: Double = 0.70,
    alertSink: Alerts.Alert => Unit = _ => (),
    workspace: Option[ReportWorkspace] = None,
    /** Metric-store append strategy: parquet by default; pass e.g.
      * `MetricStore.appendJdbc(_, url)` for the reference's
      * Postgres-over-JDBC shape (S7).
      */
    metricAppend: Option[org.apache.spark.sql.DataFrame => Unit] = None) {

  private def abs(key: String): String =
    new Path(new Path(rootDir), key).toString

  def run(key: String): PipelineResult = {
    var latestKey = key
    try {
      // fetch_model + input example columns (PIPE:841-843)
      val model = registry.load(ChurnSchema.ModelName, ChurnSchema.ModelAlias)
      val expectedCols =
        registry.expectedColumns(ChurnSchema.ModelName, ChurnSchema.ModelAlias)

      // input → processing (PIPE:846)
      latestKey = lifecycle.moveToFolder(key, lifecycle.FolderProcessing)

      // validation (PIPE:849-854)
      Validation.validateFileInput(spark, abs(latestKey), expectedCols) match {
        case Left(errMsg) =>
          val finalKey =
            lifecycle.moveToFolder(latestKey, lifecycle.FolderErrored, errMsg)
          return PipelineResult("errored", finalKey, error = Some(errMsg))
        case Right(cleaned) =>
          // prepare (PIPE:856) + predict (PIPE:858)
          val prepared = ChurnSchema.prepareData(cleaned)
          val scored = Training.score(model, prepared)
          val predictions = scored.select(
            (ChurnSchema.NumericalColumns :+ ChurnSchema.TargetColumn :+
              ChurnSchema.TargetPredictionColumn).map(col): _*)

          // log_predictions (PIPE:202-256): single CSV named
          // {base}_predictions_{model}_v{version}.csv replacing the source
          val version =
            registry.resolveAlias(ChurnSchema.ModelName, ChurnSchema.ModelAlias)
          val base = latestKey.split("/").last.stripSuffix(".csv")
          val outName =
            s"${base}_predictions_${ChurnSchema.ModelName}_v$version.csv"
          writeSingleCsv(predictions,
            lifecycle.path(lifecycle.FolderProcessing, outName))
          lifecycle.deleteKey(latestKey)
          latestKey = s"${lifecycle.FolderProcessing}/$outName"

          // Re-anchor downstream plans to the durable predictions CSV: the
          // source file is gone (deleted above), and re-reading the artifact
          // also avoids re-running the model transform per downstream action.
          val predictionsDurable = spark.read
            .schema(org.apache.spark.sql.types.StructType(
              predictions.schema.fields))
            .option("header", "true")
            .csv(abs(latestKey))

          // generate_data_report (PIPE:259-326) + save (PIPE:488-530)
          val reference = registry.loadReferenceData(
            spark, ChurnSchema.ModelName, ChurnSchema.ModelAlias)
          val report = DriftReport.run(reference, predictionsDurable)
          // add report run to the workspace UI (R7, PIPE:329-347):
          // get-or-create project with the memoized id, then add_run
          workspace.foreach { ws =>
            ws.addRun(ws.getOrCreateProject(), report,
              System.currentTimeMillis())
          }
          val metricRows = MetricStore.toRows(spark, report,
            new Timestamp(System.currentTimeMillis()))
          metricAppend.getOrElse(
            (df: org.apache.spark.sql.DataFrame) =>
              MetricStore.append(df, metricStorePath))(metricRows)

          // assessments + alerts (PIPE:868-896)
          val alerts = Seq.newBuilder[Alerts.Alert]
          val (isDrifted, numDrifted, driftedCols) =
            DriftReport.assessDataDrift(report)
          if (isDrifted)
            alerts += Alerts.driftAlert(latestKey, numDrifted, driftedCols, reportUrl)
          val (anyBelow, numBelow, below) =
            DriftReport.assessPredictionScores(report, scoreThreshold)
          if (anyBelow)
            alerts += Alerts.scoresAlert(latestKey, numBelow, below)
          val fired = alerts.result()
          fired.foreach(alertSink)

          // processing → processed (PIPE:899)
          val finalKey =
            lifecycle.moveToFolder(latestKey, lifecycle.FolderProcessed)
          PipelineResult("processed", finalKey, report, fired)
      }
    } catch {
      case e: Throwable =>
        val errMsg =
          s"An unexpected error occurred in the churn prediction pipeline: ${e.getMessage}"
        val finalKey =
          try lifecycle.moveToFolder(latestKey, lifecycle.FolderErrored, errMsg)
          catch { case _: Throwable => latestKey }
        PipelineResult("errored", finalKey, error = Some(errMsg))
    }
  }

  /** CSV sink (S3 shape): write via a staging dir, promote the single part
    * file to the target name — the output-committer analog of the
    * reference's write-new-then-delete (PIPE:250-252).
    */
  private def writeSingleCsv(df: org.apache.spark.sql.DataFrame, target: Path): Unit = {
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(target.getParent, s".${target.getName}.staging")
    df.coalesce(1).write.mode("overwrite").option("header", "true")
      .csv(staging.toString)
    val part = fs.listStatus(staging)
      .map(_.getPath).find(_.getName.startsWith("part-"))
      .getOrElse(throw new java.io.IOException(s"no part file in $staging"))
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(part, target))
      throw new java.io.IOException(s"rename $part -> $target failed")
    fs.delete(staging, true)
    ()
  }
}
