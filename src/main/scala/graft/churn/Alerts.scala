package graft.churn

import java.util.Locale

/** Alert formatting (SURVEY.md §2.9 R5/R6) — exact subject/body contracts of
  * churn_prediction_pipeline.py:683-752. The SNS publish itself (S14) is a
  * pluggable sink; these functions produce the observable strings.
  */
object Alerts {

  final case class Alert(subject: String, message: String)

  private def basename(key: String): String = key.split("/").last

  /** send_drift_alert_email (churn_prediction_pipeline.py:683-721). */
  def driftAlert(latestKey: String, numDriftedCols: Int,
      driftedColNames: Seq[String], reportUrl: String): Alert = {
    val sb = new StringBuilder
    sb ++= "Majority of columns drifted from reference data in the latest run.\n\n"
    sb ++= s"Filename: ${basename(latestKey)}.\n\n"
    sb ++= s"$numDriftedCols Column(s) Drifted:\n"
    driftedColNames.foreach(c => sb ++= s"- $c\n")
    sb ++= s"\nPlease review the Evidently report at $reportUrl" +
      " and take necessary actions."
    Alert(s"Customer Data Drift Alert: $numDriftedCols Column(s) Drifted",
      sb.toString)
  }

  /** send_scores_alert_email (churn_prediction_pipeline.py:723-752);
    * values rendered `%.3f` like python's f"{value:.3f}".
    */
  def scoresAlert(latestKey: String, numScoresBelowThreshold: Int,
      scoresBelowThreshold: Seq[(String, Double)]): Alert = {
    val sb = new StringBuilder
    sb ++= "Predictions scored below threshold in the latest run.\n\n"
    sb ++= s"Filename: ${basename(latestKey)}.\n\n"
    sb ++= s"$numScoresBelowThreshold Score(s) Below Threshold:\n"
    scoresBelowThreshold.foreach { case (score, value) =>
      sb ++= "- %s: %.3f\n".formatLocal(Locale.ROOT, score, value)
    }
    Alert(
      s"Customer Prediction Scores Alert: $numScoresBelowThreshold " +
        "Score(s) Below Threshold",
      sb.toString)
  }

  /** send_sns_alert subject decoration (churn_prediction_pipeline.py:764). */
  def decorateSubject(subject: String): String = s"🚨 $subject"
}
