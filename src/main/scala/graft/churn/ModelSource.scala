package graft.churn

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The model-resolution seam the churn pipeline consumes
  * (churn_prediction_pipeline.py:88-113,240-243,281-285): resolve
  * `@alias`, load the model, read its expected input columns and its
  * reference-data artifact. Two implementations — the engine-native
  * [[Registry]] (directory store) and the wire-level [[MlflowClient]]
  * (MLflow REST API 2.0 + artifact reads) — so a deployment switches
  * between a local store and a remote MLflow server without touching the
  * pipeline (MlflowPipelineSpec runs the FULL pipeline against a mock
  * server over real HTTP).
  */
trait ModelSource {
  def resolveAlias(name: String, alias: String): Int
  def load(name: String, alias: String): PipelineModel
  def expectedColumns(name: String, alias: String): Seq[String]
  def loadReferenceData(spark: SparkSession, name: String, alias: String): DataFrame
}

object ModelSource {
  /** expected_columns from a version's meta.json (the reference's
    * `input_example.columns` contract) — shared by both implementations.
    */
  def parseExpectedColumns(json: String): Seq[String] =
    "\"([a-z_0-9]+)\"".r.findAllMatchIn(
      json.dropWhile(_ != '[')).map(_.group(1)).toSeq
}
