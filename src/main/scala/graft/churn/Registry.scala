package graft.churn

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Model registry (SURVEY.md §2.8 M11/M12): versioned model store with alias
  * pointers and an attached reference-data snapshot — the engine-native
  * equivalent of `models:/{name}@{alias}` + `reference_data.csv`
  * (churn_prediction_pipeline.py:104,240-243,281-285;
  * churn_model_training.py:128-135,170-194).
  *
  * Layout under `root`:
  *   {name}/v{n}/model/                 — PipelineModel
  *   {name}/v{n}/meta.json              — expected input columns, params
  *   {name}/v{n}/reference_data.parquet — features + churn + churn_prediction
  *   {name}/aliases/{alias}             — file containing the version number
  */
final class Registry(root: String, conf: Configuration = new Configuration())
    extends ModelSource {

  private val rootPath = new Path(root)
  private val fs: FileSystem = rootPath.getFileSystem(conf)

  private def modelDir(name: String, version: Int) =
    new Path(rootPath, s"$name/v$version")
  private def aliasFile(name: String, alias: String) =
    new Path(rootPath, s"$name/aliases/$alias")

  private def writeString(p: Path, s: String): Unit = {
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private def readString(p: Path): String = {
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(bytes); new String(bytes, "UTF-8")
    } finally in.close()
  }

  def versions(name: String): Seq[Int] = {
    val base = new Path(rootPath, name)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .map(_.getPath.getName)
      .collect { case v if v.matches("v\\d+") => v.drop(1).toInt }
      .sorted
  }

  /** Log a new model version (M11): model + expected-columns metadata +
    * reference data; returns the assigned version (autoincrement).
    */
  def register(name: String, model: PipelineModel, referenceData: DataFrame,
      expectedColumns: Seq[String] = ChurnSchema.NumericalColumns): Int = {
    val version = versions(name).lastOption.getOrElse(0) + 1
    val dir = modelDir(name, version)
    model.write.overwrite().save(new Path(dir, "model").toString)
    referenceData.write.mode("overwrite")
      .parquet(new Path(dir, "reference_data.parquet").toString)
    val metaJson = "{\"expected_columns\": [" +
      expectedColumns.map(c => "\"" + c + "\"").mkString(", ") + "]}"
    writeString(new Path(dir, "meta.json"), metaJson)
    writeString(new Path(dir, "MLmodel"),
      mlModelYaml(name, version, expectedColumns))
    version
  }

  /** MLflow `MLmodel` descriptor (interop shim for `models:/{name}@{alias}`
    * parity, churn_prediction_pipeline.py:104): the published MLflow
    * model-directory contract — a YAML file next to the model data whose
    * `flavors.spark.model_data` names the Spark ML artifact subdirectory —
    * so an external MLflow client (or any reader of the documented format)
    * can discover and load registered versions straight off the store.
    * Deterministic content (model_uuid derives from name/version) so
    * registry writes are reproducible byte-for-byte.
    */
  private def mlModelYaml(name: String, version: Int,
      expectedColumns: Seq[String]): String = {
    val uuid = java.util.UUID.nameUUIDFromBytes(
      s"graft-registry:$name:v$version".getBytes("UTF-8")).toString
    val inputs = expectedColumns
      .map(c => s"""{"name": "$c", "type": "double"}""")
      .mkString("[", ", ", "]")
    s"""artifact_path: model
       |flavors:
       |  spark:
       |    model_data: model
       |    pyspark_version: 4.1.2
       |model_uuid: $uuid
       |signature:
       |  inputs: '$inputs'
       |  outputs: '[{"name": "churn_prediction", "type": "integer"}]'
       |""".stripMargin
  }

  /** Load a version through the MLmodel descriptor alone — the external
    * client's path: read YAML, resolve `flavors.spark.model_data` relative
    * to the version directory, load the Spark ML artifact it names.
    */
  def loadViaMlModel(name: String, version: Int): PipelineModel = {
    val dir = modelDir(name, version)
    val yaml = readString(new Path(dir, "MLmodel"))
    val modelData = yaml.linesIterator
      .collectFirst { case l if l.trim.startsWith("model_data:") =>
        l.trim.stripPrefix("model_data:").trim }
      .getOrElse(throw new RuntimeException(
        s"MLmodel for $name v$version has no flavors.spark.model_data"))
    PipelineModel.load(new Path(dir, modelData).toString)
  }

  /** Set/overwrite an alias pointer (TRAIN:190-194 sets `staging`). */
  def setAlias(name: String, alias: String, version: Int): Unit =
    writeString(aliasFile(name, alias), version.toString)

  /** get_model_version_by_alias (churn_prediction_pipeline.py:240-243). */
  def resolveAlias(name: String, alias: String): Int = {
    val p = aliasFile(name, alias)
    if (!fs.exists(p))
      throw new RuntimeException(
        s"Failed to fetch model '$name' with alias '$alias' " +
          "- Does it exist in the MLFlow registry?': no such alias")
    readString(p).trim.toInt
  }

  /** fetch_model (churn_prediction_pipeline.py:88-113). */
  def load(name: String, alias: String): PipelineModel = {
    val version = resolveAlias(name, alias)
    PipelineModel.load(new Path(modelDir(name, version), "model").toString)
  }

  /** Expected input columns recorded with the version (the reference's
    * `input_example.columns`, churn_prediction_pipeline.py:842).
    */
  def expectedColumns(name: String, alias: String): Seq[String] = {
    val version = resolveAlias(name, alias)
    val json = readString(new Path(modelDir(name, version), "meta.json"))
    ModelSource.parseExpectedColumns(json)
  }

  /** download_artifacts reference data (churn_prediction_pipeline.py:281-285). */
  def loadReferenceData(spark: SparkSession, name: String, alias: String): DataFrame = {
    val version = resolveAlias(name, alias)
    spark.read.parquet(
      new Path(modelDir(name, version), "reference_data.parquet").toString)
  }
}
