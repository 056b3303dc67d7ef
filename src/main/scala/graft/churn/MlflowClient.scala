package graft.churn

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.ml.PipelineModel

/** REST client for an MLflow tracking/registry server — the wire-level
  * interop path for `models:/{name}@{alias}` resolution
  * (churn_prediction_pipeline.py:88-113,240-243): where `Registry` is the
  * engine-native store and the `MLmodel` directory shim makes versions
  * externally readable, this client speaks the DOCUMENTED public MLflow
  * REST API 2.0 (mlflow.org/docs/latest/rest-api.html) over HTTP to a
  * real server:
  *
  *   - `GET  /api/2.0/mlflow/registered-models/alias`       (resolve @alias)
  *   - `GET  /api/2.0/mlflow/model-versions/get-download-uri`
  *   - `POST /api/2.0/mlflow/registered-models/create`
  *   - `POST /api/2.0/mlflow/model-versions/create`
  *   - `POST /api/2.0/mlflow/registered-models/alias`       (set alias)
  *
  * Model LOADING composes the download URI with the published `MLmodel`
  * directory contract (resolve `flavors.spark.model_data`, load the Spark
  * ML artifact) — the same contract `Registry.loadViaMlModel` writes, so a
  * model registered by this engine and served by an MLflow server round-
  * trips end-to-end. JSON via Jackson (ships with Spark), HTTP via the
  * JDK client; no new dependencies.
  *
  * Failure mapping: a RESOURCE_DOES_NOT_EXIST on alias resolution raises
  * the reference pipeline's exact operator error string (same contract as
  * `Registry.resolveAlias`), so the churn pipeline behaves identically
  * whether its registry is the native store or a remote MLflow server.
  */
final class MlflowClient(baseUri: String,
    http: HttpClient = MlflowClient.defaultHttp) extends ModelSource {

  private val mapper = new ObjectMapper()
  private def url(path: String) = s"${baseUri.stripSuffix("/")}$path"

  // Per-request deadline: without it a hung server blocks the churn
  // pipeline's resolveAlias/artifactUri call forever (the default client
  // has NO timeout); with it the pipeline fails loudly inside a bounded
  // window and the file-lifecycle error path takes over.
  private def withDeadline(b: HttpRequest.Builder): HttpRequest.Builder =
    b.timeout(MlflowClient.requestTimeout)

  private def get(path: String): (Int, String) = {
    val req = withDeadline(HttpRequest.newBuilder(URI.create(url(path))).GET())
      .build()
    val r = http.send(req, HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def post(path: String, body: String): (Int, String) = {
    val req = withDeadline(HttpRequest.newBuilder(URI.create(url(path)))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8)))
      .build()
    val r = http.send(req, HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def enc(s: String) =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)

  /** MLflow error_code from a response body; "" when the body is not JSON
    * (a proxy/LB error page must surface the HTTP failure, not a
    * JsonParseException).
    */
  private def errorCode(body: String): String =
    try mapper.readTree(body).path("error_code").asText()
    catch { case scala.util.control.NonFatal(_) => "" }

  /** get_model_version_by_alias: GET registered-models/alias. Raises the
    * reference's operator error when the server reports
    * RESOURCE_DOES_NOT_EXIST.
    */
  def resolveAlias(name: String, alias: String): Int = {
    val (code, body) =
      get(s"/api/2.0/mlflow/registered-models/alias?name=${enc(name)}&alias=${enc(alias)}")
    if (code == 200)
      mapper.readTree(body).path("model_version").path("version").asText().toInt
    else if (errorCode(body) == "RESOURCE_DOES_NOT_EXIST")
      throw new RuntimeException(
        s"Failed to fetch model '$name' with alias '$alias' " +
          "- Does it exist in the MLFlow registry?': no such alias")
    else throw new RuntimeException(
      s"mlflow registered-models/alias HTTP $code: $body")
  }

  /** get-download-uri for a model version's artifact root. */
  def artifactUri(name: String, version: Int): String = {
    val (code, body) = get(
      s"/api/2.0/mlflow/model-versions/get-download-uri?name=${enc(name)}&version=$version")
    if (code != 200) throw new RuntimeException(
      s"mlflow get-download-uri HTTP $code: $body")
    mapper.readTree(body).path("artifact_uri").asText()
  }

  /** Create the registered model (idempotent against RESOURCE_ALREADY_EXISTS
    * — the reference's register-or-reuse behavior).
    */
  def createRegisteredModel(name: String): Unit = {
    val (code, body) = post("/api/2.0/mlflow/registered-models/create",
      mapper.createObjectNode().put("name", name).toString)
    if (code != 200 && errorCode(body) != "RESOURCE_ALREADY_EXISTS")
      throw new RuntimeException(
        s"mlflow registered-models/create HTTP $code: $body")
  }

  /** Create a model version pointing at an artifact `source`; returns the
    * server-assigned version number.
    */
  def createModelVersion(name: String, source: String): Int = {
    val (code, body) = post("/api/2.0/mlflow/model-versions/create",
      mapper.createObjectNode().put("name", name).put("source", source)
        .toString)
    if (code != 200) throw new RuntimeException(
      s"mlflow model-versions/create HTTP $code: $body")
    mapper.readTree(body).path("model_version").path("version").asText().toInt
  }

  /** set_registered_model_alias (churn_model_training.py:190-194). */
  def setAlias(name: String, alias: String, version: Int): Unit = {
    val (code, body) = post("/api/2.0/mlflow/registered-models/alias",
      mapper.createObjectNode().put("name", name).put("alias", alias)
        .put("version", version.toString).toString)
    if (code != 200) throw new RuntimeException(
      s"mlflow set alias HTTP $code: $body")
  }

  /** `models:/{name}@{alias}` end-to-end: resolve the alias over the wire,
    * fetch the artifact URI, then load through the published `MLmodel`
    * directory contract (flavors.spark.model_data names the Spark ML
    * artifact subdirectory).
    */
  def loadModel(name: String, alias: String): PipelineModel = {
    val version = resolveAlias(name, alias)
    loadModelVersion(name, version)
  }

  /** ModelSource surface: the churn pipeline runs unmodified against a
    * remote MLflow server through these (expected columns and reference
    * data are artifact reads relative to the version's download URI — the
    * `download_artifacts` shape of the reference pipeline).
    */
  def load(name: String, alias: String): PipelineModel = loadModel(name, alias)

  def expectedColumns(name: String, alias: String): Seq[String] = {
    val root = artifactUri(name, resolveAlias(name, alias))
    ModelSource.parseExpectedColumns(
      readArtifact(new org.apache.hadoop.fs.Path(root, "meta.json")))
  }

  def loadReferenceData(spark: org.apache.spark.sql.SparkSession, name: String,
      alias: String): org.apache.spark.sql.DataFrame = {
    val root = artifactUri(name, resolveAlias(name, alias))
    spark.read.parquet(
      new org.apache.hadoop.fs.Path(root, "reference_data.parquet").toString)
  }

  private def readArtifact(p: org.apache.hadoop.fs.Path): String = {
    val fs = p.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  def loadModelVersion(name: String, version: Int): PipelineModel = {
    val root = artifactUri(name, version)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    val mlmodel = new org.apache.hadoop.fs.Path(rootPath, "MLmodel")
    val in = fs.open(mlmodel)
    val yaml =
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    val modelData = yaml.linesIterator
      .collectFirst { case l if l.trim.startsWith("model_data:") =>
        l.trim.stripPrefix("model_data:").trim }
      .getOrElse(throw new RuntimeException(
        s"MLmodel at $root has no flavors.spark.model_data"))
    PipelineModel.load(new org.apache.hadoop.fs.Path(rootPath, modelData).toString)
  }
}

object MlflowClient {
  /** Connect/request deadlines for the default client: a hung or
    * unreachable MLflow server must fail the pipeline inside a bounded
    * window, never block it indefinitely. Overridable per-JVM for slow
    * links; tests inject their own HttpClient and are unaffected.
    */
  val connectTimeout: java.time.Duration = java.time.Duration.ofSeconds(
    sys.props.getOrElse("graft.mlflow.connectTimeoutSec", "10").toLong)
  val requestTimeout: java.time.Duration = java.time.Duration.ofSeconds(
    sys.props.getOrElse("graft.mlflow.requestTimeoutSec", "60").toLong)

  def defaultHttp: HttpClient =
    HttpClient.newBuilder().connectTimeout(connectTimeout).build()
}
