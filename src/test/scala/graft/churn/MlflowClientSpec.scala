package graft.churn

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Wire-level MLflow interop: a real HTTP round-trip against a mock server
  * implementing the documented MLflow REST API 2.0 surface the reference
  * pipeline uses. The mock holds registry state in memory and serves
  * artifacts from a `Registry` directory on disk — so the test covers the
  * full `models:/{name}@{alias}` path: register locally → announce the
  * version over REST → resolve the alias over REST → fetch the download
  * URI → load the Spark model through the `MLmodel` directory contract →
  * identical predictions.
  */
class MlflowClientSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  /** Minimal MLflow registry server: in-memory models/versions/aliases,
    * MLflow-shaped JSON and error codes.
    */
  private final class MockMlflow {
    val models = scala.collection.mutable.Set[String]()
    val versions = scala.collection.mutable.Map[String, Vector[String]]()
    val aliases = scala.collection.mutable.Map[(String, String), Int]()
    val server: HttpServer = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)

    private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    private def err(ex: HttpExchange, code: Int, ecode: String, msg: String) =
      respond(ex, code, mapper.createObjectNode()
        .put("error_code", ecode).put("message", msg).toString)
    private def query(ex: HttpExchange): Map[String, String] =
      Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
        .filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2)
          k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
    private def body(ex: HttpExchange) =
      mapper.readTree(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))

    server.createContext("/api/2.0/mlflow/registered-models/create", ex => {
      val name = body(ex).path("name").asText()
      if (models.contains(name))
        err(ex, 400, "RESOURCE_ALREADY_EXISTS", s"model $name exists")
      else { models += name; respond(ex, 200,
        s"""{"registered_model": {"name": "$name"}}""") }
    })
    server.createContext("/api/2.0/mlflow/model-versions/create", ex => {
      val j = body(ex)
      val name = j.path("name").asText()
      versions(name) = versions.getOrElse(name, Vector.empty) :+
        j.path("source").asText()
      respond(ex, 200, s"""{"model_version": {"name": "$name", "version": "${versions(name).size}"}}""")
    })
    server.createContext("/api/2.0/mlflow/registered-models/alias", ex => {
      if (ex.getRequestMethod == "POST") {
        val j = body(ex)
        aliases((j.path("name").asText(), j.path("alias").asText())) =
          j.path("version").asText().toInt
        respond(ex, 200, "{}")
      } else {
        val q = query(ex)
        aliases.get((q("name"), q("alias"))) match {
          case Some(v) => respond(ex, 200,
            s"""{"model_version": {"name": "${q("name")}", "version": "$v"}}""")
          case None => err(ex, 404, "RESOURCE_DOES_NOT_EXIST",
            s"alias ${q("alias")} not found")
        }
      }
    })
    server.createContext("/api/2.0/mlflow/model-versions/get-download-uri", ex => {
      val q = query(ex)
      val v = q("version").toInt
      versions.get(q("name")).flatMap(_.lift(v - 1)) match {
        case Some(src) => respond(ex, 200, s"""{"artifact_uri": "$src"}""")
        case None => err(ex, 404, "RESOURCE_DOES_NOT_EXIST", "no such version")
      }
    })
    server.start()
    def base: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("models:/{name}@{alias} resolves and loads over the REST wire") {
    val s = spark
    val root = Files.createTempDirectory("graft-mlflow").toString
    val registry = new Registry(s"$root/registry")
    val raw = s.read.schema(ChurnSchema.RawSchema)
      .option("header", "true")
      .csv("/root/reference/data/customer_churn_0.csv")
    val prepared = ChurnSchema.prepareData(raw)
    val model = Training.trainModel(prepared, Training.GbtParams(maxIter = 3))
    val refData = Training.score(model, prepared)
      .select((ChurnSchema.NumericalColumns :+ "churn" :+ "churn_prediction")
        .map(col): _*)
    val v = registry.register(ChurnSchema.ModelName, model, refData)

    val mock = new MockMlflow
    try {
      val client = new MlflowClient(mock.base)
      client.createRegisteredModel(ChurnSchema.ModelName)
      client.createRegisteredModel(ChurnSchema.ModelName) // idempotent reuse
      val ver = client.createModelVersion(ChurnSchema.ModelName,
        s"file:$root/registry/${ChurnSchema.ModelName}/v$v")
      client.setAlias(ChurnSchema.ModelName, "champion", ver)
      assert(client.resolveAlias(ChurnSchema.ModelName, "champion") == ver)

      val loaded = client.loadModel(ChurnSchema.ModelName, "champion")
      def signature(m: org.apache.spark.ml.PipelineModel): org.apache.spark.sql.Row =
        Training.score(m, prepared)
          .agg(count(lit(1)), sum(col("churn_prediction")),
            sum(col("churn_probability")))
          .head()
      val (a, b) = (signature(model), signature(loaded))
      assert(a == b && a.getLong(0) > 0,
        "wire-loaded model must predict identically to the registered one")
    } finally mock.stop()
  }

  test("missing alias raises the reference's exact operator error") {
    val mock = new MockMlflow
    try {
      val client = new MlflowClient(mock.base)
      val e = intercept[RuntimeException](
        client.resolveAlias("XGBoostChurnModel", "nope"))
      assert(e.getMessage ==
        "Failed to fetch model 'XGBoostChurnModel' with alias 'nope' " +
          "- Does it exist in the MLFlow registry?': no such alias")
    } finally mock.stop()
  }
}
