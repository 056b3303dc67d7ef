package graft.churn

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Minimal in-JVM MLflow registry server for wire-level tests: in-memory
  * models/versions/aliases behind the documented REST API 2.0 paths with
  * MLflow-shaped JSON and error codes. Shared by MlflowClientSpec (client
  * contract) and MlflowPipelineSpec (full pipeline over the wire).
  */
final class MockMlflowServer {
  private val mapper = new ObjectMapper()
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
