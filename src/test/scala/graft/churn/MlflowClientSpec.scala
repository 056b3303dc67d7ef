package graft.churn

import java.nio.file.Files

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

    val mock = new MockMlflowServer
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
    val mock = new MockMlflowServer
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
