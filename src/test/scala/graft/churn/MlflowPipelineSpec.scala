package graft.churn

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The FULL churn pipeline running against an MLflow server over the wire:
  * model trained and stored locally, announced to the mock REST registry,
  * then `ChurnPipeline` executes end-to-end with `MlflowClient` as its
  * `ModelSource` — alias resolution, model load, expected-columns and
  * reference-data reads all flow through the documented REST + artifact
  * contract. The acceptance bar: byte-identical prediction output to the
  * same pipeline run against the native `Registry`.
  */
class MlflowPipelineSpec extends SparkSpec {

  test("ChurnPipeline end-to-end through the MLflow wire == native registry") {
    val s = spark
    val root = Files.createTempDirectory("graft-mlflow-pipe").toString
    val registry = new Registry(s"$root/registry")
    val raw = s.read.schema(ChurnSchema.RawSchema)
      .option("header", "true")
      .csv("/root/reference/data/customer_churn_0.csv")
    val prepared = ChurnSchema.prepareData(raw)
    val model = Training.trainModel(prepared, Training.GbtParams(maxIter = 5))
    val refData = Training.score(model, prepared)
      .select((ChurnSchema.NumericalColumns :+ "churn" :+ "churn_prediction")
        .map(col): _*)
    val v = registry.register(ChurnSchema.ModelName, model, refData)
    registry.setAlias(ChurnSchema.ModelName, ChurnSchema.ModelAlias, v)

    val mock = new MockMlflowServer
    try {
      val client = new MlflowClient(mock.base)
      client.createRegisteredModel(ChurnSchema.ModelName)
      val ver = client.createModelVersion(ChurnSchema.ModelName,
        s"file:$root/registry/${ChurnSchema.ModelName}/v$v")
      client.setAlias(ChurnSchema.ModelName, ChurnSchema.ModelAlias, ver)

      def runWith(source: ModelSource, tag: String): String = {
        val pipeRoot = s"$root/$tag"
        val lifecycle = new FileLifecycle(pipeRoot)
        lifecycle.mkdirs()
        Files.copy(Paths.get("/root/reference/data/customer_churn_1.csv"),
          Paths.get(pipeRoot, "input", "customer_churn_1.csv"),
          StandardCopyOption.REPLACE_EXISTING)
        val pipeline = new ChurnPipeline(s, lifecycle, source, pipeRoot,
          s"$pipeRoot/metric_store")
        val result = pipeline.run("input/customer_churn_1.csv")
        assert(result.status == "processed", s"$tag: ${result.error}")
        val out = Paths.get(pipeRoot, result.finalKey)
        new String(Files.readAllBytes(out), "UTF-8")
      }

      val viaWire = runWith(client, "wire")
      val viaRegistry = runWith(registry, "native")
      assert(viaWire == viaRegistry && viaWire.nonEmpty,
        "wire-sourced pipeline output must be byte-identical to the native run")
    } finally mock.stop()
  }
}
