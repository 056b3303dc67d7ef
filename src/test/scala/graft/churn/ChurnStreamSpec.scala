package graft.churn

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structured-Streaming end-to-end (SURVEY.md §2.11): files dropped in
  * input/ are discovered by the stream and processed exactly once per file.
  */
class ChurnStreamSpec extends SparkSpec {

  test("AvailableNow stream processes dropped files through the pipeline") {
    val root = Files.createTempDirectory("graft-stream").toString
    val lifecycle = new FileLifecycle(root)
    lifecycle.mkdirs()
    val registry = new Registry(s"$root/registry")

    val raw = spark.read.schema(ChurnSchema.RawSchema)
      .option("header", "true")
      .csv("/root/reference/data/customer_churn_0.csv")
    val prepared = ChurnSchema.prepareData(raw)
    val model = Training.trainModel(prepared, Training.GbtParams(maxIter = 10))
    val referenceData = Training.score(model, prepared).select(
      (ChurnSchema.NumericalColumns :+ "churn" :+ "churn_prediction").map(col): _*)
    val v = registry.register(ChurnSchema.ModelName, model, referenceData)
    registry.setAlias(ChurnSchema.ModelName, ChurnSchema.ModelAlias, v)

    Seq("customer_churn_1.csv", "customer_churn_2.csv").foreach { f =>
      Files.copy(Paths.get(s"/root/reference/data/$f"),
        Paths.get(root, "input", f), StandardCopyOption.REPLACE_EXISTING)
    }

    val pipeline = new ChurnPipeline(spark, lifecycle, registry, root,
      s"$root/metric_store")
    val q = ChurnStream.start(spark, root, pipeline, s"$root/_checkpoint")
    // generous: suites share the session and may run concurrently with the
    // slow model-quality fit — a timeout here must mean a real hang
    assert(q.awaitTermination(300000), "stream did not drain in 300s")

    assert(lifecycle.list("processed").toSet == Set(
      "customer_churn_1_predictions_XGBoostChurnModel_v1.csv",
      "customer_churn_2_predictions_XGBoostChurnModel_v1.csv"))
    assert(lifecycle.list("input").isEmpty)
    // two full reports appended: 2 x 20 rows
    assert(spark.read.parquet(s"$root/metric_store").count() == 40)

    // restart with the same checkpoint: no files reprocessed (exactly once)
    val q2 = ChurnStream.start(spark, root, pipeline, s"$root/_checkpoint")
    assert(q2.awaitTermination(300000), "restarted stream did not drain in 300s")
    assert(spark.read.parquet(s"$root/metric_store").count() == 40)
  }
}
