package graft.churn

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end pipeline test (SURVEY.md §5.2.5): train + register a model,
  * drop files into input/, run the pipeline, assert lifecycle transitions,
  * metric-store rows, per-file logs, and alert behavior.
  */
class ChurnPipelineSpec extends SparkSpec {

  private lazy val env: (String, Registry, FileLifecycle, String) = {
    val root = Files.createTempDirectory("graft-pipeline").toString
    val lifecycle = new FileLifecycle(root)
    lifecycle.mkdirs()
    val registry = new Registry(s"$root/registry")
    val metricStore = s"$root/metric_store"

    // train on customer_churn_0 (the reference's training file) + register
    val raw = spark.read.schema(ChurnSchema.RawSchema)
      .option("header", "true")
      .csv("/root/reference/data/customer_churn_0.csv")
    val prepared = ChurnSchema.prepareData(raw)
    val model = Training.trainModel(prepared, Training.GbtParams(maxIter = 20))
    val referenceData = Training.score(model, prepared).select(
      (ChurnSchema.NumericalColumns :+ "churn" :+ "churn_prediction").map(col): _*)
    val v = registry.register(ChurnSchema.ModelName, model, referenceData)
    registry.setAlias(ChurnSchema.ModelName, ChurnSchema.ModelAlias, v)
    (root, registry, lifecycle, metricStore)
  }

  private lazy val workspace =
    new ReportWorkspace(s"${env._1}/evidently_workspace")

  private def pipeline(alerts: scala.collection.mutable.Buffer[Alerts.Alert]) = {
    val (root, registry, lifecycle, metricStore) = env
    new ChurnPipeline(spark, lifecycle, registry, root, metricStore,
      alertSink = alerts += _, workspace = Some(workspace))
  }

  private def drop(name: String, from: String): Unit = {
    val (root, _, _, _) = env
    Files.copy(Paths.get(from), Paths.get(root, "input", name),
      StandardCopyOption.REPLACE_EXISTING)
  }

  test("happy path: processed predictions file, metrics appended, log trail") {
    val (root, _, lifecycle, metricStore) = env
    val alerts = scala.collection.mutable.Buffer.empty[Alerts.Alert]
    drop("customer_churn_1.csv", "/root/reference/data/customer_churn_1.csv")

    val result = pipeline(alerts).run("input/customer_churn_1.csv")
    assert(result.status == "processed", result.error)
    assert(result.finalKey ==
      "processed/customer_churn_1_predictions_XGBoostChurnModel_v1.csv")
    assert(lifecycle.exists("processed",
      "customer_churn_1_predictions_XGBoostChurnModel_v1.csv"))
    assert(!lifecycle.exists("input", "customer_churn_1.csv"))
    assert(!lifecycle.exists("processing", "customer_churn_1.csv"))

    // predictions CSV is readable and carries the output schema
    val out = spark.read.option("header", "true").csv(
      s"$root/processed/customer_churn_1_predictions_XGBoostChurnModel_v1.csv")
    assert(out.columns.toSeq ==
      ChurnSchema.NumericalColumns :+ "churn" :+ "churn_prediction")
    assert(out.count() > 900)

    // the report run landed in the workspace under the memoized project (R7)
    val pid = workspace.getVariable(workspace.ProjectIdVariable).get
    assert(workspace.runIds(pid).size == 1)
    assert(workspace.readRun(pid, workspace.runIds(pid).head)
      .map(_.metricId).contains("Accuracy()"))

    // metric store has one full report: 4 scores + 2 f1bylabel + 12
    // valuedrift + 2 driftedcolumnscount = 20 rows
    val metrics = spark.read.parquet(metricStore)
    assert(metrics.count() == 20)
    val names = metrics.select("metric_name").collect().map(_.getString(0)).toSet
    assert(Set("accuracy", "precision", "recall", "f1score",
      "f1bylabel[0]", "f1bylabel[1]",
      "driftedcolumnscount[count]", "driftedcolumnscount[share]",
      "valuedrift_churn", "valuedrift_age_group").subsetOf(names))

    // per-file log records both moves
    val log = lifecycle.readLog("customer_churn_1.csv")
    assert(log.contains("Moved input/customer_churn_1.csv → processing/customer_churn_1.csv"))
    val predLog = lifecycle.readLog(
      "customer_churn_1_predictions_XGBoostChurnModel_v1.csv")
    assert(predLog.contains("→ processed/customer_churn_1_predictions_XGBoostChurnModel_v1.csv"))
  }

  test("invalid extension routes to errored with the exact message") {
    val (root, _, lifecycle, _) = env
    val alerts = scala.collection.mutable.Buffer.empty[Alerts.Alert]
    Files.writeString(Paths.get(root, "input", "notes.txt"), "hello")

    val result = pipeline(alerts).run("input/notes.txt")
    assert(result.status == "errored")
    assert(lifecycle.exists("errored", "notes.txt"))
    assert(result.error.get ==
      s"Invalid file type for $root/processing/notes.txt. Expected a CSV file.")
    val log = lifecycle.readLog("notes.txt")
    assert(log.contains("Invalid file type for"))
  }

  test("missing-columns file routes to errored") {
    val (root, _, lifecycle, _) = env
    val alerts = scala.collection.mutable.Buffer.empty[Alerts.Alert]
    Files.writeString(Paths.get(root, "input", "short.csv"),
      "Call  Failure,Churn\n1,0\n")

    val result = pipeline(alerts).run("input/short.csv")
    assert(result.status == "errored")
    assert(lifecycle.exists("errored", "short.csv"))
    assert(result.error.get.contains("does not match expected structure"))
  }

  test("MLmodel interop: external-client contract loads the registered model") {
    val (root, registry, _, _) = env
    val v = registry.resolveAlias(ChurnSchema.ModelName, ChurnSchema.ModelAlias)
    // the published MLflow directory contract: MLmodel YAML next to the
    // model data, flavors.spark.model_data naming the artifact subdir
    val yaml = new String(Files.readAllBytes(
      Paths.get(root, "registry", ChurnSchema.ModelName, s"v$v", "MLmodel")),
      "UTF-8")
    assert(yaml.contains("artifact_path: model"))
    assert(yaml.contains("model_data: model"))
    assert(yaml.contains("model_uuid: "))
    assert(ChurnSchema.NumericalColumns.forall(c =>
      yaml.contains("\"name\": \"" + c + "\"")))
    // load THROUGH the descriptor (the external client's path) and score
    val m = registry.loadViaMlModel(ChurnSchema.ModelName, v)
    val raw = spark.read.schema(ChurnSchema.RawSchema)
      .option("header", "true")
      .csv("/root/reference/data/customer_churn_0.csv")
    assert(Training.score(m, ChurnSchema.prepareData(raw)).count() > 0)
  }

  test("drifted synthetic file fires the drift alert") {
    val alerts = scala.collection.mutable.Buffer.empty[Alerts.Alert]
    drop("customer_churn_synthetic_1.csv",
      "/root/reference/data/customer_churn_synthetic_1.csv")

    val result = pipeline(alerts).run("input/customer_churn_synthetic_1.csv")
    assert(result.status == "processed", result.error)
    val (isDrifted, _, _) = DriftReport.assessDataDrift(result.report)
    if (isDrifted) {
      assert(alerts.exists(_.subject.startsWith("Customer Data Drift Alert:")))
    }
    // synthetic drop should at minimum produce a full report
    assert(result.report.nonEmpty)
  }
}
