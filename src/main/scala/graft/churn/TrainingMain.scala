package graft.churn

import org.apache.spark.sql.functions._

/** Entry point B (SURVEY.md §3.2): train → dual-evaluate (bias on train,
  * variance on test) → promote to the registry with reference data and the
  * `staging` alias — the engine-native `make deploy-model`.
  *
  * Args: [dataCsv] [registryDir] [--tuneparams] [--nopromote]
  * Env: GRAFT_MAX_ITER caps forest size (default the best-to-date 374).
  */
object TrainingMain {
  def main(args: Array[String]): Unit = {
    val dataCsv = args.headOption
      .getOrElse("/root/reference/data/customer_churn_0.csv")
    val registryDir = args.drop(1).headOption.getOrElse("/tmp/graft_registry")
    val tune = args.contains("--tuneparams")
    val promote = !args.contains("--nopromote")

    val spark = graft.core.GraftSession.local(appName = "graft-training")
    val raw = spark.read.schema(ChurnSchema.RawSchema)
      .option("header", "true").csv(dataCsv)
    val prepared = ChurnSchema.prepareData(raw).cache()

    val (train, test) = Training.trainTestSplit(prepared)
    val maxIter = sys.env.getOrElse("GRAFT_MAX_ITER", "374").toInt

    val (params, _) =
      if (tune) {
        val trials = sys.env.getOrElse("GRAFT_TRIALS", "10").toInt
        val (p, thr, score) = Training.randomSearch(
          train, nTrials = trials, maxIterCap = math.min(maxIter, 200))
        println(s"Best CV F1: $score (threshold $thr)")
        (p, thr)
      } else (Training.GbtParams(maxIter = maxIter), 0.5)

    val model = Training.trainModel(train, params)

    // bias check on train, variance check on test (TRAIN:372-376)
    Seq("X_train" -> train, "X_test" -> test).foreach { case (name, df) =>
      val result = Evaluation.evaluate(model, Training.score(model, df))
      println(s"--- $name ---")
      result.metrics.toSeq.sortBy(_._1).foreach { case (k, v) =>
        println(f"$k%-12s $v%.4f")
      }
    }

    if (promote) {
      val registry = new Registry(registryDir)
      val referenceData = Training.score(model, train).select(
        (ChurnSchema.NumericalColumns :+ ChurnSchema.TargetColumn :+
          ChurnSchema.TargetPredictionColumn).map(col): _*)
      val v = registry.register(ChurnSchema.ModelName, model, referenceData)
      registry.setAlias(ChurnSchema.ModelName, ChurnSchema.ModelAlias, v)
      println(s"Promoted ${ChurnSchema.ModelName} v$v to alias " +
        s"'${ChurnSchema.ModelAlias}' in $registryDir")
    }
    spark.stop()
  }
}
