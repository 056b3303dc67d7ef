package graft.tools

import org.apache.spark.sql.functions._

import graft.churn.{ChurnSchema, Evaluation, Training}

/** Scratch: evaluate the notebook's best_params_to_date
  * (churn_model_training.ipynb cell 19 — the exact model whose holdout
  * precision/recall/F1 = 0.92/0.81/0.86 is published) under the MLlib GBT
  * mapping, at the default threshold and across the sweep.
  */
object ProfileNotebookParams {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    val raw = spark.read.schema(ChurnSchema.RawSchema)
      .option("header", "true")
      .csv("/root/reference/data/customer_churn_0.csv")
    val prepared = ChurnSchema.prepareData(raw).cache()
    val (train, test) = Training.trainTestSplit(prepared)
    val nb = Training.GbtParams(
      maxIter = 352,
      stepSize = 0.07154324375438634,
      maxDepth = 7,
      minInstancesPerNode = 1,
      minInfoGain = 0.23500630396472585,
      subsamplingRate = 0.9472361823473306,
      featureSubsetStrategy = "0.6149847610884563")
    val model = Training.trainModel(train, nb)
    val m = Evaluation.evaluate(model, Training.score(model, test)).metrics
    println(s"NB-params holdout at 0.5: $m")
    val rows = graft.ml.Classification
      .thresholdSweepAllScores(Training.score(model, test),
        ChurnSchema.TargetColumn, "churn_probability")
      .withColumn("precision", expr("cast(tp AS DOUBLE) / nullif(tp + fp, 0)"))
      .withColumn("recall", expr("cast(tp AS DOUBLE) / nullif(tp + fn, 0)"))
      .orderBy(col("threshold").desc).collect()
    rows.take(400).foreach { r =>
      println(f"SWEEP nb t=${r.getAs[Double]("threshold")}%.6f  " +
        f"P=${r.getAs[Double]("precision")}%.4f  R=${r.getAs[Double]("recall")}%.4f" +
        f"  F1=${r.getAs[Double]("f1")}%.4f")
    }
    spark.stop()
  }
}
