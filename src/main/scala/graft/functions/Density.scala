package graft.functions

import org.apache.spark.mllib.stat.KernelDensity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution estimation (SURVEY.md §2.4 A2): fixed-width histograms as
  * single grouped aggregates (see Relational q15) and Gaussian kernel
  * density estimation over a numeric column — the engine-native analog of
  * the reference notebook's histogram+KDE EDA cells
  * (churn_model_training.ipynb cells 8-10).
  */
object Density {

  /** Fixed-width histogram: data-independent bucket boundaries keep it ONE
    * grouped aggregate — no min/max pre-pass. Returns (bucket, lo, hi, n).
    */
  def histogram(df: DataFrame, valueCol: String, bucketWidth: Double,
      origin: Double = 0.0): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(floor((col(valueCol) - origin) / bucketWidth).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lo", col("bucket") * bucketWidth + origin)
      .withColumn("hi", (col("bucket") + 1) * bucketWidth + origin)
      .select(col("bucket"), col("lo"), col("hi"), col("n"))

  /** Gaussian KDE evaluated at `points`: one distributed pass over the
    * column (MLlib KernelDensity), driver-side output sized |points|.
    * Returns (x, density).
    */
  def kde(df: DataFrame, valueCol: String, bandwidth: Double,
      points: Array[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rdd = df.select(col(valueCol).cast("double"))
      .filter(col(valueCol).isNotNull)
      .rdd.map(_.getDouble(0))
    val densities = new KernelDensity()
      .setSample(rdd)
      .setBandwidth(bandwidth)
      .estimate(points)
    points.zip(densities).toSeq.toDF("x", "density")
  }
}
