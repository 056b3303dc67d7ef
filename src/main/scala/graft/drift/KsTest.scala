package graft.drift

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample Kolmogorov–Smirnov test (SURVEY.md §2.4 A10): the per-column
  * drift statistic for numeric columns — Evidently's default stattest for
  * high-cardinality columns (churn_prediction_pipeline.py:322,417-423
  * interprets the output as a p-value, drifted iff < 0.05).
  *
  * Plan shape: ONE grouped aggregate collapses the input to its distinct
  * values (each carrying per-side counts), then cumulative CDFs over that
  * distinct-value frame via ParallelRank.runningSums — every stage parallel
  * even when cardinality is linear in row count (continuous doubles).
  * `binnedStatistic` additionally quantizes first, trading a bounded error
  * for a fixed-size intermediate when even the distinct-value frame is
  * unwanted.
  */
object KsTest {

  /** Distinct-value two-sided KS statistic between rows where `isCurrent`
    * is true (current sample) and the rest (reference sample).
    * Returns one row: (ks_stat, n_current, n_reference).
    */
  def statistic(df: DataFrame, valueCol: String, isCurrent: Column): DataFrame = {
    val spark = df.sparkSession
    val perValue = df.groupBy(col(valueCol).as("v"))
      .agg(
        sum(when(isCurrent, 1L).otherwise(0L)).as("c_cur"),
        sum(when(isCurrent, 0L).otherwise(1L)).as("c_ref"))
    // Never Window.orderBy(v): a global-order window is single-partition by
    // construction, and for continuous columns the distinct-value frame is
    // linear in row count. Two light jobs over ONE range shuffle instead
    // (the DistributedQuantiles skeleton): job 1 = per-partition side
    // totals; driver = exclusive prefix offsets; job 2 = per-partition max
    // CDF gap seeded with its offset. Job 2 reuses job 1's shuffle files
    // (same RDD object), every stage parallel.
    // No explicit partition count: AQE's coalescing sizes the range
    // exchange to the distinct-value frame (adjacent ranges merge, so
    // global order and the offset arithmetic are unaffected) — one task
    // for an enum-grain column, full parallelism for continuous doubles.
    val sorted = perValue.repartitionByRange(col("v"))
      .sortWithinPartitions(col("v"))
      .select(col("c_cur"), col("c_ref"))
    val rdd = sorted.rdd
    // persisted across the two jobs (see DistributedQuantiles.run: without
    // it job 2 re-reads the shuffle and re-sorts)
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val partials = rdd.mapPartitionsWithIndex { (pid, it) =>
      var sc = 0L; var sr = 0L
      it.foreach { r => sc += r.getLong(0); sr += r.getLong(1) }
      Iterator.single((pid, sc, sr))
    }.collect().sortBy(_._1)
    val nCur = partials.map(_._2).sum
    val nRef = partials.map(_._3).sum
    val offsets = partials.scanLeft((0, 0L, 0L)) { case ((_, c, r), (pid, sc, sr)) =>
      (pid, c + sc, r + sr)
    }.init // exclusive: offsets(i) = totals of partitions before partition i
    val offByPid = partials.map(_._1).zip(offsets.map(o => (o._2, o._3))).toMap
    val bc = spark.sparkContext.broadcast(offByPid)
    val d =
      if (nCur == 0L || nRef == 0L) 0.0
      else {
        val maxima = rdd.mapPartitionsWithIndex { (pid, it) =>
          var (cc, cr) = bc.value(pid)
          var best = 0.0
          it.foreach { r =>
            cc += r.getLong(0); cr += r.getLong(1)
            val gap = math.abs(cc.toDouble / nCur - cr.toDouble / nRef)
            if (gap > best) best = gap
          }
          Iterator.single(best)
        }.collect()
        if (maxima.isEmpty) 0.0 else maxima.max
      }
    import spark.implicits._
    Seq((d, nCur, nRef)).toDF("ks_stat", "n_current", "n_reference")
    } finally { rdd.unpersist(blocking = false); () }
  }

  /** KS over pre-binned values: the 100 TB path for continuous columns.
    * Quantizes to `bins` fixed-width buckets between the column's observed
    * min/max (one extra aggregate), then runs the distinct-value KS on bucket
    * ids. Error vs exact KS ≤ the largest bucket's probability mass.
    */
  def binnedStatistic(df: DataFrame, valueCol: String, isCurrent: Column,
      bins: Int = 10000): DataFrame = {
    val Array(lo, hi) = df.agg(min(col(valueCol)), max(col(valueCol)))
      .first() match { case r => Array(r.getAs[Any](0), r.getAs[Any](1)) }
    val loD = lo.toString.toDouble
    val hiD = hi.toString.toDouble
    val width = if (hiD > loD) (hiD - loD) / bins else 1.0
    val binned = df.withColumn("__bin",
      least(floor((col(valueCol) - lit(loD)) / lit(width)), lit(bins - 1)))
    statistic(binned, "__bin", isCurrent)
  }

  /** Asymptotic two-sided p-value for a two-sample KS statistic — the
    * Kolmogorov distribution evaluated at sqrt(n1*n2/(n1+n2)) * d
    * (standard asymptotic form; commons-math3 supplies the CDF).
    */
  def pValue(d: Double, n1: Long, n2: Long): Double = {
    if (d <= 0) return 1.0
    val en = math.sqrt(n1.toDouble * n2 / (n1.toDouble + n2))
    // One-sample Kolmogorov CDF at effective n; commons-math3's cdf(d, n)
    // expects integer n — use the asymptotic series directly instead.
    val t = (en + 0.12 + 0.11 / en) * d
    kolmogorovSurvival(t)
  }

  /** Survival function of the Kolmogorov distribution:
    * Q(t) = 2 * sum_{k>=1} (-1)^{k-1} exp(-2 k^2 t^2).
    */
  def kolmogorovSurvival(t: Double): Double = {
    if (t < 1e-8) return 1.0
    var sum = 0.0
    var k = 1
    var term = Double.MaxValue
    while (k <= 100 && math.abs(term) > 1e-12) {
      term = 2.0 * math.pow(-1.0, (k - 1).toDouble) * math.exp(-2.0 * k * k * t * t)
      sum += term
      k += 1
    }
    math.max(0.0, math.min(1.0, sum))
  }

  /** Driver-side convenience: statistic + p-value + drift decision for one
    * column. Collects exactly one row (the aggregate result), mirroring the
    * reference's report-dict granularity.
    */
  def test(df: DataFrame, valueCol: String, isCurrent: Column,
      alpha: Double = 0.05): KsResult = {
    val r = statistic(df, valueCol, isCurrent).first()
    val n1 = r.getAs[Long]("n_current")
    val n2 = r.getAs[Long]("n_reference")
    val d = r.getAs[Double]("ks_stat")
    val p = pValue(d, n1, n2)
    KsResult(d, p, n1, n2, p < alpha)
  }
}

final case class KsResult(statistic: Double, pValue: Double,
    nCurrent: Long, nReference: Long, drifted: Boolean)
