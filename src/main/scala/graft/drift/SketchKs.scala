package graft.drift

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Bridge, HistogramSketchAgg}

/** Single-pass approximate two-sample KS via mergeable histogram sketches
  * (SURVEY.md §4.3 "v2 (100 TB)"): ONE scan builds a bounded-size sketch
  * per side (map-side partial aggregation is native — each partition ships
  * at most `maxBins` bins), the D statistic comes from the two sketch CDFs
  * on the driver. Approximation error ≤ the largest bin's probability
  * mass; the exact distinct-value job (KsTest) is the correctness oracle.
  */
object SketchKs {

  /** histogram_sketch(value) aggregate Column. */
  def histogramSketch(value: Column, maxBins: Int = 256): Column =
    Bridge.column(
      HistogramSketchAgg(Bridge.expression(value), maxBins)
        .toAggregateExpression())

  /** One row: (ks_stat, n_current, n_reference), one pass over df. */
  def statistic(df: DataFrame, valueCol: String, isCurrent: Column,
      maxBins: Int = 256): (Double, Long, Long) = {
    val row = df.agg(
      histogramSketch(when(isCurrent, col(valueCol)), maxBins).as("cur"),
      histogramSketch(when(!isCurrent, col(valueCol)), maxBins).as("ref"))
      .first()
    def bins(r: Row, field: String): Seq[(Double, Long)] =
      r.getAs[scala.collection.Seq[Row]](field)
        .map(b => (b.getDouble(0), b.getLong(1))).toSeq
    val cur = bins(row, "cur")
    val ref = bins(row, "ref")
    val nCur = cur.map(_._2).sum
    val nRef = ref.map(_._2).sum
    (ksFromHistograms(cur, ref), nCur, nRef)
  }

  /** Max CDF gap over the union of both sketches' centroids (step CDFs). */
  def ksFromHistograms(cur: Seq[(Double, Long)], ref: Seq[(Double, Long)]): Double = {
    val nCur = math.max(cur.map(_._2).sum, 1L).toDouble
    val nRef = math.max(ref.map(_._2).sum, 1L).toDouble
    val points = (cur.map(_._1) ++ ref.map(_._1)).distinct.sorted
    var d = 0.0
    var iC = 0; var iR = 0
    var cumC = 0L; var cumR = 0L
    points.foreach { p =>
      while (iC < cur.length && cur(iC)._1 <= p) { cumC += cur(iC)._2; iC += 1 }
      while (iR < ref.length && ref(iR)._1 <= p) { cumR += ref(iR)._2; iR += 1 }
      d = math.max(d, math.abs(cumC / nCur - cumR / nRef))
    }
    d
  }

  /** Full approximate test with the asymptotic p-value. */
  def test(df: DataFrame, valueCol: String, isCurrent: Column,
      maxBins: Int = 256, alpha: Double = 0.05): KsResult = {
    val (d, n1, n2) = statistic(df, valueCol, isCurrent, maxBins)
    val p = KsTest.pValue(d, n1, n2)
    KsResult(d, p, n1, n2, p < alpha)
  }
}
