package graft.drift

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchKsSpec extends SparkSpec {

  private lazy val events =
    graft.core.Tables(spark, sf("sf0.01")).events.cache()

  test("sketch KS approximates the exact distinct-value KS") {
    val exact = KsTest.statistic(events.filter(col("value").isNotNull),
      "value", col("event_type") === "click").first()
    val dExact = exact.getAs[Double]("ks_stat")

    val (dSketch, nCur, nRef) = SketchKs.statistic(
      events.filter(col("value").isNotNull),
      "value", col("event_type") === "click", maxBins = 512)

    assert(nCur == exact.getAs[Long]("n_current"))
    assert(nRef == exact.getAs[Long]("n_reference"))
    assert(math.abs(dSketch - dExact) < 0.02,
      s"sketch $dSketch vs exact $dExact")
  }

  test("sketch survives partial aggregation and serialization (multi-partition)") {
    val repart = events.repartition(16)
    val (d1, _, _) = SketchKs.statistic(repart, "value",
      col("event_type") === "click", maxBins = 256)
    assert(d1 > 0.0 && d1 < 1.0)
  }

  test("drift decision matches the exact test on shifted data") {
    val s = spark
    import s.implicits._
    val base = (1 to 5000).map(i => ("ref", i * 0.01))
    val shifted = (1 to 5000).map(i => ("cur", i * 0.01 + 20.0))
    val df = (base ++ shifted).toDF("side", "value")
    val r = SketchKs.test(df, "value", col("side") === "cur")
    assert(r.drifted)
    // true D for a +20 shift over a 50-wide uniform range is 0.4
    assert(math.abs(r.statistic - 0.4) < 0.02, s"stat ${r.statistic}")

    val same = (base ++ base.map { case (_, v) => ("cur", v) })
      .toDF("side", "value")
    val r2 = SketchKs.test(same, "value", col("side") === "cur")
    assert(!r2.drifted)
  }

  test("histogram bins are bounded and counts conserved") {
    val buf = new org.apache.spark.sql.graft.HistogramBuffer(16)
    (1 to 10000).foreach(i => buf.insert((i % 997) * 1.0))
    assert(buf.centroids.length <= 16)
    assert(buf.counts.sum == 10000L)
    // serde round trip
    val back = org.apache.spark.sql.graft.HistogramBuffer.deserialize(buf.serialize())
    assert(back.centroids.toSeq == buf.centroids.toSeq)
    assert(back.counts.toSeq == buf.counts.toSeq)
  }
}
