package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Bridge, KllSketchAgg}

import graft.SparkSpec

class KllSketchSpec extends SparkSpec {

  private def kll(c: Column, k: Int, qs: Seq[Double]): Column =
    Bridge.column(KllSketchAgg(Bridge.expression(c), k, qs)
      .toAggregateExpression())

  private def rankValue(sorted: IndexedSeq[Double], q: Double): Double =
    sorted(math.max(math.ceil(q * sorted.size).toLong, 1L).toInt - 1)

  test("exact regime (k >= n): quantiles equal the sorted-rank values") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val xs = IndexedSeq.fill(800)(rnd.nextDouble() * 1000)
    val got = s.sparkContext.parallelize(xs, 6).toDF("v")
      .agg(kll(col("v"), 1024, Seq(0.25, 0.5, 0.75)).as("q"))
      .head.getSeq[Double](0)
    val sorted = xs.sorted
    assert(got == Seq(rankValue(sorted, 0.25), rankValue(sorted, 0.5),
      rankValue(sorted, 0.75)))
  }

  test("compacted regime: rank error bounded (~2% at k=256, n=20000)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val xs = IndexedSeq.fill(20000)(rnd.nextDouble())
    val got = s.sparkContext.parallelize(xs, 8).toDF("v")
      .agg(kll(col("v"), 256, Seq(0.1, 0.5, 0.9)).as("q"))
      .head.getSeq[Double](0)
    val sorted = xs.sorted
    Seq(0.1, 0.5, 0.9).zip(got).foreach { case (q, est) =>
      val trueRank = q * xs.size
      val estRank = sorted.count(_ <= est)
      assert(math.abs(estRank - trueRank) <= 0.02 * xs.size,
        s"q=$q: est rank $estRank vs true $trueRank")
    }
  }

  test("merge is deterministic and exact while under capacity") {
    val s = spark
    import s.implicits._
    val xs = (1 to 500).map(_.toDouble)
    val a = s.sparkContext.parallelize(scala.util.Random.shuffle(xs), 5)
      .toDF("v").agg(kll(col("v"), 2048, Seq(0.5))).head.getSeq[Double](0)
    val b = s.sparkContext.parallelize(xs, 1)
      .toDF("v").agg(kll(col("v"), 2048, Seq(0.5))).head.getSeq[Double](0)
    assert(a == b && a == Seq(250.0))
  }

  test("empty input evaluates to null") {
    val s = spark
    import s.implicits._
    val r = Seq.empty[Double].toDF("v")
      .agg(kll(col("v"), 64, Seq(0.5)).as("q")).head
    assert(r.isNullAt(0))
  }
}
