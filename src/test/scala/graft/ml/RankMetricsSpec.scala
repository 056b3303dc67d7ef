package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RankMetricsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def auc(pairs: Seq[(Double, Int)]): (Double, Long, Long) = {
    val s = spark
    import s.implicits._
    val r = RankMetrics.rocAuc(pairs.toDF("score", "y"), "score", $"y" === 1)
      .first()
    (r.getAs[Double]("roc_auc"), r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"))
  }

  test("perfect separation gives AUC exactly 1.0") {
    val (a, np, nn) = auc(Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)))
    assert(a == 1.0 && np == 2L && nn == 2L)
  }

  test("inverted scorer gives AUC exactly 0.0") {
    val (a, _, _) = auc(Seq((0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0)))
    assert(a == 0.0)
  }

  test("all scores tied gives AUC exactly 0.5 (midrank convention)") {
    val (a, _, _) = auc(Seq((0.5, 1), (0.5, 1), (0.5, 0), (0.5, 0), (0.5, 0)))
    assert(a == 0.5)
  }

  test("matches the brute-force pair statistic, ties included") {
    val rnd = new scala.util.Random(42)
    // coarse scores force heavy ties — the midrank path under test
    val pairs = Seq.fill(400)((rnd.nextInt(20) / 20.0, rnd.nextInt(2)))
    val pos = pairs.filter(_._2 == 1).map(_._1)
    val neg = pairs.filter(_._2 == 0).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val expected = wins / (pos.size.toDouble * neg.size)
    val (a, np, nn) = auc(pairs)
    assert(np == pos.size.toLong && nn == neg.size.toLong)
    assert(math.abs(a - expected) < 1e-12, s"got $a want $expected")
  }

  test("scale-invariant: monotone transform of scores preserves AUC bit-exactly") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(300)((rnd.nextInt(50) / 10.0, rnd.nextInt(2)))
    val (a1, _, _) = auc(pairs)
    val (a2, _, _) = auc(pairs.map { case (s, y) => (s * 100 + 3, y) })
    assert(a1 == a2)
  }
}
