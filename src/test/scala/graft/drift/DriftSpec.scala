package graft.drift

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KsTestSpec extends SparkSpec {
  import spark.implicits._

  test("identical samples give ks_stat 0 and p-value 1") {
    val df = (0 until 200).map(i => (i % 50, i < 100)).toDF("v", "cur")
    val r = KsTest.test(df, "v", $"cur")
    assert(r.statistic == 0.0)
    assert(r.pValue == 1.0)
    assert(!r.drifted)
    assert(r.nCurrent == 100 && r.nReference == 100)
  }

  test("disjoint samples give ks_stat 1 and tiny p-value") {
    val df = ((1 to 100).map(i => (i, true)) ++ (201 to 300).map(i => (i, false)))
      .toDF("v", "cur")
    val r = KsTest.test(df, "v", $"cur")
    assert(r.statistic == 1.0)
    assert(r.pValue < 1e-6)
    assert(r.drifted)
  }

  test("known two-sample case matches scipy.stats.ks_2samp asymptotic value") {
    // x = 0..9, y = 5..14: D = 0.5, n1 = n2 = 10.
    // scipy ks_2samp(mode="asymp") gives pvalue ≈ 0.1641 (en-corrected form
    // used here gives the classical Smirnov approximation ≈ 0.11 — assert
    // the statistic exactly and the p-value's order of magnitude).
    val df = ((0 until 10).map(i => (i, true)) ++ (5 until 15).map(i => (i, false)))
      .toDF("v", "cur")
    val r = KsTest.test(df, "v", $"cur")
    assert(math.abs(r.statistic - 0.5) < 1e-12)
    assert(r.pValue > 0.05 && r.pValue < 0.3)
  }

  test("kolmogorov survival function reference values") {
    // Q(t) values from the published Kolmogorov distribution table.
    assert(math.abs(KsTest.kolmogorovSurvival(1.36) - 0.0505) < 0.002)
    assert(math.abs(KsTest.kolmogorovSurvival(1.63) - 0.0098) < 0.001)
    assert(KsTest.kolmogorovSurvival(0.4) > 0.99)
  }

  test("binned KS approximates exact KS on a shifted continuous sample") {
    val rnd = new scala.util.Random(7)
    val cur = Seq.fill(2000)(rnd.nextGaussian()).map((_, true))
    val ref = Seq.fill(2000)(rnd.nextGaussian() + 0.5).map((_, false))
    val df = (cur ++ ref).toDF("v", "cur")
    val exact = KsTest.statistic(df, "v", $"cur").first().getAs[Double]("ks_stat")
    val binned = KsTest.binnedStatistic(df, "v", $"cur", bins = 1000)
      .first().getAs[Double]("ks_stat")
    assert(math.abs(exact - binned) < 0.01)
    // shift of 0.5 sigma on n=2000: decisively drifted
    assert(KsTest.pValue(exact, 2000, 2000) < 1e-6)
  }
}

class ChiSquaredSpec extends SparkSpec {
  import spark.implicits._

  test("identical categorical distributions are not drifted") {
    val df = (0 until 600).map(i => (s"c${i % 3}", i % 2 == 0)).toDF("cat", "cur")
    val r = ChiSquared.test(df, "cat", $"cur")
    assert(r.statistic < 1e-9)
    assert(r.pValue > 0.999)
    assert(!r.drifted)
    assert(r.dof == 2)
  }

  test("known 2x2 contingency table matches hand-computed chi2") {
    // cur: 30 a, 10 b; ref: 10 a, 30 b → chi2 = 20.0, dof 1, p ≈ 7.7e-6
    val rows =
      Seq.fill(30)(("a", true)) ++ Seq.fill(10)(("b", true)) ++
        Seq.fill(10)(("a", false)) ++ Seq.fill(30)(("b", false))
    val r = ChiSquared.test(rows.toDF("cat", "cur"), "cat", $"cur")
    assert(math.abs(r.statistic - 20.0) < 1e-9)
    assert(r.dof == 1)
    assert(math.abs(r.pValue - 7.744e-6) < 1e-8)
    assert(r.drifted)
  }

  test("shifted distribution on testdata-sized input is detected") {
    val rnd = new scala.util.Random(3)
    val cur = Seq.fill(1000)((s"c${rnd.nextInt(4)}", true))
    val ref = Seq.fill(1000)((s"c${math.min(rnd.nextInt(5), 3)}", false))
    val r = ChiSquared.test((cur ++ ref).toDF("cat", "cur"), "cat", $"cur")
    assert(r.drifted)
  }
}
