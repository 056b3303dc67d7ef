package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The high-group-cardinality guard in DistributedQuantiles: above the
  * driver-partials budget (P × G), `run` must dispatch to the all-DataFrame
  * `ParallelRank.quantiles` path — and both paths must return identical
  * results so the dispatch is invisible to callers.
  */
class QuantileDispatchSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  // The small-input-bytes dispatch would reroute every in-memory test frame
  // here to the driver-histogram path; pin it off so each test exercises
  // the path it names (its own equality test below re-enables it locally).
  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.graft.quantiles.smallInputBytes", "0")
  }
  override def afterAll(): Unit = {
    spark.conf.unset("spark.graft.quantiles.smallInputBytes")
    super.afterAll()
  }

  // 100k groups x 4 rows each: over budget at any partition count when the
  // hint reports the true G; values are exact in double.
  private lazy val wide = spark.range(0, 400000L)
    .select((col("id") % 100000L).as("g"),
      ((col("id") * 37L) % 1000L).cast("double").as("v"))

  test("both paths agree on a >=100k-group frame (describe)") {
    val qs = Seq("p25" -> 0.25, "p50" -> 0.50, "p75" -> 0.75)
    // forced driver path: lie small so G * P stays under budget is NOT
    // possible at G=100k with budget 2^20 only if P > 10 — pin the truth
    // by hint on both sides instead: tiny hint keeps the driver path,
    // honest hint trips the guard.
    val driverPath = DistributedQuantiles.describe(
      wide, Seq("g"), "v", qs, groupCountHint = Some(1L))
    val fallbackPath = DistributedQuantiles.describe(
      wide, Seq("g"), "v", qs, groupCountHint = Some(100000L))
    val cols = Seq("g", "n", "mean", "std", "vmin", "vmax", "p25", "p50", "p75")
    val a = driverPath.select(cols.map(col): _*)
      .as[(Long, Long, Double, Double, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1)
    val b = fallbackPath.select(cols.map(col): _*)
      .as[(Long, Long, Double, Double, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(a.length == 100000)
    // n/min/max/quantiles exact-equal; mean/std to 1e-9 (different but
    // equivalent accumulation orders)
    a.zip(b).foreach { case (x, y) =>
      assert(x._1 == y._1 && x._2 == y._2)
      assert(math.abs(x._3 - y._3) < 1e-9, s"mean mismatch at g=${x._1}")
      assert(math.abs(x._4 - y._4) < 1e-9 || (x._4.isNaN && y._4.isNaN))
      assert(x._5 == y._5 && x._6 == y._6)
      assert(x._7 == y._7 && x._8 == y._8 && x._9 == y._9)
    }
  }

  test("preCollapse=false (raw-row range shuffle) equals the collapsed path") {
    val df = wide.filter($"g" < 500)
    val qs = Seq("p25" -> 0.25, "p50" -> 0.50, "p75" -> 0.75)
    val cols = Seq("g", "n", "mean", "std", "vmin", "vmax", "p25", "p50", "p75")
    val a = DistributedQuantiles.describe(df, Seq("g"), "v", qs,
      groupCountHint = Some(500L))
      .select(cols.map(col): _*).collect().map(_.toSeq).sortBy(_.head.toString)
    val b = DistributedQuantiles.describe(df, Seq("g"), "v", qs,
      groupCountHint = Some(500L), preCollapse = false)
      .select(cols.map(col): _*).collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.length == 500 && a.toSeq == b.toSeq)
  }

  test("driver-histogram path (distinctValueHint) equals the two-job path") {
    // v lives on a 1000-value grid: the bounded-grid shape the hint declares
    val df = wide.filter($"g" < 50)
    val qs = Seq("p25" -> 0.25, "p50" -> 0.50, "p75" -> 0.75)
    val cols = Seq("g", "n", "mean", "std", "vmin", "vmax", "p25", "p50", "p75")
    val twoJob = DistributedQuantiles.describe(df, Seq("g"), "v", qs,
      groupCountHint = Some(50L))
      .select(cols.map(col): _*).collect().sortBy(_.getLong(0))
    val hist = DistributedQuantiles.describe(df, Seq("g"), "v", qs,
      groupCountHint = Some(50L), distinctValueHint = Some(50L * 1000L))
      .select(cols.map(col): _*).collect().sortBy(_.getLong(0))
    assert(twoJob.length == 50 && hist.length == 50)
    twoJob.zip(hist).foreach { case (x, y) =>
      // n/min/max/quantiles bit-equal (identical rank/weight arithmetic);
      // mean/std to summation-order ulp
      assert(x.getLong(0) == y.getLong(0) && x.getLong(1) == y.getLong(1))
      assert(math.abs(x.getDouble(2) - y.getDouble(2)) < 1e-9)
      assert(math.abs(x.getDouble(3) - y.getDouble(3)) < 1e-9 ||
        (x.getDouble(3).isNaN && y.getDouble(3).isNaN))
      (4 to 8).foreach(i =>
        assert(x.getDouble(i) == y.getDouble(i), s"col $i at g=${x.getLong(0)}"))
    }
  }

  test("a distinctValueHint over the histogram budget falls through") {
    // hint > SmallHistogramBudget must take the normal path, not collect
    val got = DistributedQuantiles.exact(
      wide.filter($"g" === 0L), Seq("g"), "v", Seq("p50" -> 0.5),
      groupCountHint = Some(1L),
      distinctValueHint = Some(DistributedQuantiles.SmallHistogramBudget + 1))
      .as[(Long, Double)].collect()
    assert(got.length == 1)
  }

  test("small-input-bytes dispatch equals the two-job path (near-unique values)") {
    // near-unique continuous values — the regime no distinctValueHint can
    // honestly declare bounded; the byte-gated driver path must agree with
    // the range-shuffle path bit-for-bit on order statistics
    val df = spark.range(0, 20000L)
      .select((col("id") % 7L).as("g"),
        (col("id") * 0.3141592653589793).as("v"))
    val qs = Seq("p25" -> 0.25, "p50" -> 0.50, "p75" -> 0.75)
    val cols = Seq("g", "n", "mean", "std", "vmin", "vmax", "p25", "p50", "p75")
    val twoJob = DistributedQuantiles.describe(df, Seq("g"), "v", qs,
      groupCountHint = Some(7L), preCollapse = false)
      .select(cols.map(col): _*).collect().sortBy(_.getLong(0))
    spark.conf.set("spark.graft.quantiles.smallInputBytes",
      DistributedQuantiles.SmallInputBytesDefault.toString)
    val small =
      try DistributedQuantiles.describe(df, Seq("g"), "v", qs,
        groupCountHint = Some(7L))
        .select(cols.map(col): _*).collect().sortBy(_.getLong(0))
      finally spark.conf.set("spark.graft.quantiles.smallInputBytes", "0")
    assert(twoJob.length == 7 && small.length == 7)
    twoJob.zip(small).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0) && x.getLong(1) == y.getLong(1))
      assert(math.abs(x.getDouble(2) - y.getDouble(2)) < 1e-9)
      assert(math.abs(x.getDouble(3) - y.getDouble(3)) < 1e-9 ||
        (x.getDouble(3).isNaN && y.getDouble(3).isNaN))
      (4 to 8).foreach(i =>
        assert(x.getDouble(i) == y.getDouble(i), s"col $i at g=${x.getLong(0)}"))
    }
  }

  test("small-input dispatch: null group keys sort first and match the two-job path") {
    // null group values must not NPE the driver comparator and must group
    // exactly like the distributed path (which treats null as an ordinary key)
    val df = spark.range(0, 9000L)
      .select(when(col("id") % 3L === 0L, lit(null)).otherwise(col("id") % 3L).as("g"),
        ((col("id") * 13L) % 997L).cast("double").as("v"))
    val qs = Seq("p50" -> 0.5)
    val twoJob = DistributedQuantiles.describe(df, Seq("g"), "v", qs,
      groupCountHint = Some(3L))
      .select(col("g"), col("n"), col("p50")).collect()
      .map(r => (Option(r.get(0)), r.getLong(1), r.getDouble(2))).sortBy(_._1.map(_.toString))
    spark.conf.set("spark.graft.quantiles.smallInputBytes",
      DistributedQuantiles.SmallInputBytesDefault.toString)
    val small =
      try DistributedQuantiles.describe(df, Seq("g"), "v", qs,
        groupCountHint = Some(3L))
        .select(col("g"), col("n"), col("p50")).collect()
        .map(r => (Option(r.get(0)), r.getLong(1), r.getDouble(2))).sortBy(_._1.map(_.toString))
      finally spark.conf.set("spark.graft.quantiles.smallInputBytes", "0")
    assert(twoJob.length == 3 && small.toSeq == twoJob.toSeq)
  }

  test("small-input dispatch: empty input yields an empty frame, like the two-job path") {
    val df = spark.range(0, 100L)
      .select((col("id") % 5L).as("g"), col("id").cast("double").as("v"))
      .filter(col("v") < 0) // empty after filter
    val qs = Seq("p50" -> 0.5)
    spark.conf.set("spark.graft.quantiles.smallInputBytes",
      DistributedQuantiles.SmallInputBytesDefault.toString)
    try {
      assert(DistributedQuantiles.describe(df, Nil, "v", qs).count() == 0)
      assert(DistributedQuantiles.describe(df, Seq("g"), "v", qs,
        groupCountHint = Some(5L)).count() == 0)
    } finally spark.conf.set("spark.graft.quantiles.smallInputBytes", "0")
  }

  test("estimate pre-pass (no hint) routes a high-G frame to the fallback") {
    // with no hint the approx_count_distinct estimate (~100k) x partitions
    // exceeds the 2^20 budget -> ParallelRank path; result stays correct
    val got = DistributedQuantiles.exact(
      wide.filter($"g" < 3), Seq("g"), "v", Seq("p50" -> 0.5))
      .orderBy($"g").as[(Long, Double)].collect()
    // per group: v = (g + 100000k*37) % 1000 for k=0..3 — compute expected
    val expected = (0L until 3L).map { g =>
      val vs = (0 until 4).map(k => ((g + 100000L * k) * 37L % 1000L).toDouble)
        .sorted
      // (n-1)*q = 1.5 -> mean of ranks 2 and 3
      (g, (vs(1) + vs(2)) / 2.0)
    }
    assert(got.toSeq == expected)
  }
}
