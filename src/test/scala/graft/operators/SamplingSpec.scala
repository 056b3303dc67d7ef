package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1L to 10000L).map(i => (i, s"s${i % 7}"))
    .toDF("id", "stratum")

  test("hashThreshold: deterministic, partitioning-independent, ~fraction") {
    val a = Sampling.hashThreshold(df, "id", 0.2)
      .select($"id").as[Long].collect().sorted
    val b = Sampling.hashThreshold(df.repartition(13), "id", 0.2)
      .select($"id").as[Long].collect().sorted
    assert(a.toSeq == b.toSeq, "selection depends on partitioning")
    // binomial around 2000 (sd ~40): a generous band
    assert(a.length > 1700 && a.length < 2300, s"got ${a.length}")
    // edge fractions
    assert(Sampling.hashThreshold(df, "id", 0.0).count() == 0L)
    assert(Sampling.hashThreshold(df, "id", 1.0).count() == 10000L)
  }

  test("stratifiedExact: exact per-stratum quotas, deterministic membership") {
    val out = Sampling.stratifiedExact(df, Seq("stratum"), "id", 0.1)
    val got = out.groupBy($"stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.groupBy($"stratum").count()
      .collect().map(r => r.getString(0) -> math.ceil(r.getLong(1) * 0.1).toLong)
      .toMap
    assert(got == want, s"quotas: got $got want $want")
    // reruns (and different partitionings) select the same ids
    val a = out.select($"id").as[Long].collect().sorted
    val b = Sampling.stratifiedExact(df.repartition(17), Seq("stratum"), "id", 0.1)
      .select($"id").as[Long].collect().sorted
    assert(a.toSeq == b.toSeq)
    // schema passthrough: original columns only
    assert(out.columns.toSeq == Seq("id", "stratum"))
  }

  private lazy val weighted = (1L to 5000L).map(i => (i, 1L + i % 100))
    .toDF("id", "w")

  test("prioritySample: deterministic, partitioning-independent, size k") {
    val a = Sampling.prioritySample(weighted, "id", "w", k = 200)
    val b = Sampling.prioritySample(weighted.repartition(13), "id", "w", 200)
    val idsA = a.select($"id").as[Long].collect().sorted
    val idsB = b.select($"id").as[Long].collect().sorted
    assert(idsA.length == 200)
    assert(idsA.toSeq == idsB.toSeq, "selection depends on partitioning")
    // est_w floats identical across partitionings too (τ is a plan value)
    val ewA = a.orderBy($"id").select($"est_w").as[Double].collect()
    val ewB = b.orderBy($"id").select($"est_w").as[Double].collect()
    assert(ewA.toSeq == ewB.toSeq)
  }

  test("prioritySample: Horvitz-Thompson estimate lands near the true total") {
    val out = Sampling.prioritySample(weighted, "id", "w", k = 500)
    val est = out.agg(sum($"est_w")).head().getDouble(0)
    val truth = weighted.agg(sum($"w")).head().getLong(0).toDouble
    // unbiased with variance ~ (truth/k)·tail-weight: ±15% is generous at k=500
    assert(math.abs(est - truth) / truth < 0.15,
      s"HT estimate $est vs true $truth")
    // every sampled row's estimate weight >= its own weight (max(w, τ))
    assert(out.filter($"est_w" < $"w".cast("double")).count() == 0)
  }

  test("prioritySample: k >= population returns every row with est_w = w") {
    val tiny = (1L to 50L).map(i => (i, i)).toDF("id", "w")
    val out = Sampling.prioritySample(tiny, "id", "w", k = 50)
    assert(out.count() == 50)
    assert(out.filter($"est_w" =!= $"w".cast("double")).count() == 0)
  }

  test("apportionment: quotas sum to total, within one seat of proportional") {
    val w = Seq(("a", 37L), ("b", 41L), ("c", 22L)).toDF("src", "w")
    val out = Sampling.apportionLargestRemainder(w, Seq("src"), "w", total = 10L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // shares: 3.7, 4.1, 2.2 -> bases 3,4,2 = 9; one extra to largest
    // remainder (a at .7)
    assert(out == Map("a" -> ((3L, 1L, 4L)), "b" -> ((4L, 0L, 4L)),
      "c" -> ((2L, 0L, 2L))))
    assert(out.values.map(_._3).sum == 10L)
  }

  test("apportionment: remainder ties break to the first key ascending") {
    val w = Seq(("x", 1L), ("y", 1L), ("z", 2L)).toDF("src", "w")
    // total 5, W=4: shares 1.25, 1.25, 2.5 -> bases 1,1,2 = 4; one extra;
    // remainders 1, 1, 2 -> z wins the seat outright
    val out = Sampling.apportionLargestRemainder(w, Seq("src"), "w", total = 5L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out == Map("x" -> 1L, "y" -> 1L, "z" -> 3L))
    // and with total 7: shares 1.75,1.75,3.5 -> bases 1,1,3 = 5; two extras;
    // remainders 3,3,2 -> x and y (tie broken by key, both get one)
    val out7 = Sampling.apportionLargestRemainder(w, Seq("src"), "w", total = 7L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out7 == Map("x" -> 2L, "y" -> 2L, "z" -> 3L))
  }
}
