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
}
