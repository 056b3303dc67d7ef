package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ParallelRank must equal the single-task window computation exactly (it
  * replaces it on every hot path), and its plan must contain exactly one
  * range exchange — the offsets are only correct against the precise
  * partitioning they were computed from, so the totals branch and the rank
  * branch MUST share one physical shuffle (ReuseExchange).
  */
class ParallelRankSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  // pin the two-job RDD path for the DistributedQuantiles cross-checks —
  // the small-input dispatch would reroute these KB-sized frames to the
  // driver sorted-collect path and void the "agree bit-for-bit" intent
  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.graft.quantiles.smallInputBytes", "0")
  }
  override def afterAll(): Unit = {
    spark.conf.unset("spark.graft.quantiles.smallInputBytes")
    super.afterAll()
  }

  private def sample = {
    val rnd = new scala.util.Random(7)
    // several groups, skewed sizes, duplicate values, many input partitions
    (1 to 5000).map { i =>
      val g = if (i % 10 < 6) "a" else if (i % 10 < 9) "b" else "c"
      (g, rnd.nextInt(300).toDouble, i.toLong)
    }.toDF("g", "v", "id").repartition(13)
  }

  test("rowNumber matches Window row_number on quantile-relevant positions") {
    val df = sample
    val got = ParallelRank.rowNumber(df, Seq("g"), "v")
    val w = Window.partitionBy($"g").orderBy($"v")
    val want = df.withColumn("rn", row_number().over(w))
    // tie order is arbitrary in both: compare the (g, rn) -> v mapping,
    // which is unique because rank positions within ties carry equal v
    // ParallelRank emits long ranks (a 100 TB group overflows int)
    val a = got.select($"g", $"rn".cast("long"), $"v").as[(String, Long, Double)]
      .collect().sorted
    val b = want.select($"g", $"rn".cast("long"), $"v").as[(String, Long, Double)]
      .collect().sorted
    assert(a.length == 5000 && a.sameElements(b))
  }

  test("runningSums matches window cumulative sums incl. group-less + desc") {
    val byV = sample.groupBy($"g", $"v")
      .agg(count(lit(1)).as("n"), sum($"id").as("s"))
    val got = ParallelRank.runningSums(
      byV, Seq("g"), "v", Seq("n", "s"), Seq("cum_n", "cum_s"))
      .select($"g", $"v", $"cum_n", $"cum_s")
      .as[(String, Double, Long, Long)].collect().sorted
    val w = Window.partitionBy($"g").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = byV
      .withColumn("cum_n", sum($"n").over(w))
      .withColumn("cum_s", sum($"s").over(w))
      .select($"g", $"v", $"cum_n", $"cum_s")
      .as[(String, Double, Long, Long)].collect().sorted
    assert(got.sameElements(want))

    // group-less descending: final cumulative count equals row count
    val global = byV.groupBy($"v").agg(sum($"n").as("n"))
    val desc = ParallelRank.runningSums(
      global, Nil, "v", Seq("n"), Seq("cum"), descending = true)
    val rows = desc.select($"v", $"cum").as[(Double, Long)].collect()
    assert(rows.maxBy(_._2)._2 == 5000L)
    // cum at value v (desc) = count of rows with value >= v
    val lookup = rows.toMap
    val check = global.select($"v", $"n").as[(Double, Long)].collect()
    check.foreach { case (v, _) =>
      val expected = check.collect { case (v2, n2) if v2 >= v => n2 }.sum
      assert(lookup(v) == expected, s"desc cum at $v")
    }
  }

  test("quantiles equals the full-rank interpolation, incl. integral k") {
    val df = sample
    // reference: rank every row, two-row interpolation (the q12 round-1 shape)
    val w = Window.partitionBy($"g").orderBy($"v")
    val n = df.groupBy($"g").agg(count(lit(1)).as("n"))
    val ranked = df.withColumn("rn", row_number().over(w))
      .join(broadcast(n), "g")
    def quantile(q: Double) = {
      val k = ($"n" - 1) * q
      val frac = k - floor(k)
      sum(when($"rn" === floor(k) + 1, $"v" * (lit(1) - frac)).otherwise(0.0)
        + when($"rn" === ceil(k) + 1, $"v" * frac).otherwise(0.0))
    }
    val qs = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p99" -> 0.99)
    val want = ranked.groupBy($"g").agg(
      quantile(0.25).as("p25"), quantile(0.5).as("p50"),
      quantile(0.75).as("p75"), quantile(0.99).as("p99"))
      .as[(String, Double, Double, Double, Double)].collect().sorted
    val got = ParallelRank.quantiles(df, Seq("g"), "v", qs)
      .select($"g", $"p25", $"p50", $"p75", $"p99")
      .as[(String, Double, Double, Double, Double)].collect().sorted
    assert(got.sameElements(want))
    // the two-job RDD variant must agree bit-for-bit as well
    val gotDist = DistributedQuantiles.exact(df, Seq("g"), "v", qs)
      .select($"g", $"p25", $"p50", $"p75", $"p99")
      .as[(String, Double, Double, Double, Double)].collect().sorted
    assert(gotDist.sameElements(want))
    val gotDistGlobal = DistributedQuantiles.exact(df, Nil, "v", Seq("med" -> 0.5))
      .select($"med").as[Double].collect()
    val wantGlobalW = df
      .withColumn("rn", row_number().over(Window.orderBy($"v")))
      .crossJoin(broadcast(df.agg(count(lit(1)).as("n"))))
      .groupBy().agg(
        sum(when($"rn" === floor(($"n" - 1) * 0.5) + 1,
          $"v" * (lit(1) - (($"n" - 1) * 0.5 - floor(($"n" - 1) * 0.5))))
          .otherwise(0.0)
          + when($"rn" === ceil(($"n" - 1) * 0.5) + 1,
            $"v" * (($"n" - 1) * 0.5 - floor(($"n" - 1) * 0.5)))
            .otherwise(0.0)).as("med"))
      .as[Double].collect()
    assert(gotDistGlobal.sameElements(wantGlobalW))

    // group-less: single global quantile set, n - 1 divisible case included
    val gotGlobal = ParallelRank.quantiles(df, Nil, "v", Seq("med" -> 0.5))
      .select($"med").as[Double].collect()
    val wantGlobal = ranked
      .withColumn("rn", row_number().over(Window.orderBy($"v")))
      .drop("n").crossJoin(broadcast(df.agg(count(lit(1)).as("n"))))
      .groupBy().agg(quantile(0.5).as("med")).as[Double].collect()
    assert(gotGlobal.sameElements(wantGlobal))
  }

  test("describe moments match Spark aggregates (float32 contract)") {
    val df = sample
    val got = DistributedQuantiles.describe(df, Seq("g"), "v", Seq("p50" -> 0.5))
      .select($"g", $"n", $"mean".cast("float"), $"std".cast("float"),
        $"vmin", $"vmax")
      .as[(String, Long, Float, Float, Double, Double)].collect().sorted
    val want = df.groupBy($"g").agg(
      count(lit(1)).as("n"), avg($"v").cast("float").as("mean"),
      stddev_samp($"v").cast("float").as("std"),
      min($"v").as("vmin"), max($"v").as("vmax"))
      .select($"g", $"n", $"mean", $"std", $"vmin", $"vmax")
      .as[(String, Long, Float, Float, Double, Double)].collect().sorted
    assert(got.sameElements(want))
  }

  test("plan: exactly one range exchange; second occurrence is reused") {
    val got = ParallelRank.rowNumber(sample, Seq("g"), "v")
    got.collect() // materialize the adaptive plan
    val p = got.queryExecution.executedPlan.toString
    val ranges = "rangepartitioning".r
      .findAllIn(p.toLowerCase).size
    val reused = p.contains("ReusedExchange") || p.contains("TableCacheQueryStage") ||
      p.contains("ShuffleQueryStage")
    // the formatted plan shows the range exchange under both branches; at
    // least one must be a reuse marker, not an independent shuffle
    assert(p.toLowerCase.contains("rangepartitioning"), "no range exchange in plan")
    assert(reused, s"no exchange reuse marker in plan:\n$p")
  }
}
