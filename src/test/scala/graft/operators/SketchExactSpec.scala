package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sketch-then-verify operators: exact output in the genuinely-sketching
  * regime, invariant to partitioning (the determinism gate the pure
  * sketches can't honestly offer — eviction and compaction order depend on
  * partition streams, but the exact second pass erases that).
  */
class SketchExactSpec extends SparkSpec {

  private def zipfItems = {
    val s = spark
    import s.implicits._
    // Zipf-ish: item i has ~ 60000/i occurrences, 200 distinct
    (1 to 200).flatMap(i => Seq.fill(60000 / i)(s"item$i"))
      .toDF("item")
  }

  test("topK: exact and partition-invariant while the sketch evicts") {
    val base = zipfItems
    val expected = (1 to 5).map(i => (s"item$i", (60000 / i).toLong))
    Seq(base.repartition(3), base.repartition(61), base.repartition(16))
      .foreach { df =>
        // capacity 64 << 200 distinct: every partition's summary evicts
        val got = SketchExact.topK(df, "item", k = 5, capacity = 64)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        assert(got == expected)
      }
  }

  test("topK: flat distribution fails certification loudly") {
    val s = spark
    import s.implicits._
    val flat = (1 to 500).flatMap(i => Seq.fill(10)(s"w$i")).toDF("item")
    val e = intercept[IllegalArgumentException] {
      SketchExact.topK(flat.repartition(8), "item", k = 5, capacity = 64)
    }
    assert(e.getMessage.contains("certification failed"))
  }

  test("quantiles: exact and partition-invariant while the sketch compacts") {
    val s = spark
    import s.implicits._
    val n = 100000
    // deterministic non-uniform values with duplicates
    val vals = (0 until n).map(i => ((i * 7919) % 10007).toDouble / 7.0)
    val base = vals.toDF("v")
    val sorted = vals.sorted
    def exactQ(q: Double): Double = sorted(math.max(math.ceil(q * n), 1.0).toInt - 1)
    val expected = Seq(exactQ(0.25), exactQ(0.5), exactQ(0.75))
    Seq(base.repartition(2), base.repartition(47)).foreach { df =>
      // k=64 << n: level 0 compacts ~1500 times
      val got = SketchExact.quantiles(df, "v",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75), k = 64)
        .head()
      assert((0 until 3).map(got.getDouble) == expected)
    }
  }
}
