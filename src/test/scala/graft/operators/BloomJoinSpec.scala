package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {

  test("bloom-pruned semi-join equals the plain semi-join (exact: no " +
    "false negatives survive, false positives die in the join)") {
    val s = spark
    import s.implicits._
    val fact = (1L to 50000L).map(i => (i, s"f$i")).toDF("fk", "payload")
      .repartition(8)
    val dim = (1L to 50000L by 97L).map(i => (i, s"d$i")).toDF("dk", "attr")

    val plain = fact.join(dim.select($"dk"), $"fk" === $"dk", "left_semi")
      .collect().map(_.getLong(0)).sorted
    val bloomed = BloomJoin.semiJoin(fact, "fk", dim, "dk")
      .collect().map(_.getLong(0)).sorted
    assert(bloomed.sameElements(plain))
  }

  test("keyFilter prunes most non-matching rows before any exchange") {
    val s = spark
    import s.implicits._
    val fact = (1L to 20000L).toDF("fk")
    val dim = (1L to 100L).toDF("dk")
    val kept = fact.filter(BloomJoin.keyFilter(dim, "dk", col("fk"),
      fpp = 0.01)).count()
    // 100 true matches + ~1% fp of 19900 ≈ 300 max; a broken filter
    // passes everything (20000) or drops true keys (< 100)
    assert(kept >= 100 && kept <= 600, s"bloom kept $kept of 20000")
  }

  test("empty dim side yields an empty result, not a crash") {
    val s = spark
    import s.implicits._
    val fact = (1L to 100L).toDF("fk")
    val dim = Seq.empty[Long].toDF("dk")
    assert(BloomJoin.semiJoin(fact, "fk", dim, "dk").count() == 0)
  }

  test("the probe predicate compiles into the plan as might_contain " +
    "(codegen'd scan-side filter, no UDF)") {
    val s = spark
    import s.implicits._
    // spark.range keeps a physical scan (a LocalTableScan would be
    // constant-folded by ConvertToLocalRelation, filter and all)
    val fact = s.range(1000L).select($"id".as("fk"))
    val dim = s.range(10L).select($"id".as("dk"))
    val plan = BloomJoin.semiJoin(fact, "fk", dim, "dk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no might_contain in:\n$plan")
  }
}
