package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Physical-plan audits (builder brief: "explain the plan and iterate until
  * it's the plan you'd want"): filters and projections reach the parquet
  * scan, dimension joins broadcast, hot paths stay in whole-stage codegen.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf("sf0.01"))
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q02: predicate pushdown and column pruning reach the scan") {
    val p = plan("q02_filter_topk")
    assert(p.contains("PushedFilters:"), "no pushed filters")
    assert(p.contains("GreaterThan(o_totalprice"), p.linesIterator.take(5).mkString)
    // pruned read schema: only the 4 projected + filtered columns
    assert(!p.contains("o_comment"), "scan reads unprojected columns")
    // top-k compiles to TakeOrderedAndProject, not a full sort
    assert(p.contains("TakeOrderedAndProject"), "limit+orderBy not fused")
  }

  test("q03: dimension chain broadcasts; no shuffle for small sides") {
    val p = plan("q03_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), "dimension joins not broadcast")
  }

  test("q01: aggregation runs inside whole-stage codegen with partial agg") {
    assert(plan("q01_pricing_summary").contains("partial_sum"),
      "no map-side partial aggregation")
    // codegen spans only materialize in the FINAL adaptive plan — execute,
    // then inspect
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf("sf0.01"))
    df.collect()
    // codegen spans print as "*(n)" prefixes in the simple tree
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "no codegen span in final plan")
  }

  test("q04: semi join prunes the build side to the key column") {
    val p = plan("q04_semi_join")
    assert(p.contains("LeftSemi"), "not a semi join")
    // the orders scan feeding the semi join should read only o_custkey
    val ordersRead = p.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("o_custkey"))
      .mkString
    assert(!ordersRead.contains("o_totalprice"),
      "semi-join build side reads extra columns")
  }

  test("q16: text features scan reads only the needed columns") {
    val p = plan("q16_text_features")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("lang"), "unused documents columns read")
  }
}
