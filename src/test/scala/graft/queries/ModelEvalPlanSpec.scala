package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Plan audits for the round-10 additions (same brief as PlanSpec: iterate
  * until it's the plan you'd want, then pin it).
  */
class ModelEvalPlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf("sf0.01"))
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q160: AUC never plans a single-partition global-order window") {
    // the cumulative negatives come from ParallelRank's range exchange —
    // a Window with a global ORDER BY (empty partition spec) would be the
    // single-task scalability bug the operator exists to avoid
    val p = plan("q160_roc_auc")
    val globalWindow = p.linesIterator.exists(l =>
      l.contains("Window") && l.contains("ORDER BY") &&
        !l.contains("PARTITION BY"))
    assert(!globalWindow, "global-order window in the AUC plan")
    assert(p.contains("rangepartitioning") || p.contains("RangePartitioning"),
      "no range exchange for the cumulative counts")
  }

  test("q159/q165: one scan collapses to the bin frame with partial aggregation") {
    for (q <- Seq("q159_psi_drift", "q165_woe_iv")) {
      val p = plan(q)
      assert(p.contains("partial_sum") || p.contains("partial_count"),
        s"$q: no map-side partial aggregation")
      // events.props/event_id never read — only value and event_type.
      // Only assertable against a direct parquet scan: under the shared
      // test session another suite may have CACHED the full events table,
      // and the InMemoryRelation legitimately lists every column.
      if (!p.contains("InMemoryRelation"))
        assert(!p.contains("props"), s"$q: scan reads unused columns")
    }
  }

  test("q164: both windows (rank + frame median) share one user_id exchange") {
    val p = plan("q164_rolling_median")
    val exchanges = p.linesIterator.count(_.trim.startsWith("(")) // noop guard
    val hashParts = "hashpartitioning\\(user_id".r
      .findAllIn(p.toLowerCase).length
    assert(hashParts <= 1,
      s"rolling median plans $hashParts user_id exchanges, want 1:\n" +
        p.linesIterator.filter(_.toLowerCase.contains("exchange"))
          .mkString("\n"))
  }

  test("q163: each k-means pass partial-aggregates to k rows; embeddings never shuffle") {
    val df = SparkEntry.queries("q163_kmeans_lloyd")(spark, sf("sf0.001"))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("partial_sum"), "no map-side combine in the stats agg")
    // the shuffle carries per-cell sums (s1..s64 longs), never the v array
    val exchangeBlock = p.linesIterator.dropWhile(!_.contains("Exchange"))
      .take(3).mkString
    assert(!exchangeBlock.contains("array"), "vector column crosses a shuffle")
  }

  test("q166: the EWMA fold input is one exchange on the key") {
    val p = plan("q166_daily_ewma")
    val hashParts = "hashpartitioning\\(event_type".r
      .findAllIn(p.toLowerCase).length
    assert(hashParts >= 1, "no key exchange ahead of the fold")
    assert(p.contains("SortWithinPartitions") || p.contains("Sort "),
      "no within-partition sort ahead of the fold")
  }
}
