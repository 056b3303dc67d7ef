package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** General relational operator surface (SURVEY.md §2.1–§2.6): scans with
  * pushdown, projections/filters/casts, equi/semi/anti joins, grouped and
  * windowed aggregation, set ops, distinct counts, describe-style statistics
  * and histograms.
  *
  * Scale notes baked into each plan:
  *  - filters and projections are expressed before joins/aggregates so
  *    Catalyst pushes them into the parquet scan (check `PushedFilters`);
  *  - dimension tables (region/nation/customer at fact-join time) ride
  *    broadcast joins — the autoBroadcastJoinThreshold in GraftSession keeps
  *    them broadcast-able far past these scale factors;
  *  - every aggregate is a partial (map-side) + final hash aggregate: no
  *    driver-side loops, no collect.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: full-scan grouped aggregate with
    * map-side partial aggregation; grouping cardinality is tiny (R/A/N ×
    * status) so the shuffle carries only partial-aggregate rows.
    */
  private val q01 = QueryDef.sql(
    "grouped aggregate over lineitem (TPC-H Q1 shape)")(
    """SELECT l_returnflag, l_linestatus,
      |  cast(sum(l_quantity) AS REAL)       AS sum_qty,
      |  cast(sum(l_extendedprice) AS REAL)  AS sum_base_price,
      |  cast(sum(l_extendedprice * (1 - l_discount)) AS REAL) AS sum_disc_price,
      |  cast(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS REAL) AS sum_charge,
      |  cast(avg(l_quantity) AS REAL)       AS avg_qty,
      |  cast(avg(l_extendedprice) AS REAL)  AS avg_price,
      |  cast(avg(l_discount) AS REAL)       AS avg_disc,
      |  count(*)                        AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables(s, dir).lineitem
      .filter($"l_shipdate" <= "2000-12-01")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").cast("float").as("sum_qty"),
        sum($"l_extendedprice").cast("float").as("sum_base_price"),
        sum($"l_extendedprice" * (lit(1) - $"l_discount")).cast("float").as("sum_disc_price"),
        sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")).cast("float").as("sum_charge"),
        avg($"l_quantity").cast("float").as("avg_qty"),
        avg($"l_extendedprice").cast("float").as("avg_price"),
        avg($"l_discount").cast("float").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .smallOrdered($"l_returnflag", $"l_linestatus")
  }

  /** Selective filter + narrow projection + top-k: predicate and the 4-column
    * ReadSchema both push into the scan; the sort is a TakeOrderedAndProject,
    * not a full sort.
    */
  private val q02 = QueryDef.sql(
    "filter/projection pushdown + top-k over orders")(
    """SELECT o_orderkey, o_custkey, o_totalprice AS total_price, o_orderpriority
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '2000-01-01' AND o_totalprice > 400000
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables(s, dir).orders
      .filter($"o_orderdate" >= "2000-01-01" && $"o_totalprice" > 400000)
      .select($"o_orderkey", $"o_custkey",
        $"o_totalprice".as("total_price"), $"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  /** Fact-to-fact join (lineitem ⋈ orders, shuffle on orderkey) with the
    * customer/nation/region dimension chain broadcast; revenue per nation.
    */
  private val q03 = QueryDef.sql(
    "multi-way join: revenue by region/nation")(
    """SELECT r_name, n_name,
      |  cast(sum(l_extendedprice * (1 - l_discount)) AS REAL) AS revenue,
      |  count(DISTINCT o_orderkey) AS n_orders
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
    import s.implicits._
    val t = Tables(s, dir)
    // Pre-aggregate lineitem to order grain BEFORE the join: o_orderkey is
    // unique post-agg, so count(DISTINCT) becomes a plain count and the
    // Expand (2x row amplification through the aggregate) disappears. Same
    // exchange count — the order-grain aggregate is already partitioned on
    // the join key, so the join reuses it — and the final aggregate reads
    // 1 row per order instead of 2 per lineitem.
    val perOrder = t.lineitem
      .groupBy($"l_orderkey")
      .agg(sum($"l_extendedprice" * (lit(1) - $"l_discount")).as("__rev"))
    perOrder
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(t.customer), $"o_custkey" === $"c_custkey")
      .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(t.region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        sum($"__rev").cast("float").as("revenue"),
        count(lit(1)).as("n_orders"))
      .smallOrdered($"r_name", $"n_name")
  }

  /** Left-semi join: customers that placed at least one order. The semi join
    * needs only the key column from orders — column pruning makes the build
    * side a single-column broadcast.
    */
  private val q04 = QueryDef.sql(
    "left-semi join, customers with orders by segment")(
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    import s.implicits._
    val t = Tables(s, dir)
    t.customer
      .join(t.orders, $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .smallOrdered($"c_mktsegment")
  }

  /** Left-anti join: customers with no high-value order. The filter on the
    * right side is applied before the join, so it both shrinks the build side
    * and keeps the result non-empty at every scale factor.
    */
  private val q05 = QueryDef.sql(
    "left-anti join, customers without high-value orders by segment")(
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_totalprice > 300000)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    import s.implicits._
    val t = Tables(s, dir)
    t.customer
      .join(t.orders.filter($"o_totalprice" > 300000),
        $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .smallOrdered($"c_mktsegment")
  }

  /** Windowed top-k per group (rank-and-filter): single shuffle on the
    * partition key, then a per-partition sort; ties broken deterministically
    * by orderkey.
    */
  private val q06 = QueryDef.sql(
    "window row_number top-3 orders per priority")(
    """SELECT o_orderpriority, rn, o_orderkey, o_totalprice AS total_price
      |FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_orderpriority, rn""".stripMargin) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables(s, dir).orders
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_orderpriority", $"rn", $"o_orderkey",
        $"o_totalprice".as("total_price"))
      .smallOrdered($"o_orderpriority", $"rn")
  }

  /** Latest-value-per-key (SURVEY.md §2.5 W1 shape: latest metric per
    * metric_name, expressed over the events table): window top-1 per key.
    */
  private val q07 = QueryDef.sql(
    "latest event per user (W1 latest-per-metric shape)")(
    """SELECT user_id, event_id, event_type, value AS value
      |FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    Tables(s, dir).events
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type", $"value")
      .cachedOrdered($"user_id")
  }

  /** Metric time series (SURVEY.md §2.5 W2 shape) rolled up to daily grain:
    * event-time bucketing via date_trunc — the batch analog of a tumbling
    * window in Structured Streaming.
    */
  private val q08 = QueryDef.sql(
    "daily time-series aggregate per event_type (W2 shape)")(
    """SELECT cast(date_trunc('day', ts) AS DATE) AS day, event_type,
      |  count(*) AS n, cast(avg(value) AS REAL) AS avg_value, cast(sum(value) AS REAL) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables(s, dir).events
      .groupBy(to_date(date_trunc("day", $"ts")).as("day"), $"event_type")
      .agg(count(lit(1)).as("n"),
        avg($"value").cast("float").as("avg_value"),
        sum($"value").cast("float").as("sum_value"))
      .smallOrdered($"day", $"event_type")
  }

  /** INTERSECT: high-balance customers that also appear in orders. */
  private val q09 = QueryDef.sql(
    "set intersect of customer keys")(
    """SELECT count(*) AS n FROM (
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      |  INTERSECT
      |  SELECT o_custkey FROM orders)""".stripMargin) { (s, dir) =>
    import s.implicits._
    val t = Tables(s, dir)
    t.customer.filter($"c_acctbal" > 5000).select($"c_custkey")
      .intersect(t.orders.select($"o_custkey".as("c_custkey")))
      .agg(count(lit(1)).as("n"))
  }

  /** EXCEPT: customer keys minus ordering keys. */
  private val q10 = QueryDef.sql(
    "set except of customer keys")(
    """SELECT count(*) AS n FROM (
      |  SELECT c_custkey FROM customer
      |  EXCEPT
      |  SELECT o_custkey FROM orders)""".stripMargin) { (s, dir) =>
    import s.implicits._
    val t = Tables(s, dir)
    t.customer.select($"c_custkey")
      .except(t.orders.select($"o_custkey".as("c_custkey")))
      .agg(count(lit(1)).as("n"))
  }

  /** Exact distinct counts (SURVEY.md §2.4 A12). At 100 TB the approximate
    * variant (`approx_count_distinct`, HLL) is the default path — exact
    * distinct is the correctness oracle here.
    */
  private val q11 = QueryDef.sql(
    "exact distinct counts over lineitem keys")(
    """SELECT count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey)  AS n_supps,
      |  count(DISTINCT l_orderkey) AS n_orders,
      |  count(*) AS n_rows
      |FROM lineitem""".stripMargin) { (s, dir) =>
    import s.implicits._
    // Multiple DISTINCT aggregates in one Aggregate plan via Expand — 4x
    // the input rows through the exchange. Submitting one single-distinct
    // job per column concurrently (the q12 branch-split pattern) keeps
    // each job expand-free and the wall clock at max, not sum; at 100 TB
    // each branch is an independent shuffle-light count over one column.
    val li = Tables(s, dir).lineitem
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val branches = Seq(
      Future(li.select(countDistinct($"l_partkey")).head().getLong(0)),
      Future(li.select(countDistinct($"l_suppkey")).head().getLong(0)),
      Future(li.select(countDistinct($"l_orderkey")).head().getLong(0)),
      Future(li.count()))
    val Seq(nParts, nSupps, nOrders, nRows) =
      Await.result(Future.sequence(branches), Duration.Inf)
    li.sparkSession.range(1).select(
      lit(nParts).as("n_parts"), lit(nSupps).as("n_supps"),
      lit(nOrders).as("n_orders"), lit(nRows).as("n_rows"))
  }

  /** describe() (SURVEY.md §2.2 P12): count/mean/std/min/quartiles/max per
    * numeric column, one aggregate pass per column unioned into a tall table.
    * Exact interpolated percentiles — matches DuckDB quantile_cont.
    */
  private val q12 = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val oracleParts = cols.map { c =>
      s"""SELECT '$c' AS col_name, count($c) AS n, cast(avg($c) AS REAL) AS mean,
         |  cast(stddev_samp($c) AS REAL) AS std, min($c) AS vmin,
         |  cast(quantile_cont($c, 0.25) AS REAL) AS p25,
         |  cast(quantile_cont($c, 0.50) AS REAL) AS p50,
         |  cast(quantile_cont($c, 0.75) AS REAL) AS p75,
         |  max($c) AS vmax
         |FROM lineitem""".stripMargin
    }
    QueryDef.sql("describe-style summary stats per lineitem column")(
      oracleParts.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")) { (s, dir) =>
      import s.implicits._
      // Exact percentiles + moments, split by column domain:
      //  - quantity/discount/tax live on tiny bounded grids (50/11/9
      //    values at any SF), so all three ride ONE aggregate job as
      //    mergeable ValueHistogramAgg buffers — no melt generator, no
      //    per-value row exchange (describeGridColumns; the earlier
      //    single-melt form paid a 2.4M-row stack + hash agg + range
      //    shuffle + two collect jobs: 2.8 s vs ~1.0 s at sf0.1);
      //  - extendedprice is near-unique/continuous, so it keeps the
      //    range-shuffle two-job order-statistics path (preCollapse=false:
      //    collapsing a near-unique column shuffles the same volume twice).
      // Neither path uses the built-in Percentile aggregate (buffers every
      // distinct value per partition — the classic 100 TB OOM) nor a
      // window sort (one task per column at any cluster size).
      val li = Tables(s, dir).lineitem
      val qs = Seq("p25" -> 0.25, "p50" -> 0.50, "p75" -> 0.75)
      // the two branches collect eagerly and share no lineage — submit
      // their jobs concurrently (Spark's scheduler interleaves them across
      // the same executors; wall = max of the branches, not the sum)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val fGrids = Future(graft.operators.DistributedQuantiles
        .describeGridColumns(li, Seq("l_quantity", "l_discount", "l_tax"), qs))
      val fPrice = Future(graft.operators.DistributedQuantiles
        .describe(li.select($"l_extendedprice").filter($"l_extendedprice".isNotNull),
          Seq.empty, "l_extendedprice", qs,
          groupCountHint = Some(1L), preCollapse = false)
        .withColumn("col_name", lit("l_extendedprice")))
      val grids = Await.result(fGrids, Duration.Inf)
      val price = Await.result(fPrice, Duration.Inf)
      grids.union(price.select(grids.columns.map(col): _*))
        .select($"col_name", $"n", $"mean".cast("float").as("mean"),
          $"std".cast("float").as("std"), $"vmin",
          $"p25".cast("float").as("p25"), $"p50".cast("float").as("p50"),
          $"p75".cast("float").as("p75"), $"vmax")
        .smallOrdered($"col_name")
    }
  }

  /** Grouped describe (SURVEY.md §2.4 A1): per-group distribution stats. */
  private val q13 = QueryDef.sql(
    "grouped describe of events.value by event_type")(
    """SELECT event_type, count(*) AS n, cast(avg(value) AS REAL) AS mean,
      |  cast(stddev_samp(value) AS REAL) AS std, min(value) AS vmin,
      |  cast(quantile_cont(value, 0.25) AS REAL) AS p25,
      |  cast(quantile_cont(value, 0.50) AS REAL) AS p50,
      |  cast(quantile_cont(value, 0.75) AS REAL) AS p75,
      |  max(value) AS vmax
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    import s.implicits._
    // Same two-job exact-describe shape as q12 (see there): no per-group
    // single sort task, no value-buffering Percentile aggregate.
    val ev = Tables(s, dir).events.select($"event_type", $"value")
      .filter($"value".isNotNull)
    graft.operators.DistributedQuantiles
      .describe(ev, Seq("event_type"), "value",
        Seq("p25" -> 0.25, "p50" -> 0.50, "p75" -> 0.75),
        // event taxonomy is enum-grain (bounded set of type names);
        // value is a near-unique continuous double, so the pre-collapse
        // aggregate would shuffle the same volume twice — range-shuffle
        // the raw (type, value) rows once instead
        groupCountHint = Some(100L), preCollapse = false)
      .select($"event_type", $"n", $"mean".cast("float").as("mean"),
        $"std".cast("float").as("std"), $"vmin",
        $"p25".cast("float").as("p25"), $"p50".cast("float").as("p50"),
        $"p75".cast("float").as("p75"), $"vmax")
      .smallOrdered($"event_type")
  }

  /** Null/duplicate profile (SURVEY.md §2.2 P10/P11): null scan + duplicate
    * count in one aggregate pass (count - countDistinct), no second scan.
    */
  private val q14 = QueryDef.sql(
    "null + duplicate profile of documents")(
    """SELECT count(*) AS n_docs,
      |  count(DISTINCT text) AS n_unique_text,
      |  count(*) - count(DISTINCT text) AS n_dup_text,
      |  cast(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
      |  cast(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_lang,
      |  count(DISTINCT lang) AS n_langs,
      |  cast(avg(n_chars) AS REAL) AS avg_chars
      |FROM documents""".stripMargin) { (s, dir) =>
    import s.implicits._
    // distinct-count over the 16-byte md5 fingerprint, not the raw text:
    // shuffling full documents to count distinct texts is the classic
    // 100 TB mistake (value-equal by construction; md5 collisions aside)
    val fp = graft.functions.TextAnalysis.fingerprint($"text")
    Tables(s, dir).documents.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(fp).as("n_unique_text"),
      (count(lit(1)) - countDistinct(fp)).as("n_dup_text"),
      sum(when($"text".isNull, 1).otherwise(0)).as("n_null_text"),
      sum(when($"lang".isNull, 1).otherwise(0)).as("n_null_lang"),
      countDistinct($"lang").as("n_langs"),
      avg($"n_chars").cast("float").as("avg_chars"))
  }

  /** Fixed-width histogram (SURVEY.md §2.4 A2): data-independent bucket
    * boundaries keep it a single grouped aggregate (no min/max pre-pass, no
    * driver round-trip).
    */
  private val q15 = QueryDef.sql(
    "fixed-width histogram of l_extendedprice")(
    """SELECT cast(floor(l_extendedprice / 5000) AS BIGINT) AS bucket,
      |  count(*) AS n,
      |  min(l_extendedprice) AS lo,
      |  max(l_extendedprice) AS hi
      |FROM lineitem
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables(s, dir).lineitem
      .groupBy(floor($"l_extendedprice" / 5000).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min($"l_extendedprice").as("lo"),
        max($"l_extendedprice").as("hi"))
      .smallOrdered($"bucket")
  }

  /** The `spark.sql` entry point driven end-to-end (SURVEY.md §3.3): ONE
    * ANSI SQL string — correlated scalar subqueries (per-nation balance
    * average as an exact integer cross-multiplication, no float compare on
    * a decision boundary) plus a correlated EXISTS — runs verbatim on both
    * engines; `Tables.registerAll()` exposes the corpus as temp views and
    * Catalyst decorrelates the subqueries into aggregate + broadcast joins
    * (no per-row re-execution anywhere).
    */
  private val Q106Sql =
    """SELECT n_name AS nation, count(*) AS n_rich
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE CAST(round(c_acctbal*100) AS BIGINT) *
      |      (SELECT count(*) FROM customer c2
      |       WHERE c2.c_nationkey = customer.c_nationkey)
      |    > (SELECT sum(CAST(round(c3.c_acctbal*100) AS BIGINT))
      |       FROM customer c3 WHERE c3.c_nationkey = customer.c_nationkey)
      |  AND EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey
      |                AND o_orderpriority = '1-URGENT')
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  private val q106 = QueryDef.sql(
    "SQL entry point: correlated subqueries + EXISTS, one string, both engines")(
    Q106Sql) { (s, dir) =>
    // register + analyze atomically: the shared test session builds queries
    // from several SF dirs, and view resolution happens at analysis time —
    // after s.sql returns, the plan is bound and re-registration is harmless
    Relational.synchronized {
      Tables(s, dir).registerAll()
      s.sql(Q106Sql)
    }
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q01_pricing_summary" -> q01,
    "q02_filter_topk" -> q02,
    "q03_revenue_by_nation" -> q03,
    "q04_semi_join" -> q04,
    "q05_anti_join" -> q05,
    "q06_topk_per_group" -> q06,
    "q07_latest_event_per_user" -> q07,
    "q08_daily_timeseries" -> q08,
    "q09_set_intersect" -> q09,
    "q10_set_except" -> q10,
    "q11_distinct_counts" -> q11,
    "q12_summary_stats" -> q12,
    "q13_grouped_describe" -> q13,
    "q14_null_dup_profile" -> q14,
    "q15_histogram" -> q15,
    "q106_sql_entry_subqueries" -> q106
  )
}
