package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Warehouse-analytics operator surface added round 5: gap sessionization,
  * multi-level rollup aggregation, frame-based rolling windows (moving
  * sum/avg + lag deltas), and wide pivot. These are the operator classes a
  * metric-store consumer (SURVEY.md §2.5's Grafana dashboard SQLs) reaches
  * for next after latest-per-key and plain time series — and none of them
  * were previously under the oracle gate.
  *
  * Scale notes common to the file: every window here is partitioned by a
  * real key or fed by a calendar-grain pre-aggregate (bounded rows per
  * partition); rollup/pivot are single grouped aggregates (pivot with an
  * explicit value list — no driver-side distinct pre-pass); all time math is
  * exact integer microseconds.
  */
object Analytics {

  /** Gap-based sessionization over the events stream: 30-minute inactivity
    * splits a user's events into sessions; per-user session stats. All
    * outputs are exact integers, so the oracle replay is bit-deterministic.
    */
  private val q39 = QueryDef.sql(
    "gap sessionization (30 min) of events; per-user session stats")(
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tus,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |                            ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |s AS (
      |  SELECT user_id, tus,
      |    sum(CASE WHEN prev IS NULL OR tus - prev > 1800000000
      |             THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY tus, event_id
      |            ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM e),
      |g AS (
      |  SELECT user_id, session_id, count(*) AS n_ev,
      |    max(tus) - min(tus) AS dur_us
      |  FROM s GROUP BY 1, 2)
      |SELECT user_id,
      |  count(*) AS n_sessions,
      |  cast(sum(n_ev) AS BIGINT) AS n_events,
      |  max(dur_us) AS longest_session_us,
      |  cast(sum(dur_us) AS BIGINT) AS total_session_us
      |FROM g GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    graft.operators.Sessionize.stats(
      Tables(s, dir).events, Seq("user_id"), "ts", "event_id",
      gapMicros = 1800000000L)
      .cachedOrdered($"user_id")
  }

  /** ROLLUP multi-level aggregate: revenue at (region, nation), per-region
    * subtotal, and grand total in one pass — Spark plans one Expand +
    * hash aggregate, not three scans. Dimensions ride broadcast joins.
    * NULLS FIRST is pinned on both sides (Spark's asc default vs DuckDB's
    * NULLS LAST default would otherwise order the subtotal rows
    * differently).
    */
  private val q40 = QueryDef.sql(
    "rollup: order revenue by region/nation with subtotals + grand total")(
    """SELECT r_name, n_name,
      |  cast(sum(o_totalprice) AS REAL) AS revenue,
      |  count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin) { (s, dir) =>
    import s.implicits._
    val t = Tables(s, dir)
    t.orders
      .join(broadcast(t.customer), $"o_custkey" === $"c_custkey")
      .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(t.region), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(
        sum($"o_totalprice").cast("float").as("revenue"),
        count(lit(1)).as("n_orders"))
      .smallOrdered($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  /** Frame-based rolling windows over a calendar-grain pre-aggregate: daily
    * event counts per type, then a 7-row moving sum/avg and a day-over-day
    * lag delta. The window input is days x types (bounded regardless of raw
    * row count), so the per-type sort is safe at any scale; all window
    * arithmetic is exact-integer (the avg is an exact-int ratio, identical
    * across engines).
    */
  private val q41 = QueryDef.sql(
    "rolling 7-day window + day-over-day delta of daily event counts")(
    """WITH d AS (
      |  SELECT event_type, cast(date_trunc('day', ts) AS DATE) AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, day, n,
      |  cast(sum(n) OVER w7 AS BIGINT) AS roll7_sum,
      |  avg(n) OVER w7 AS roll7_avg,
      |  n - lag(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS dod_delta
      |FROM d
      |WINDOW w7 AS (PARTITION BY event_type ORDER BY day
      |              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
    import s.implicits._
    val daily = Tables(s, dir).events
      .groupBy($"event_type", to_date(date_trunc("day", $"ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
    val w7 = w.rowsBetween(-6, 0)
    // fault-gate probe ABOVE the frames (`window` scope): the retried task
    // re-fetches the window exchange and re-runs sort + frame evaluation
    graft.fault.FaultInjection.probe(
      daily.select($"event_type", $"day", $"n",
        sum($"n").over(w7).as("roll7_sum"),
        avg($"n").over(w7).as("roll7_avg"),
        ($"n" - lag($"n", 1).over(w)).as("dod_delta")), "window")
      .smallOrdered($"event_type", $"day")
  }

  /** Wide pivot: per-user activity profile, one (count, value-sum) column
    * pair per event type. The value list is explicit — at 100 TB the
    * implicit form's distinct-values pre-pass is a full extra scan plus a
    * driver round-trip; a declared taxonomy keeps pivot a single grouped
    * aggregate.
    */
  private val q42 = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val oracleCols = types.flatMap { t =>
      Seq(
        s"  cast(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS ${t}_n",
        s"  cast(sum(CASE WHEN event_type = '$t' THEN value END) AS REAL) AS ${t}_value")
    }.mkString(",\n")
    QueryDef.sql(
      "pivot events to a wide per-user activity profile")(
      s"""SELECT user_id,
         |$oracleCols
         |FROM events GROUP BY user_id
         |ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val p = Tables(s, dir).events
        .groupBy($"user_id")
        .pivot("event_type", types)
        .agg(
          count(lit(1)).as("n"),
          sum($"value").cast("float").as("value"))
      // pivot emits NULL for an absent (user, type) cell; the oracle's
      // CASE-sum count emits 0 — align the counts (the value sums are NULL
      // on both sides over an empty cell)
      val aligned = $"user_id" +: types.flatMap(t => Seq(
        coalesce(col(s"${t}_n"), lit(0L)).as(s"${t}_n"),
        col(s"${t}_value")))
      p.select(aligned: _*).cachedOrdered($"user_id")
    }
  }

  /** Funnel conversion by daily signup cohort: first signup → first
    * purchase within 7 days (operators.Funnel). Exact integer-microsecond
    * time math; cohort key = epoch day (integer division, no date casts).
    */
  private val q50 = QueryDef.sql(
    "funnel conversion by signup cohort day (purchase within 7 days)")(
    """WITH f AS (SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS s_us,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_us
      |  FROM events GROUP BY user_id),
      |c AS (SELECT s_us // 86400000000 AS cohort_day,
      |    CASE WHEN p_us IS NOT NULL AND p_us > s_us
      |              AND p_us - s_us <= 604800000000 THEN 1 ELSE 0 END AS conv
      |  FROM f WHERE s_us IS NOT NULL)
      |SELECT cohort_day, count(*) AS n_entered, sum(conv)::BIGINT AS n_converted,
      |  sum(conv)::DOUBLE / count(*) AS conversion_rate
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    graft.operators.Funnel.conversionByCohort(Tables(s, dir).events,
        "user_id", "ts", "event_type", "signup", "purchase",
        windowMicros = 604800000000L)
      .smallOrdered($"cohort_day")
  }

  /** Weekly retention cohorts: users by first-activity week, distinct
    * actives at week offsets 0..3 (operators.Funnel.weeklyRetention) — one
    * Expand pass for all offsets.
    */
  private val q51 = QueryDef.sql(
    "weekly retention cohorts (distinct actives at offsets w0..w3)")(
    """WITH u AS (SELECT user_id,
      |    min(epoch_us(ts)) // 604800000000 AS cohort_week
      |  FROM events GROUP BY 1),
      |a AS (SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS w
      |  FROM events),
      |j AS (SELECT a.user_id, u.cohort_week, a.w - u.cohort_week AS k
      |  FROM a JOIN u ON a.user_id = u.user_id)
      |SELECT cohort_week,
      |  count(DISTINCT CASE WHEN k = 0 THEN user_id END) AS w0,
      |  count(DISTINCT CASE WHEN k = 1 THEN user_id END) AS w1,
      |  count(DISTINCT CASE WHEN k = 2 THEN user_id END) AS w2,
      |  count(DISTINCT CASE WHEN k = 3 THEN user_id END) AS w3
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    graft.operators.Funnel.weeklyRetention(Tables(s, dir).events,
        "user_id", "ts", horizon = 3)
      .smallOrdered($"cohort_week")
  }

  /** Per-row percentile rank of value within event_type — the CDF feature
    * of scaled feature engineering. Ranked by ParallelRank over a composite
    * (value, event_id) range key: every stage parallel, deterministic tie
    * order, NO per-group single-task window sort (the plain
    * `Window.partitionBy(type).orderBy(value)` puts each type's entire
    * history in one task at any cluster size).
    */
  private val q54 = QueryDef.sql(
    "percentile rank of value within event_type (parallel rank, no group sort)")(
    """SELECT event_id, event_type, value,
      |  (row_number() OVER (PARTITION BY event_type ORDER BY value, event_id)
      |     - 1)::DOUBLE
      |    / (count(*) OVER (PARTITION BY event_type) - 1) AS pct_rank
      |FROM events ORDER BY event_type, event_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = Tables(s, dir).events
      .select($"event_id", $"event_type", $"value")
      .withColumn("__ok", struct($"value", $"event_id"))
    // group sizes ride the rank's own broadcast (totalCol) — no second
    // events scan + aggregate + join just for count(*) per type
    graft.operators.ParallelRank
      .rowNumber(ev, Seq("event_type"), "__ok", "__rn",
        totalCol = Some("__n"), smallGroupsHint = true)
      .select($"event_id", $"event_type", $"value",
        (($"__rn" - 1).cast("double") / ($"__n" - 1)).as("pct_rank"))
      .cachedOrdered($"event_type", $"event_id")
  }

  /** Daily-count anomaly z-scores per event type: mean/stddev of the per-day
    * event counts, each day scored. Accumulated moments go out as float32
    * (house float-parity rule — stddev partial order differs per engine).
    */
  private val q55 = QueryDef.sql(
    "daily event-count anomaly z-scores per event type")(
    """WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |st AS (SELECT event_type, sum(c)::DOUBLE / count(*) AS mu,
      |    stddev_samp(c) AS sd
      |  FROM d GROUP BY 1)
      |SELECT d.event_type, day, c AS n_events,
      |  cast((c - mu) / sd AS REAL) AS z
      |FROM d JOIN st ON d.event_type = st.event_type
      |ORDER BY d.event_type, day""".stripMargin) { (s, dir) =>
    import s.implicits._
    val d = Tables(s, dir).events
      .select($"event_type", Tables.epochUs($"ts").as("t_us"))
      .select($"event_type", expr("t_us div 86400000000").as("day"))
      .groupBy($"event_type", $"day").agg(count(lit(1)).as("c"))
    val st = d.groupBy($"event_type").agg(
      (sum($"c").cast("double") / count(lit(1))).as("mu"),
      stddev_samp($"c").as("sd"))
    d.join(st, "event_type")
      .select($"event_type", $"day", $"c".as("n_events"),
        (($"c" - $"mu") / $"sd").cast("float").as("z"))
      .smallOrdered($"event_type", $"day")
  }

  /** Single-pass sketch quantiles of events.value via the mergeable KLL
    * aggregate (org.apache.spark.sql.graft.KllSketchAgg): per-partition
    * sketches merge — no range shuffle, the one-pass 100 TB companion of
    * the exact DistributedQuantiles path. Gated in the EXACT regime
    * (capacity >= row count at every gated/benched SF, so nothing compacts
    * and ranks are exact; compaction error bounds live in KllSketchSpec).
    * Rank semantics: value at 1-based rank max(ceil(q*n), 1), replayed in
    * SQL as the first value whose row_number reaches the target.
    */
  private val q57 = QueryDef.sql(
    "single-pass KLL sketch quantiles of events.value (exact regime)")(
    """WITH s AS (SELECT value AS v, row_number() OVER (ORDER BY value) AS rn,
      |    count(*) OVER () AS n FROM events)
      |SELECT min(CASE WHEN rn >= greatest(ceil(0.25::DOUBLE * n), 1) THEN v END) AS p25,
      |       min(CASE WHEN rn >= greatest(ceil(0.5::DOUBLE * n), 1) THEN v END) AS p50,
      |       min(CASE WHEN rn >= greatest(ceil(0.75::DOUBLE * n), 1) THEN v END) AS p75
      |FROM s""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.graft.{Bridge, KllSketchAgg}
    val sk = Bridge.column(
      KllSketchAgg(Bridge.expression(col("value")), k = 131072,
        qs = Seq(0.25, 0.5, 0.75)).toAggregateExpression())
    Tables(s, dir).events.agg(sk.as("q"))
      .select($"q"(0).as("p25"), $"q"(1).as("p50"), $"q"(2).as("p75"))
  }

  /** Exact quantiles via KLL bracket refinement — the COMPACTION regime
    * gate for the KLL aggregate (q57 gates the exact regime, capacity >=
    * n): here k=256 against 1k-100k event rows, so the sketch compacts at
    * every gated SF. The sketch only brackets each target rank; one exact
    * pass counts rows below the bracket and selects the target inside it
    * (SketchExact.quantiles), so the output is exact and
    * partition-invariant — but a violated compaction error bound pushes
    * the true value outside the bracket and the query fails loudly rather
    * than drifting. Same rank semantics and oracle shape as q57.
    */
  private val q63 = QueryDef.sql(
    "exact event-value quantiles via compacting KLL bracket + exact refinement")(
    """WITH s AS (SELECT value AS v, row_number() OVER (ORDER BY value) AS rn,
      |    count(*) OVER () AS n FROM events)
      |SELECT min(CASE WHEN rn >= greatest(ceil(0.25::DOUBLE * n), 1) THEN v END) AS p25,
      |       min(CASE WHEN rn >= greatest(ceil(0.5::DOUBLE * n), 1) THEN v END) AS p50,
      |       min(CASE WHEN rn >= greatest(ceil(0.75::DOUBLE * n), 1) THEN v END) AS p75
      |FROM s""".stripMargin) { (s, dir) =>
    graft.operators.SketchExact.quantiles(Tables(s, dir).events, "value",
      Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75), k = 256)
  }

  /** Top-3 highest-value events per type via the bounded-heap TopKByAgg —
    * the scale replacement for the window-rank top-k (q06's shape): the
    * window form sorts EVERY row of every group; the heap aggregate keeps
    * exactly k pairs per group through map-side partials, so a billion-row
    * group shuffles k tuples. Join-back fetches the full rows for just
    * G x k winners.
    */
  private val q60 = QueryDef.sql(
    "top-3 events per type via bounded-heap aggregate (no group sort)")(
    """SELECT event_type, event_id, value, rn FROM (
      |  SELECT event_type, event_id, value,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY value DESC, event_id) AS rn
      |  FROM events
      |  WHERE value IS NOT NULL AND event_id IS NOT NULL) WHERE rn <= 3
      |ORDER BY event_type, rn""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.graft.{Bridge, TopKByAgg}
    val topk = Bridge.column(
      TopKByAgg(Bridge.expression(col("value")),
        Bridge.expression(col("event_id")), k = 3).toAggregateExpression())
    Tables(s, dir).events
      .groupBy($"event_type").agg(topk.as("top"))
      .select($"event_type", posexplode($"top").as(Seq("pos", "e")))
      .select($"event_type", $"e.id".as("event_id"), $"e.ord".as("value"),
        ($"pos" + 1).cast("long").as("rn"))
      .smallOrdered($"event_type", $"rn")
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q39_sessionization" -> q39,
    "q40_rollup_revenue" -> q40,
    "q41_rolling_windows" -> q41,
    "q42_pivot_wide" -> q42,
    "q50_funnel_conversion" -> q50,
    "q51_retention_cohorts" -> q51,
    "q54_percentile_rank" -> q54,
    "q55_daily_anomaly" -> q55,
    "q57_sketch_quantiles" -> q57,
    "q60_topk_heap" -> q60,
    "q63_sketch_quantiles_exact" -> q63
  )
}
