package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.TemporalOps

/** Temporal state/interval surface (round 7): SCD2 dimension history,
  * merged-interval coverage, and consecutive-day streaks — the
  * gaps-and-islands family a warehouse needs for entity timelines. Every
  * query is a single exchange by the entity key (`TemporalOps` scaladoc)
  * and all time arithmetic is exact integer microseconds, so the oracle
  * replays are hash-identical.
  */
object Temporal {

  /** SCD2 history of each user's event_type "state": consecutive runs
    * collapse into versioned validity intervals, the open version carries
    * a NULL valid_to. The production shape for building type-2 dimensions
    * from CDC/event logs.
    */
  /** Shared with the streaming gate (StreamGate q130): ONE oracle text
    * gating both the batch window plan and the incremental state fold.
    */
  val Scd2OracleSql: String =
    """WITH o AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id
      |                          ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |m AS (
      |  SELECT user_id, event_type, ts_us,
      |    CAST(sum(CASE WHEN prev IS NULL OR prev <> event_type
      |             THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
      |  FROM o),
      |g AS (
      |  SELECT user_id, version, min(event_type) AS state,
      |         min(ts_us) AS valid_from
      |  FROM m GROUP BY 1, 2)
      |SELECT user_id, state, valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
      |    AS valid_to,
      |  version
      |FROM g ORDER BY user_id, version""".stripMargin

  private val q95 = QueryDef.sql(
    "SCD2 state history: versioned validity intervals per user")(
    Scd2OracleSql) { (s, dir) =>
    import s.implicits._
    TemporalOps.scd2History(Tables(s, dir).events,
        keyCol = "user_id", stateCol = "event_type",
        tsCol = "ts", tieCol = "event_id")
      .cachedOrdered($"user_id", $"version")
  }

  /** Merged 5-minute activity windows per user: total covered time, island
    * count and longest contiguous stretch — the "active time" metric that
    * naive per-event summation double-counts.
    */
  /** Shared with the streaming gate (StreamGate q133) — same one-oracle,
    * two-execution-models contract as [[Scd2OracleSql]].
    */
  val IslandsOracleSql: String =
    """WITH iv AS (
      |  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e
      |  FROM events),
      |o AS (
      |  SELECT user_id, s, e,
      |    max(e) OVER (PARTITION BY user_id ORDER BY s, e
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS prev_max
      |  FROM iv),
      |m AS (
      |  SELECT user_id, s, e,
      |    sum(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY s, e ROWS UNBOUNDED PRECEDING)
      |      AS island
      |  FROM o)
      |SELECT user_id, count(*) AS n_islands, sum(len)::BIGINT AS covered_us,
      |       max(len) AS longest_us
      |FROM (SELECT user_id, island, max(e) - min(s) AS len
      |      FROM m GROUP BY 1, 2)
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  private val q96 = QueryDef.sql(
    "gaps-and-islands: merged 5-minute activity coverage per user")(
    IslandsOracleSql) { (s, dir) =>
    import s.implicits._
    TemporalOps.intervalCoverage(Tables(s, dir).events,
        keyCol = "user_id", tsCol = "ts", durUs = 300000000L)
      .smallOrdered($"user_id")
  }

  /** Longest consecutive-day activity streak per user (earliest streak
    * wins ties) — the date-minus-row-number islands trick.
    */
  private val q97 = QueryDef.sql(
    "longest consecutive-day activity streak per user")(
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |m AS (
      |  SELECT user_id, d,
      |    d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
      |             AS INTEGER) AS grp
      |  FROM days),
      |s AS (
      |  SELECT user_id, count(*) AS len, min(d) AS start_d
      |  FROM m GROUP BY user_id, grp)
      |SELECT user_id, max(len) AS streak,
      |  min(CASE WHEN len = ml THEN start_d END) AS streak_start
      |FROM (SELECT *, max(len) OVER (PARTITION BY user_id) AS ml FROM s)
      |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    TemporalOps.streaks(Tables(s, dir).events, keyCol = "user_id", tsCol = "ts")
      .smallOrdered($"user_id")
  }

  /** Sliding-window distinct: distinct active users over the trailing
    * 7 days, per day. NOT a sum of daily distincts (users active on
    * several days must count once): day-grain dedup first, then each
    * (user, day) row contributes to the ≤ 7 window-end days it falls in —
    * a bounded explode (factor 7) followed by one distinct-count exchange.
    * At scale this beats the join form (days × activity range join) by
    * shuffling each activity row a constant number of times.
    */
  private val q103 = QueryDef.sql(
    "sliding 7-day distinct active users per day")(
    """WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
      |days AS (SELECT DISTINCT d FROM ud)
      |SELECT days.d AS day, count(DISTINCT ud.user_id) AS users_7d
      |FROM days JOIN ud ON ud.d BETWEEN days.d - 6 AND days.d
      |GROUP BY days.d ORDER BY days.d""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ud = Tables(s, dir).events
      .select(to_date($"ts").as("d"), $"user_id").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // observed day universe: contributions beyond the last day are clipped
    // so absent days don't materialize
    val bounds = ud.agg(max($"d").as("dmax"))
    val contrib = ud.crossJoin(broadcast(bounds))
      .select($"user_id",
        explode(sequence($"d", least(date_add($"d", 6), $"dmax"))).as("day"))
    val days = ud.select($"d".as("day")).distinct()
    contrib.join(days, "day")
      .groupBy($"day")
      .agg(countDistinct($"user_id").as("users_7d"))
      .smallOrdered($"day")
  }

  /** Event-type transition matrix: counts of consecutive (prev -> next)
    * event-type pairs per user timeline, with the per-prev row total so a
    * consumer derives transition probabilities as exact fractions
    * (cnt / row_total) — the first-order Markov model behind funnel
    * diagnostics and synthetic-sequence generation. One exchange by
    * user_id for the lag window (the canonical sessionization shape);
    * the transition frame after it is event-type² rows.
    */
  private val q111 = QueryDef.sql(
    "event-type transition matrix with per-prev row totals")(
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |                          ORDER BY ts, event_id) AS prev
      |  FROM events)
      |SELECT prev, event_type AS next, count(*)::BIGINT AS cnt,
      |  sum(count(*)) OVER (PARTITION BY prev)::BIGINT AS row_total
      |FROM seq WHERE prev IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables(s, dir).events
      .select($"user_id", $"event_type", $"ts", $"event_id")
      .withColumn("prev", lag($"event_type", 1).over(w))
      .filter($"prev".isNotNull)
      .groupBy($"prev", $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("row_total", sum($"cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"prev")))
      .select($"prev", $"event_type".as("next"), $"cnt", $"row_total")
      .smallOrdered($"prev", $"next")
  }

  /** Last-touch attribution: each purchase credits the user's most recent
    * PRECEDING non-purchase event within a 3-day lookback; purchases with
    * no qualifying touch credit "direct". One lag-style window per user —
    * the two IGNORE-NULLS last_value columns are CASE'd on the same
    * predicate, so they always come from the same touch row. Exact
    * integer-microsecond lookback math; output is event-type-bounded.
    */
  private val q114 = QueryDef.sql(
    "last-touch attribution with 3-day lookback (direct fallback)")(
    """WITH seq AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
      |               IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS touch_type,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN epoch_us(ts) END
      |               IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS touch_ts
      |  FROM events)
      |SELECT CASE WHEN touch_ts IS NOT NULL
      |         AND ts_us - touch_ts <= 259200000000 THEN touch_type
      |       ELSE 'direct' END AS touch,
      |  count(*)::BIGINT AS purchases,
      |  count(DISTINCT user_id)::BIGINT AS users
      |FROM seq WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = Tables(s, dir).events
      .select($"user_id", $"event_type", $"event_id",
        Tables.epochUs($"ts").as("ts_us"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    ev
      .withColumn("touch_type",
        last(when($"event_type" =!= "purchase", $"event_type"), true).over(w))
      .withColumn("touch_ts",
        last(when($"event_type" =!= "purchase", $"ts_us"), true).over(w))
      .filter($"event_type" === "purchase")
      .select(
        when($"touch_ts".isNotNull &&
          $"ts_us" - $"touch_ts" <= 259200000000L, $"touch_type")
          .otherwise("direct").as("touch"),
        $"user_id")
      .groupBy($"touch")
      .agg(count(lit(1)).as("purchases"),
        countDistinct($"user_id").as("users"))
      .smallOrdered($"touch")
  }

  /** Market-basket co-occurrence supports: baskets are (user, day), items
    * are the distinct event types in the basket, output is every item
    * PAIR's support plus the basket universe — the counting core of
    * association-rule mining (confidence/lift are exact ratios of these
    * integers). Pair generation is an in-row nested transform over each
    * basket's sorted item set (bounded by the event-type alphabet, so the
    * quadratic step is capped per basket by construction); one exchange
    * builds baskets, one counts pairs.
    */
  private val q115 = QueryDef.sql(
    "item-pair co-occurrence supports over (user, day) baskets")(
    """WITH b AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
      |           FROM events),
      |nb AS (SELECT count(DISTINCT (user_id, day)) AS baskets FROM b),
      |p AS (SELECT a.user_id, a.day, a.event_type AS ia, c.event_type AS ib
      |      FROM b a JOIN b c ON a.user_id = c.user_id AND a.day = c.day
      |       AND a.event_type < c.event_type)
      |SELECT ia, ib, count(*)::BIGINT AS support,
      |  (SELECT baskets FROM nb) AS baskets
      |FROM p GROUP BY 1, 2 ORDER BY support DESC, ia, ib""".stripMargin) {
    (s, dir) =>
    import s.implicits._
    val items = Tables(s, dir).events
      .select($"user_id", to_date($"ts").as("day"), $"event_type").distinct()
      .groupBy($"user_id", $"day")
      .agg(sort_array(collect_set($"event_type")).as("its"))
    val nb = items.agg(count(lit(1)).as("baskets"))
    items
      .select(explode(expr(
        """flatten(transform(its, (x, i) ->
          |  transform(slice(its, i + 2, size(its)), y ->
          |    struct(x AS ia, y AS ib))))""".stripMargin)).as("p"))
      .select($"p.ia".as("ia"), $"p.ib".as("ib"))
      .groupBy($"ia", $"ib").agg(count(lit(1)).as("support"))
      .crossJoin(broadcast(nb))
      .smallOrdered($"support".desc, $"ia", $"ib")
  }

  /** Sessionized path mining: the top-10 event-type TRIGRAMS inside
    * 6-hour-gap sessions — the "what do users actually do in a sitting"
    * sequence report. Session ids come from the standard gap-flag cumsum;
    * the trigram columns are lags over the SAME per-user window guarded by
    * lag(sess) equality (session ids are monotone per user, so one
    * exchange serves sessionization AND the path lags — no second
    * partition-by-(user, session) exchange, which the SQL formulation
    * would pay).
    */
  private val q116 = QueryDef.sql(
    "top session path trigrams (6h-gap sessions)")(
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
      |           FROM events),
      |s AS (SELECT *, sum(CASE WHEN prev IS NULL
      |          OR ts_us - prev > 21600000000 THEN 1 ELSE 0 END)
      |        OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |              ROWS UNBOUNDED PRECEDING) AS sess
      |      FROM (SELECT *, lag(ts_us) OVER (PARTITION BY user_id
      |              ORDER BY ts_us, event_id) AS prev FROM e)),
      |t AS (SELECT user_id, sess, event_type,
      |        lag(event_type, 2) OVER w AS a, lag(event_type, 1) OVER w AS b
      |      FROM s WINDOW w AS (PARTITION BY user_id, sess
      |                          ORDER BY ts_us, event_id))
      |SELECT a, b, event_type AS c, count(*)::BIGINT AS cnt
      |FROM t WHERE a IS NOT NULL
      |GROUP BY 1, 2, 3 ORDER BY cnt DESC, a, b, c LIMIT 10""".stripMargin) {
    (s, dir) =>
    import s.implicits._
    val wU = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    Tables(s, dir).events
      .select($"user_id", $"event_type", $"event_id",
        Tables.epochUs($"ts").as("ts_us"))
      .withColumn("prev", lag($"ts_us", 1).over(wU))
      .withColumn("sess", sum(
        when($"prev".isNull || $"ts_us" - $"prev" > 21600000000L, 1L)
          .otherwise(0L))
        .over(wU.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("a",
        when(lag($"sess", 2).over(wU) === $"sess",
          lag($"event_type", 2).over(wU)))
      .withColumn("b", lag($"event_type", 1).over(wU))
      .filter($"a".isNotNull)
      .select($"a", $"b", $"event_type".as("c"))
      .groupBy($"a", $"b", $"c")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"a", $"b", $"c").limit(10)
  }

  /** Native session-window aggregation (round 10): Spark's built-in
    * `session_window` operator — a dedicated physical operator pair
    * (UpdatingSessions + MergingSessions) distinct from the lag/cumsum
    * windows the rest of the temporal family uses — gated against the
    * standard gaps-and-islands SQL. Semantics pinned by the oracle: each
    * event opens [ts, ts+gap), overlapping windows merge, so a session
    * breaks exactly when the inter-event gap reaches 6 h and the merged
    * window's end is `last_ts + gap`. One exchange by (user, session);
    * the operator sorts within partitions instead of keeping per-key
    * hash state, which is what lets it spill at 100 TB.
    */
  private val q148 = QueryDef.sql(
    "native session_window aggregation vs the gaps-and-islands oracle (6h gap)")(
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type, event_id
      |           FROM events),
      |s AS (SELECT *, sum(CASE WHEN prev IS NULL
      |          OR ts_us - prev >= 21600000000 THEN 1 ELSE 0 END)
      |        OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |              ROWS UNBOUNDED PRECEDING) AS sess
      |      FROM (SELECT *, lag(ts_us) OVER (PARTITION BY user_id
      |              ORDER BY ts_us, event_id) AS prev FROM e))
      |SELECT user_id, min(ts_us) AS session_start_us,
      |  max(ts_us) + 21600000000 AS session_end_us,
      |  count(*)::BIGINT AS n_events,
      |  count(DISTINCT event_type)::BIGINT AS n_types
      |FROM s GROUP BY user_id, sess
      |ORDER BY user_id, session_start_us""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables(s, dir).events
      .groupBy($"user_id", session_window($"ts", "6 hours").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"event_type").as("n_types"))
      .select($"user_id",
        graft.core.Tables.epochUs($"sw.start").as("session_start_us"),
        graft.core.Tables.epochUs($"sw.end").as("session_end_us"),
        $"n_events", $"n_types")
      .cachedOrdered($"user_id", $"session_start_us")
  }

  /** Daily resample + forward fill (round 10): the reshape every
    * time-series feature pipeline needs — per-user daily observations land
    * on a dense day grid (each user's own [min, max] span, built with
    * `sequence` + explode, so the grid is data-driven, never a cross
    * join against a global calendar) and gaps carry the last observed
    * value forward (`last` IGNORE NULLS over the running window). The
    * fill never crosses users, and the first grid day is observed by
    * construction, so the filled series has no nulls — `observed < days`
    * in the output proves real gaps were filled. One exchange on user_id
    * serves grid build, join, and fill window alike.
    */
  private val q158 = QueryDef.sql(
    "daily resample with forward fill: dense per-user day grid, gaps carry last value")(
    """WITH obs AS (SELECT user_id, CAST(ts AS DATE) AS day,
      |    sum(value) AS v
      |  FROM events GROUP BY 1, 2),
      |grid AS (SELECT user_id,
      |    unnest(generate_series(min(day), max(day),
      |      INTERVAL 1 DAY))::DATE AS day
      |  FROM obs GROUP BY user_id),
      |f AS (SELECT g.user_id, g.day, o.v,
      |    last_value(o.v IGNORE NULLS) OVER (PARTITION BY g.user_id
      |      ORDER BY g.day ROWS UNBOUNDED PRECEDING) AS fv
      |  FROM grid g LEFT JOIN obs o
      |    ON o.user_id = g.user_id AND o.day = g.day)
      |SELECT user_id, count(*)::BIGINT AS days, count(v)::BIGINT AS observed,
      |  CAST(sum(fv) AS REAL) AS filled_sum
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val obs = Tables(s, dir).events
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(sum($"value").as("v"))
    val grid = obs.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .select($"user_id", explode(sequence($"d0", $"d1")).as("day"))
    val w = Window.partitionBy($"user_id").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("user_id", "day"), "left")
      .withColumn("fv", last($"v", ignoreNulls = true).over(w))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("days"), count($"v").as("observed"),
        sum($"fv").cast("float").as("filled_sum"))
      .smallOrdered($"user_id")
  }

  /** Rolling median (round 10): exact order-statistic windowing — the
    * robust smoother feature pipelines prefer over rolling mean when
    * `value` spikes. Restricted to full 5-row frames so the median is
    * always the 3rd order statistic — an INPUT value, never an
    * interpolation, hence engine-exact with no float edge. The frame's
    * collect_list is bounded state (5 doubles); one user_id exchange
    * serves both windows.
    */
  private val q164 = QueryDef.sql(
    "rolling median of the last 5 event values per user (full frames only)")(
    """WITH e AS (SELECT user_id, event_id, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      |  FROM events WHERE value IS NOT NULL)
      |SELECT user_id, event_id,
      |  median(value) OVER (PARTITION BY user_id ORDER BY event_id
      |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med5
      |FROM e QUALIFY rn >= 5
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    val w5 = w.rowsBetween(-4, 0)
    // fault-gate probe ABOVE the frames (`window` scope): the retried task
    // re-fetches the window exchange and re-runs sort + frame evaluation
    graft.fault.FaultInjection.probe(
      Tables(s, dir).events.filter($"value".isNotNull)
        .select($"user_id", $"event_id", $"value")
        .withColumn("rn", row_number().over(w))
        .withColumn("med5",
          element_at(sort_array(collect_list($"value").over(w5)), 3)),
      "window")
      .filter($"rn" >= 5)
      .select($"user_id", $"event_id", $"med5")
      .cachedOrdered($"event_id")
  }

  /** Per-type daily EWMA (round 10): the monitoring smoother, run as the
    * literal recurrence through operators.Ewma's streaming per-key fold
    * (the q139 external-sort shape — O(1) state, nothing resident), so
    * the oracle's recursive CTE matches bit-exactly: each step is the
    * same two multiplies and an add, in the same order. α = 0.25 keeps
    * both coefficients binary-exact.
    */
  private val q166 = QueryDef.sql(
    "daily event-count EWMA per type (alpha=0.25, recurrence-exact)")(
    """WITH RECURSIVE idx AS (
      |  SELECT event_type, day, n,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
      |  FROM (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      |        FROM events GROUP BY 1, 2)),
      |e AS (
      |  SELECT event_type, day, n, i, n::DOUBLE AS ewma FROM idx WHERE i = 1
      |  UNION ALL
      |  SELECT idx.event_type, idx.day, idx.n, idx.i,
      |    0.25 * idx.n + 0.75 * e.ewma
      |  FROM e JOIN idx ON idx.event_type = e.event_type AND idx.i = e.i + 1)
      |SELECT event_type, day, cast(n AS BIGINT) AS n, ewma
      |FROM e ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    import s.implicits._
    val daily = Tables(s, dir).events
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"))
      .select($"event_type", unix_date($"day").cast("long").as("d"), $"n")
    graft.operators.Ewma.perKey(daily, "event_type", "d", "n", alpha = 0.25)
      .select($"event_type",
        date_from_unix_date($"d".cast("int")).as("day"),
        $"n".cast("long").as("n"), $"ewma")
      .smallOrdered($"event_type", $"day")
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q95_scd2_history" -> q95,
    "q96_interval_coverage" -> q96,
    "q97_daily_streaks" -> q97,
    "q103_sliding_distinct" -> q103,
    "q111_event_transitions" -> q111,
    "q114_last_touch_attribution" -> q114,
    "q115_itemset_support" -> q115,
    "q116_session_paths" -> q116,
    "q148_native_session_window" -> q148,
    "q158_resample_ffill" -> q158,
    "q164_rolling_median" -> q164,
    "q166_daily_ewma" -> q166
  )
}
