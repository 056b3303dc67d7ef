package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.drift.{ChiSquared, KsTest}
import graft.ml.Classification

/** Drift statistics and classification metrics (SURVEY.md §2.4 A4–A11)
  * exercised over the events table: the two-sample tests split events into a
  * "current" and a "reference" population, exactly the J2 shape of the
  * reference pipeline (current batch vs model reference data).
  *
  * Scale notes: both test statistics collapse the input with one grouped
  * aggregate (distinct values / categories) before any windowing, so the
  * global-order window cost is bounded by value cardinality, not row count;
  * classification metrics are single-pass conditional aggregates shuffling
  * four longs per partition.
  */
object MlDrift {

  /** Two-sample KS statistic: click events vs all others on `value`. */
  private val q24 = QueryDef.sql(
    "two-sample KS drift statistic on events.value (click vs rest)")(
    """WITH pv AS (SELECT value AS v,
      |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c_cur,
      |    sum(CASE WHEN event_type <> 'click' THEN 1 ELSE 0 END) AS c_ref
      |  FROM events WHERE value IS NOT NULL GROUP BY 1),
      |c AS (SELECT v,
      |    sum(c_cur) OVER (ORDER BY v) AS cum_cur,
      |    sum(c_ref) OVER (ORDER BY v) AS cum_ref,
      |    sum(c_cur) OVER () AS n_cur,
      |    sum(c_ref) OVER () AS n_ref
      |  FROM pv)
      |SELECT max(abs(cum_cur::DOUBLE / n_cur - cum_ref::DOUBLE / n_ref)) AS ks_stat,
      |  cast(max(n_cur) AS BIGINT) AS n_current,
      |  cast(max(n_ref) AS BIGINT) AS n_reference
      |FROM c""".stripMargin) { (s, dir) =>
    import s.implicits._
    KsTest.statistic(
      Tables(s, dir).events.filter($"value".isNotNull),
      "value", $"event_type" === "click")
  }

  /** Two-sample chi-squared homogeneity statistic on the event_type
    * distribution, split by even/odd user id.
    */
  private val q25 = QueryDef.sql(
    "chi-squared homogeneity statistic on event_type (even vs odd users)")(
    """WITH obs AS (SELECT event_type AS cat,
      |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS o_cur,
      |    sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS o_ref
      |  FROM events GROUP BY 1),
      |m AS (SELECT *, sum(o_cur) OVER () AS n_cur, sum(o_ref) OVER () AS n_ref FROM obs),
      |e AS (SELECT *, n_cur + n_ref AS total, o_cur + o_ref AS col_tot FROM m),
      |x AS (SELECT *,
      |    col_tot::DOUBLE * n_cur / total AS e_cur,
      |    col_tot::DOUBLE * n_ref / total AS e_ref FROM e)
      |SELECT cast(sum(pow(o_cur - e_cur, 2) / e_cur
      |             + pow(o_ref - e_ref, 2) / e_ref) AS REAL) AS chi2_stat,
      |  count(*) - 1 AS dof,
      |  cast(max(n_cur) AS BIGINT) AS n_current,
      |  cast(max(n_ref) AS BIGINT) AS n_reference
      |FROM x""".stripMargin) { (s, dir) =>
    import s.implicits._
    ChiSquared.statistic(Tables(s, dir).events, "event_type", $"user_id" % 2 === 0)
      .withColumn("chi2_stat", $"chi2_stat".cast("float"))
  }

  /** Headline classification metrics (accuracy/precision/recall/f1score) on
    * a deterministic synthetic labeling of events: label = value > 50,
    * prediction = user_id % 3 = 0. All values are ratios of exact integer
    * counts — bit-deterministic.
    */
  private val q26 = QueryDef.sql(
    "binary classification metrics from confusion counts")(
    """WITH s AS (SELECT
      |    sum(CASE WHEN value > 50 AND user_id % 3 = 0 THEN 1 ELSE 0 END) AS tp,
      |    sum(CASE WHEN value <= 50 AND user_id % 3 = 0 THEN 1 ELSE 0 END) AS fp,
      |    sum(CASE WHEN value > 50 AND user_id % 3 <> 0 THEN 1 ELSE 0 END) AS fn,
      |    sum(CASE WHEN value <= 50 AND user_id % 3 <> 0 THEN 1 ELSE 0 END) AS tn
      |  FROM events)
      |SELECT * FROM (
      |  SELECT 'accuracy' AS metric_name, (tp + tn)::DOUBLE / (tp + fp + fn + tn) AS value FROM s
      |  UNION ALL SELECT 'precision', tp::DOUBLE / (tp + fp) FROM s
      |  UNION ALL SELECT 'recall', tp::DOUBLE / (tp + fn) FROM s
      |  UNION ALL SELECT 'f1score', (2 * tp)::DOUBLE / (2 * tp + fp + fn) FROM s)
      |ORDER BY metric_name""".stripMargin) { (s, dir) =>
    import s.implicits._
    val scored = Tables(s, dir).events.select(
      ($"value" > 50).cast("int").as("label"),
      ($"user_id" % 3 === 0).cast("int").as("prediction"))
    Classification.metrics(scored, "label", "prediction")
      .smallOrdered($"metric_name")
  }

  /** Confusion matrix counts (A4): one row per (label, prediction) cell. */
  private val q27 = QueryDef.sql(
    "confusion matrix counts")(
    """SELECT (value > 50)::INT AS label, (user_id % 3 = 0)::INT AS prediction,
      |  count(*) AS n
      |FROM events WHERE value IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    import s.implicits._
    Classification.confusionCounts(
      Tables(s, dir).events.filter($"value".isNotNull)
        .select(($"value" > 50).cast("int").as("label"),
          ($"user_id" % 3 === 0).cast("int").as("prediction")),
      "label", "prediction")
      .smallOrdered($"label", $"prediction")
  }

  /** Decision-threshold sweep (M7): F1 at a fixed candidate grid, computed
    * in ONE pass via a broadcast cross join — no per-threshold rescan.
    */
  private val q28 = {
    val grid = Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
    val gridSql = grid.map(t => s"($t)").mkString(", ")
    QueryDef.sql("F1 threshold sweep over a candidate grid")(
      s"""WITH t(threshold) AS (VALUES $gridSql),
         |sc AS (SELECT (event_type = 'purchase')::INT AS label, value / 100.0 AS prob
         |  FROM events),
         |agg AS (SELECT threshold,
         |    sum(CASE WHEN label = 1 AND prob >= threshold THEN 1 ELSE 0 END) AS tp,
         |    sum(CASE WHEN label = 0 AND prob >= threshold THEN 1 ELSE 0 END) AS fp,
         |    sum(CASE WHEN label = 1 AND prob < threshold THEN 1 ELSE 0 END) AS fn
         |  FROM sc, t GROUP BY threshold)
         |SELECT threshold::DOUBLE AS threshold,
         |  cast(tp AS BIGINT) AS tp, cast(fp AS BIGINT) AS fp,
         |  cast(fn AS BIGINT) AS fn,
         |  (2 * tp)::DOUBLE / (2 * tp + fp + fn) AS f1
         |FROM agg ORDER BY threshold""".stripMargin) { (s, dir) =>
      import s.implicits._
      val scored = Tables(s, dir).events.select(
        ($"event_type" === "purchase").cast("int").as("label"),
        ($"value" / 100.0).as("prob"))
      Classification.thresholdSweep(scored, "label", "prob", grid)
        .select($"threshold", $"tp", $"fp", $"fn", $"f1")
        .smallOrdered($"threshold")
    }
  }

  /** As-of join (time-series attribution): each purchase matched to the
    * user's latest prior click. Union+running-window implementation — one
    * sort per user, no range-join blowup (operators.AsOfJoin); DuckDB's
    * native ASOF JOIN is the oracle. No raw ts in the output (nanos
    * truncation differs between engines). DuckDB's pick among DUPLICATE
    * (user_id, ts) right rows is unspecified, so the oracle pre-reduces
    * the right side to exactly the engine's pinned tie-break row (the
    * max payload tuple — AsOfJoin.latestPrior scaladoc): both sides are
    * then deterministic by construction instead of coupled to whatever a
    * given DuckDB version happens to emit.
    */
  private val q32 = QueryDef.sql(
    "as-of join: latest prior click per purchase")(
    """SELECT p.event_id AS purchase_id, p.user_id, p.value AS purchase_value,
      |  c.event_id AS click_id, c.value AS click_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF JOIN (
      |  SELECT user_id, ts, event_id, value FROM (
      |    SELECT user_id, ts, event_id, value, row_number() OVER (
      |      PARTITION BY user_id, ts ORDER BY event_id DESC, value DESC) AS rn
      |    FROM events WHERE event_type = 'click') WHERE rn = 1) c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY purchase_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = Tables(s, dir).events
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts",
        $"value".as("purchase_value"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"),
        $"value".as("click_value"))
    graft.operators.AsOfJoin.latestPrior(
      purchases, clicks, Seq("user_id"), "ts",
      rightPayload = Seq("click_id", "click_value"))
      .select($"purchase_id", $"user_id", $"purchase_value",
        $"click_id", $"click_value")
      .cachedOrdered($"purchase_id")
  }

  /** Semi-structured props column: JSON field extraction + grouped
    * aggregate — get_json_object stays inside codegen; the cast to int and
    * the integer sum are exact.
    */
  private val q33 = QueryDef.sql(
    "JSON field extraction from events.props + grouped aggregate")(
    """SELECT event_type, count(*) AS n,
      |  cast(sum(json_extract(props, '$.k')::INT) AS BIGINT) AS sum_k,
      |  cast(avg(json_extract(props, '$.k')::INT) AS REAL) AS avg_k
      |FROM events
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val k = get_json_object($"props", "$.k").cast("int")
    Tables(s, dir).eventsFanned
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(k).as("sum_k"),
        avg(k).cast("float").as("avg_k"))
      .smallOrdered($"event_type")
  }

  /** Range join: event pairs of the same user within 10 minutes, counted
    * per type pair. Banded equi-join (operators.RangeJoin), never a theta
    * join; DuckDB computes the same via a plain inequality join.
    */
  private val q34 = QueryDef.sql(
    "banded range join: same-user event pairs within 10 minutes")(
    """SELECT a.event_type AS type_a, b.event_type AS type_b,
      |  count(*) AS n_pairs
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND a.event_id < b.event_id
      |  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 600000000
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    import s.implicits._
    graft.operators.RangeJoin.pairsWithin(
      Tables(s, dir).events, Seq("user_id"), "ts", "event_id",
      toleranceMicros = 600000000L, payload = Seq("event_type"))
      .groupBy($"event_type_a".as("type_a"), $"event_type_b".as("type_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .smallOrdered($"type_a", $"type_b")
  }

  /** Typed JSON parsing (from_json with an explicit schema — the
    * schema-ful sibling of q33's path extraction) feeding exact per-group
    * quantiles through DistributedQuantiles: the two-job order-statistics
    * operator under the oracle gate on its own.
    */
  private val q36 = QueryDef.sql(
    "typed from_json field quantiles per event_type")(
    """SELECT event_type,
      |  cast(quantile_cont(json_extract(props, '$.k')::INT, 0.25) AS REAL) AS p25,
      |  cast(quantile_cont(json_extract(props, '$.k')::INT, 0.50) AS REAL) AS p50,
      |  cast(quantile_cont(json_extract(props, '$.k')::INT, 0.75) AS REAL) AS p75
      |FROM events
      |WHERE json_extract(props, '$.k') IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val typed = Tables(s, dir).eventsFanned.select(
      $"event_type",
      from_json($"props",
        org.apache.spark.sql.types.StructType.fromDDL("k INT"))
        .getField("k").as("k"))
      .filter($"k".isNotNull)
    graft.operators.DistributedQuantiles
      .exact(typed, Seq("event_type"), "k",
        Seq("p25" -> 0.25, "p50" -> 0.50, "p75" -> 0.75),
        // event taxonomy is enum-grain (bounded set of type names) and k is
        // a bounded integer score: the whole (type, k) histogram is tiny at
        // any row count — driver-histogram fast path
        groupCountHint = Some(100L),
        distinctValueHint = Some(10000L))
      .select($"event_type", $"p25".cast("float").as("p25"),
        $"p50".cast("float").as("p50"), $"p75".cast("float").as("p75"))
      .smallOrdered($"event_type")
  }

  /** Deterministic stratified sampling (operators.Sampling.stratifiedExact):
    * exactly ceil(20% x |stratum|) events per type, membership decided by
    * content-hash order — reproducible across engines, partitionings and
    * reruns (the curation property). The oracle replays the same md5-order
    * window rank.
    */
  private val q38 = QueryDef.sql(
    "deterministic stratified 20% sample of documents by lang (md5-order quota)")(
    """WITH ranked AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |                       ORDER BY md5(cast(doc_id AS VARCHAR))) AS rn,
      |    count(*) OVER (PARTITION BY lang) AS cnt
      |  FROM documents)
      |SELECT doc_id, lang FROM ranked
      |WHERE rn <= ceil(0.2 * cnt)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    graft.operators.Sampling.stratifiedExact(
      Tables(s, dir).documents.select($"doc_id", $"lang"),
      Seq("lang"), "doc_id", 0.2)
      .cachedOrdered($"doc_id")
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q24_ks_drift" -> q24,
    "q25_chi2_drift" -> q25,
    "q26_classification_metrics" -> q26,
    "q27_confusion_matrix" -> q27,
    "q28_threshold_sweep" -> q28,
    "q32_asof_join" -> q32,
    "q33_json_extract" -> q33,
    "q34_range_join" -> q34,
    "q36_json_quantiles" -> q36,
    "q38_stratified_sample" -> q38
  )
}
