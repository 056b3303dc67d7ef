package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The model-evaluation dashboard surface, oracle-gated (SURVEY.md §2.4
  * A9–A10 / §2.8 M10): PSI drift, exact ROC AUC, lift/gains deciles and
  * calibration bins — the four tables a churn-model monitoring page is
  * made of (the reference consumes them via `mlflow.models.evaluate` +
  * Evidently, churn_model_training.py:144-168,
  * churn_prediction_pipeline.py:322,417-423). The Evaluation/Classification
  * units already pin these against the reference's published numbers; these
  * gates additionally prove each one bit-exact against an independent SQL
  * replay, on the deterministic synthetic labeling the other ML gates use
  * (label = purchase event, score = value).
  *
  * Scale notes: every query collapses the input with ONE grouped aggregate
  * to a bounded frame (10 bins / deciles) or a distinct-score frame handled
  * by the ParallelRank prefix-sum skeleton — no global-order window ever
  * sees per-row data.
  */
object ModelEval {

  /** Population Stability Index: purchase events' value distribution vs all
    * other events, 10 fixed-width bins — the drift score practitioners
    * track per input column (PSI > 0.25 = retrain). Per-bin contributions
    * plus the running PSI, float32 at the edge (ln is libm-dependent).
    */
  private val q159 = QueryDef.sql(
    "PSI drift: purchase vs rest on events.value, 10 bins, running total")(
    """WITH v AS (SELECT value AS v, (event_type = 'purchase') AS cur
      |  FROM events WHERE value IS NOT NULL),
      |b AS (SELECT min(v) AS lo, max(v) AS hi FROM v),
      |binned AS (SELECT
      |    least(floor((v - lo) / ((hi - lo) / 10)), 9)::BIGINT AS bin,
      |    sum(CASE WHEN cur THEN 1 ELSE 0 END) AS n_cur,
      |    sum(CASE WHEN cur THEN 0 ELSE 1 END) AS n_ref
      |  FROM v, b GROUP BY 1),
      |t AS (SELECT *, sum(n_cur) OVER () AS t_cur,
      |    sum(n_ref) OVER () AS t_ref FROM binned),
      |c AS (SELECT bin, n_cur, n_ref,
      |    (greatest(n_cur::DOUBLE / t_cur, 1e-6)
      |      - greatest(n_ref::DOUBLE / t_ref, 1e-6))
      |    * ln(greatest(n_cur::DOUBLE / t_cur, 1e-6)
      |         / greatest(n_ref::DOUBLE / t_ref, 1e-6)) AS cd
      |  FROM t)
      |SELECT bin, cast(n_cur AS BIGINT) AS n_cur,
      |  cast(n_ref AS BIGINT) AS n_ref,
      |  cast(cd AS REAL) AS contribution,
      |  cast(sum(cd) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS REAL)
      |    AS psi_cum
      |FROM c ORDER BY bin""".stripMargin) { (s, dir) =>
    import s.implicits._
    graft.drift.Psi.binned(
      Tables(s, dir).events.filter($"value".isNotNull),
      "value", $"event_type" === "purchase", bins = 10)
      .smallOrdered($"bin")
  }

  /** Exact ROC AUC (Mann–Whitney with tie midranks) of value as a purchase
    * score: integer-exact numerator (decimal38 / HUGEINT both sides), one
    * double division at the edge — bit-reproducible, unlike MLlib's
    * 1000-bin curve approximation (which the Evaluation unit keeps for the
    * reference-parity path).
    */
  private val q160 = QueryDef.sql(
    "exact ROC AUC of events.value as a purchase score (rank statistic)")(
    """WITH sc AS (SELECT value AS s, (event_type = 'purchase')::INT AS y
      |  FROM events WHERE value IS NOT NULL),
      |per AS (SELECT s, sum(y) AS pos, sum(1 - y) AS neg FROM sc GROUP BY 1),
      |c AS (SELECT pos, neg, sum(neg) OVER (ORDER BY s) AS cumneg FROM per)
      |SELECT sum(pos * (2 * cumneg - neg))::DOUBLE
      |    / (sum(pos)::DOUBLE * sum(neg) * 2.0) AS roc_auc,
      |  cast(sum(pos) AS BIGINT) AS n_pos,
      |  cast(sum(neg) AS BIGINT) AS n_neg
      |FROM c""".stripMargin) { (s, dir) =>
    import s.implicits._
    graft.ml.RankMetrics.rocAuc(
      Tables(s, dir).events.filter($"value".isNotNull),
      "value", $"event_type" === "purchase")
  }

  /** Lift & gains deciles: score-band response rates and the cumulative
    * capture curve, best band first — "target the top 3 deciles, capture
    * X% of churners". Fixed-width bands over the observed score range; all
    * outputs are ratios of exact integer counts with identical association
    * both sides, so the doubles match bit-exactly.
    */
  private val q161 = QueryDef.sql(
    "lift and gains by score decile (purchase response, best band first)")(
    """WITH v AS (SELECT value AS v, (event_type = 'purchase')::INT AS y
      |  FROM events WHERE value IS NOT NULL),
      |b AS (SELECT min(v) AS lo, max(v) AS hi FROM v),
      |d AS (SELECT
      |    least(floor((v - lo) / ((hi - lo) / 10)), 9)::BIGINT AS decile,
      |    count(*) AS n, sum(y) AS n_pos
      |  FROM v, b GROUP BY 1),
      |t AS (SELECT *, sum(n) OVER () AS t_n, sum(n_pos) OVER () AS t_pos,
      |    sum(n) OVER (ORDER BY decile DESC) AS cum_n,
      |    sum(n_pos) OVER (ORDER BY decile DESC) AS cum_pos
      |  FROM d)
      |SELECT decile, cast(n AS BIGINT) AS n, cast(n_pos AS BIGINT) AS n_pos,
      |  (n_pos::DOUBLE / n) / (t_pos::DOUBLE / t_n) AS lift,
      |  cum_pos::DOUBLE / t_pos AS gain,
      |  (cum_pos::DOUBLE / cum_n) / (t_pos::DOUBLE / t_n) AS cum_lift
      |FROM t ORDER BY decile DESC""".stripMargin) { (s, dir) =>
    import s.implicits._
    val v = Tables(s, dir).events.filter($"value".isNotNull)
      .select($"value".as("v"),
        ($"event_type" === "purchase").cast("int").as("y"))
    val Seq(lo, hi) = v.agg(min($"v"), max($"v")).first()
      .toSeq.map(_.asInstanceOf[Double])
    val width = (hi - lo) / 10
    val d = v.groupBy(
        least(floor(($"v" - lit(lo)) / lit(width)), lit(9L)).cast("long")
          .as("decile"))
      .agg(count(lit(1)).as("n"), sum($"y").as("n_pos"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wCum = Window.orderBy($"decile".desc)
    d.withColumn("t_n", sum($"n").over(wAll))
      .withColumn("t_pos", sum($"n_pos").over(wAll))
      .withColumn("cum_n", sum($"n").over(wCum))
      .withColumn("cum_pos", sum($"n_pos").over(wCum))
      .select($"decile", $"n", $"n_pos",
        (($"n_pos".cast("double") / $"n")
          / ($"t_pos".cast("double") / $"t_n")).as("lift"),
        ($"cum_pos".cast("double") / $"t_pos").as("gain"),
        (($"cum_pos".cast("double") / $"cum_n")
          / ($"t_pos".cast("double") / $"t_n")).as("cum_lift"))
      .smallOrdered($"decile".desc)
  }

  /** Calibration bins: predicted probability (min-max normalized score)
    * vs observed rate per bin, with the per-bin Brier score — the
    * reliability-diagram table (Evaluation.calibration's oracle-gated
    * sibling). avg/Brier are float32 (accumulated doubles); the observed
    * rate is an exact integer ratio and stays double.
    */
  private val q162 = QueryDef.sql(
    "calibration bins: normalized-score prediction vs observed purchase rate")(
    """WITH v AS (SELECT value AS v, (event_type = 'purchase')::INT AS y
      |  FROM events WHERE value IS NOT NULL),
      |b AS (SELECT min(v) AS lo, max(v) AS hi FROM v),
      |p AS (SELECT (v - lo) / (hi - lo) AS prob, y,
      |    least(floor((v - lo) / ((hi - lo) / 10)), 9)::BIGINT AS bin
      |  FROM v, b)
      |SELECT bin, count(*) AS n,
      |  cast(avg(prob) AS REAL) AS avg_predicted,
      |  sum(y)::DOUBLE / count(*) AS observed_rate,
      |  cast(avg(pow(prob - y, 2)) AS REAL) AS brier
      |FROM p GROUP BY 1 ORDER BY bin""".stripMargin) { (s, dir) =>
    import s.implicits._
    val v = Tables(s, dir).events.filter($"value".isNotNull)
      .select($"value".as("v"),
        ($"event_type" === "purchase").cast("int").as("y"))
    val Seq(lo, hi) = v.agg(min($"v"), max($"v")).first()
      .toSeq.map(_.asInstanceOf[Double])
    val width = (hi - lo) / 10
    v.select(
        (($"v" - lit(lo)) / lit(hi - lo)).as("prob"), $"y",
        least(floor(($"v" - lit(lo)) / lit(width)), lit(9L)).cast("long")
          .as("bin"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"),
        avg($"prob").cast("float").as("avg_predicted"),
        (sum($"y").cast("double") / count(lit(1))).as("observed_rate"),
        avg(pow($"prob" - $"y", 2)).cast("float").as("brier"))
      .smallOrdered($"bin")
  }

  /** Weight-of-Evidence encoding + Information Value (Siddiqi 2006): the
    * classic churn/credit-scoring feature transform — per-bin WOE is the
    * value a pipeline substitutes for the raw bin, running IV scores the
    * feature (IV > 0.3 strong). Same binning/clamp/float32 discipline as
    * q159; WOE is the PSI log term with (current, reference) =
    * (positives, negatives).
    */
  private val q165 = QueryDef.sql(
    "WOE encoding table + running information value on events.value vs purchase")(
    """WITH v AS (SELECT value AS v, (event_type = 'purchase') AS pos
      |  FROM events WHERE value IS NOT NULL),
      |b AS (SELECT min(v) AS lo, max(v) AS hi FROM v),
      |binned AS (SELECT
      |    least(floor((v - lo) / ((hi - lo) / 10)), 9)::BIGINT AS bin,
      |    sum(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
      |    sum(CASE WHEN pos THEN 0 ELSE 1 END) AS n_neg
      |  FROM v, b GROUP BY 1),
      |t AS (SELECT *, sum(n_pos) OVER () AS t_pos,
      |    sum(n_neg) OVER () AS t_neg FROM binned),
      |c AS (SELECT bin, n_pos, n_neg,
      |    ln(greatest(n_pos::DOUBLE / t_pos, 1e-6)
      |       / greatest(n_neg::DOUBLE / t_neg, 1e-6)) AS w,
      |    (greatest(n_pos::DOUBLE / t_pos, 1e-6)
      |      - greatest(n_neg::DOUBLE / t_neg, 1e-6))
      |    * ln(greatest(n_pos::DOUBLE / t_pos, 1e-6)
      |         / greatest(n_neg::DOUBLE / t_neg, 1e-6)) AS ivc
      |  FROM t)
      |SELECT bin, cast(n_pos AS BIGINT) AS n_pos,
      |  cast(n_neg AS BIGINT) AS n_neg,
      |  cast(w AS REAL) AS woe,
      |  cast(sum(ivc) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS REAL)
      |    AS iv_cum
      |FROM c ORDER BY bin""".stripMargin) { (s, dir) =>
    import s.implicits._
    graft.drift.Psi.woeTable(
      Tables(s, dir).events.filter($"value".isNotNull),
      "value", $"event_type" === "purchase", bins = 10)
      .smallOrdered($"bin")
  }

  /** Log-loss of the normalized score (A8, previously unit-only): the
    * proper scoring rule `mlflow.models.evaluate` reports alongside AUC.
    * Same min-max normalization as q162; Classification.logLoss's
    * eps-clamp keeps the boundary rows (p=0 at the observed min, p=1 at
    * the max) finite. avg over ln terms → float32 at the edge.
    */
  private val q167 = QueryDef.sql(
    "log-loss of the normalized score against the purchase label")(
    """WITH v AS (SELECT value AS v, (event_type = 'purchase')::INT AS y
      |  FROM events WHERE value IS NOT NULL),
      |b AS (SELECT min(v) AS lo, max(v) AS hi FROM v),
      |p AS (SELECT y,
      |    least(greatest((v - lo) / (hi - lo), 1e-15), 1 - 1e-15) AS p
      |  FROM v, b)
      |SELECT cast(avg(-(y * ln(p) + (1 - y) * ln(1 - p))) AS REAL)
      |    AS log_loss,
      |  count(*) AS n
      |FROM p""".stripMargin) { (s, dir) =>
    import s.implicits._
    val v = Tables(s, dir).events.filter($"value".isNotNull)
      .select($"value".as("v"),
        ($"event_type" === "purchase").cast("int").as("y"))
    val Seq(lo, hi) = v.agg(min($"v"), max($"v")).first()
      .toSeq.map(_.asInstanceOf[Double])
    val scored = v.select($"y", (($"v" - lit(lo)) / lit(hi - lo)).as("p"))
    graft.ml.Classification.logLoss(scored, "y", "p")
      .select(col("value").cast("float").as("log_loss"), col("n"))
  }

  /** Stratified k-fold assignment, portable-order variant (M2's gate: the
    * pipeline path uses rand(seed) per the reference's
    * StratifiedKFold(shuffle=True); this gate swaps the seeded shuffle for
    * the md5-content order q38's sampler already gates, so the SAME
    * round-robin-within-stratum rule is replayable cross-engine). Output
    * proves both the balance contract (per-(fold,label) counts differ by
    * at most 1 within a stratum) and the exact membership (id_sum).
    * Ranks ride ParallelRank's range exchange — no per-stratum sort task.
    */
  private val q170 = QueryDef.sql(
    "stratified 3-fold assignment (md5 order): per-fold class counts + membership checksum")(
    """WITH l AS (SELECT event_id, (value > 50)::INT AS label FROM events
      |  WHERE value IS NOT NULL),
      |r AS (SELECT event_id, label,
      |    (row_number() OVER (PARTITION BY label
      |       ORDER BY md5(cast(event_id AS VARCHAR))) - 1) % 3 AS fold
      |  FROM l)
      |SELECT fold, label, count(*) AS n,
      |  cast(sum(event_id) AS BIGINT) AS id_sum
      |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    import s.implicits._
    val l = Tables(s, dir).events.filter($"value".isNotNull)
      .select($"event_id", ($"value" > 50).cast("int").as("label"))
    graft.operators.ParallelRank.rowNumber(
        l.withColumn("__o", md5($"event_id".cast("string"))),
        Seq("label"), "__o", "__rn", smallGroupsHint = true)
      .withColumn("fold", (($"__rn" - 1) % 3).cast("long"))
      .groupBy($"fold", $"label")
      .agg(count(lit(1)).as("n"), sum($"event_id").as("id_sum"))
      .smallOrdered($"fold", $"label")
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q159_psi_drift" -> q159,
    "q160_roc_auc" -> q160,
    "q161_lift_gains" -> q161,
    "q162_calibration_bins" -> q162,
    "q165_woe_iv" -> q165,
    "q167_log_loss" -> q167,
    "q170_stratified_folds" -> q170
  )
}
