package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextAnalysis
import graft.operators.{Dedup, WeightedQuantiles}

/** Pipeline-statistics surface (round 7, second batch): substring-level
  * duplication signals, incremental cross-corpus near-dup, Markov event
  * transitions, total-variation drift, exact weighted quantiles,
  * collocation lift, and robust MAD outlier detection.
  *
  * Portability rule shared by the batch: every gated value is either exact
  * integer arithmetic or a SINGLE double division/subtraction of exactly
  * computed integers — no transcendental functions, no order-dependent
  * float accumulation — so the DuckDB oracle replays each bit.
  */
object Pipeline {

  /** Substring-level duplication audit (the bounded form of suffix-array
    * passage dedup): share of each document's 8-token passages that appear
    * in at least one other document. Corpus shingled ONCE into (id, hash64)
    * rows; the passage-DF aggregate and the join back move 16-byte rows
    * only (`Dedup.duplicatePassageShare`).
    */
  private val q74 = QueryDef.sql(
    "duplicated-passage share per document (8-token passages, df >= 2)")(
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 6, 1))) AS i FROM tok),
      |sh AS (SELECT DISTINCT doc_id,
      |    t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]||' '||t[i+5]||' '||t[i+6]||' '||t[i+7] AS s
      |  FROM idx),
      |pdf AS (SELECT s, count(*) AS d FROM sh GROUP BY 1),
      |per AS (SELECT sh.doc_id, count(*) AS n_shingles,
      |    sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup
      |  FROM sh JOIN pdf USING (s) GROUP BY 1)
      |SELECT doc_id, n_shingles, n_dup,
      |  n_dup::DOUBLE / n_shingles AS dup_share
      |FROM per ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Dedup.duplicatePassageShare(
        Tables(s, dir).documentsFanned, "doc_id", "text", n = 8)
      .select($"id".as("doc_id"), $"n_shingles", $"n_dup", $"dup_share")
      .smallOrdered($"doc_id")
  }

  /** Incremental near-dup: the odd-id half of the corpus arrives as a new
    * batch and is matched against the even-id reference snapshot —
    * `Dedup.crossNearDups` generates ref×batch candidates ONLY (no
    * self-pairs on either side) via a banded-signature equi-join, then
    * exact-verifies. The oracle is the exact cross-pair Jaccard (q20's
    * recall argument: ≥ 1 − 4e-8 at j ≥ 0.9 under 16×4 banding).
    */
  private val q75 = QueryDef.sql(
    "incremental near-dup: odd-id batch vs even-id reference, j >= 0.9")(
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 1))) AS i FROM tok),
      |sh AS (SELECT DISTINCT doc_id, t[i]||' '||t[i+1]||' '||t[i+2] AS s FROM idx),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s
      |    AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
      |  GROUP BY 1, 2)
      |SELECT da, db, inter, na.n AS na, nb.n AS nb,
      |  inter::DOUBLE / (na.n + nb.n - inter) AS jaccard
      |FROM pairs JOIN sizes na ON pairs.da = na.doc_id
      |           JOIN sizes nb ON pairs.db = nb.doc_id
      |WHERE inter::DOUBLE / (na.n + nb.n - inter) >= 0.9
      |ORDER BY da, db""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables(s, dir).documentsFanned
    Dedup.crossNearDups(
        docs.filter($"doc_id" % 2 === 0), docs.filter($"doc_id" % 2 === 1),
        "doc_id", "text", n = 3, minJaccard = 0.9)
      .select($"da", $"db", $"inter", $"na", $"nb", $"jaccard")
      .smallOrdered($"da", $"db")
  }

  /** First-order Markov transition matrix of the event stream: counts and
    * row-normalized probabilities of consecutive (from → to) event-type
    * pairs per user timeline. One shuffle by user plus a per-user window
    * (bounded per-user history); the 25-cell matrix and its row totals are
    * tiny frames. Probability = one double division of exact counts.
    */
  private val q76 = QueryDef.sql(
    "event-type Markov transitions: consecutive pair counts + row probs")(
    """WITH s AS (SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS to_type
      |  FROM events),
      |t AS (SELECT from_type, to_type, count(*) AS cnt FROM s
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |tt AS (SELECT from_type, sum(cnt)::BIGINT AS tot FROM t GROUP BY 1)
      |SELECT t.from_type, t.to_type, cnt, cnt::DOUBLE / tot AS prob
      |FROM t JOIN tt USING (from_type)
      |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val trans = Tables(s, dir).events
      .select($"event_type".as("from_type"),
        lead($"event_type", 1).over(w).as("to_type"))
      .filter($"to_type".isNotNull)
      .groupBy($"from_type", $"to_type").agg(count(lit(1)).as("cnt"))
    val totals = trans.groupBy($"from_type").agg(sum($"cnt").as("tot"))
    trans.join(broadcast(totals), "from_type")
      .select($"from_type", $"to_type", $"cnt",
        ($"cnt".cast("double") / $"tot").as("prob"))
      .smallOrdered($"from_type", $"to_type")
  }

  /** Total-variation-distance drift between two event populations (even vs
    * odd event ids — the reference/current split), reported per category so
    * no cross-category float accumulation exists: each term is
    * |c_ref·n_cur − c_cur·n_ref| (exact integers) over 2·n_ref·n_cur in ONE
    * double division; the TVD is the sum of terms. Both splits are counted
    * in a single conditional-sum scan. (At populations beyond ~3·10^9 rows
    * the integer cross-products need DECIMAL(38) — same shape, wider type.)
    */
  private val q77 = QueryDef.sql(
    "TVD drift per event type: even vs odd event-id populations")(
    """WITH p AS (SELECT event_type,
      |    sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS c_ref,
      |    sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS c_cur
      |  FROM events GROUP BY 1),
      |t AS (SELECT sum(c_ref)::BIGINT AS n_ref, sum(c_cur)::BIGINT AS n_cur FROM p)
      |SELECT event_type, c_ref, c_cur,
      |  abs(c_ref * n_cur - c_cur * n_ref)::DOUBLE
      |    / (2.0 * (n_ref * n_cur)::DOUBLE) AS tvd_term
      |FROM p, t ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val parts = Tables(s, dir).events
      .groupBy($"event_type")
      .agg(sum(when($"event_id" % 2 === 0, 1L).otherwise(0L)).as("c_ref"),
        sum(when($"event_id" % 2 === 1, 1L).otherwise(0L)).as("c_cur"))
    val tot = parts.agg(sum($"c_ref").as("n_ref"), sum($"c_cur").as("n_cur"))
    parts.crossJoin(broadcast(tot))
      .select($"event_type", $"c_ref", $"c_cur",
        (abs($"c_ref" * $"n_cur" - $"c_cur" * $"n_ref").cast("double")
          / (lit(2.0) * ($"n_ref" * $"n_cur").cast("double"))).as("tvd_term"))
      .smallOrdered($"event_type")
  }

  /** Exact weighted quantiles: quantity-weighted price quartiles per return
    * flag — wq(q) = smallest price whose cumulative quantity reaches q of
    * the flag's total, decided as `cumw·den ≥ W·num` (integer-exact, see
    * `operators.WeightedQuantiles`). Cumulative weights via a range
    * exchange + broadcast offsets — no per-group sort task.
    */
  private val q78 = QueryDef.sql(
    "quantity-weighted price quartiles per return flag (exact)")(
    """WITH c AS (SELECT l_returnflag, l_extendedprice AS v,
      |    sum(l_quantity) OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice) AS cw,
      |    sum(l_quantity) OVER (PARTITION BY l_returnflag) AS w
      |  FROM lineitem)
      |SELECT l_returnflag,
      |  min(CASE WHEN cw * 4 >= w THEN v END) AS p25,
      |  min(CASE WHEN cw * 2 >= w THEN v END) AS p50,
      |  min(CASE WHEN cw * 4 >= 3 * w THEN v END) AS p75
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val t = Tables(s, dir)
    // fan the single-row-group scan out before the range exchange: the
    // boundary-sampling pass and the exchange write otherwise serialize
    // through one task (Tables.fanOut rationale)
    WeightedQuantiles.byGroup(
        t.fanOut(t.lineitem
          .select($"l_returnflag", $"l_extendedprice", $"l_quantity")),
        Seq("l_returnflag"), "l_extendedprice", $"l_quantity",
        Seq(("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4)))
      .smallOrdered($"l_returnflag")
  }

  /** Collocation lift (the log-free PMI core): for corpus bigrams with
    * document frequency ≥ 5, lift = N·df(w1w2) / (df(w1)·df(w2)) — > 1
    * means the words co-occur more than independence predicts. All counts
    * exact; lift is one double division of exact integer products. Bigram
    * and unigram DFs are distinct-per-doc shingle aggregates (map-side
    * combined); the unigram table joins twice on the token itself.
    */
  private val q79 = QueryDef.sql(
    "top-20 collocations by lift among bigrams with df >= 5")(
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t), 1))) AS i FROM tok),
      |bgd AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] AS bigram,
      |    t[i] AS w1, t[i+1] AS w2 FROM idx WHERE i < len(t)),
      |bdf AS (SELECT bigram, w1, w2, count(*) AS df_bg FROM bgd
      |  GROUP BY 1, 2, 3 HAVING count(*) >= 5),
      |ugd AS (SELECT DISTINCT doc_id, unnest(t) AS w FROM tok),
      |udf AS (SELECT w, count(*) AS dfw FROM ugd GROUP BY 1),
      |n AS (SELECT count(*) AS nd FROM documents)
      |SELECT bigram, df_bg,
      |  (nd * df_bg)::DOUBLE / (u1.dfw * u2.dfw)::DOUBLE AS lift
      |FROM bdf JOIN udf u1 ON bdf.w1 = u1.w JOIN udf u2 ON bdf.w2 = u2.w, n
      |ORDER BY lift DESC, bigram LIMIT 20""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables(s, dir).documentsFanned
    val bdf = docs
      .select(explode(TextAnalysis.wordShingles($"text", 2)).as("bigram"))
      .groupBy($"bigram").agg(count(lit(1)).as("df_bg"))
      .filter($"df_bg" >= 5)
      .withColumn("w1", split($"bigram", " ")(0))
      .withColumn("w2", split($"bigram", " ")(1))
    val udf = docs
      .select(explode(TextAnalysis.wordShingles($"text", 1)).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("dfw"))
    val nd = docs.agg(count(lit(1)).as("nd"))
    bdf
      .join(udf.select($"w".as("w1"), $"dfw".as("df1")), "w1")
      .join(udf.select($"w".as("w2"), $"dfw".as("df2")), "w2")
      .crossJoin(broadcast(nd))
      .select($"bigram", $"df_bg",
        (($"nd" * $"df_bg").cast("double")
          / ($"df1" * $"df2").cast("double")).as("lift"))
      .orderBy($"lift".desc, $"bigram")
      .limit(20)
  }

  /** Robust outlier audit: per event type, the (lower) median, the median
    * absolute deviation around it, and the count of |v − med| > 3·MAD
    * rows. Both medians are the weight-1 case of `WeightedQuantiles`
    * (integer-exact rank decisions, no per-group sort task); the outlier
    * pass is one conditional-sum scan against the broadcast med/MAD row
    * per type, so a type with zero outliers still reports 0.
    */
  private val q80 = QueryDef.sql(
    "median / MAD / 3-sigma-equivalent outlier counts per event type")(
    """WITH c AS (SELECT event_type, value,
      |    count(*) OVER (PARTITION BY event_type) AS n,
      |    sum(1) OVER (PARTITION BY event_type ORDER BY value) AS cw
      |  FROM events),
      |med AS (SELECT event_type,
      |    min(CASE WHEN cw * 2 >= n THEN value END) AS med FROM c GROUP BY 1),
      |d AS (SELECT e.event_type, abs(e.value - med.med) AS ad
      |  FROM events e JOIN med USING (event_type)),
      |c2 AS (SELECT event_type, ad,
      |    count(*) OVER (PARTITION BY event_type) AS n,
      |    sum(1) OVER (PARTITION BY event_type ORDER BY ad) AS cw
      |  FROM d),
      |mad AS (SELECT event_type,
      |    min(CASE WHEN cw * 2 >= n THEN ad END) AS mad FROM c2 GROUP BY 1),
      |o AS (SELECT e.event_type,
      |    sum(CASE WHEN abs(e.value - med.med) > 3 * mad.mad
      |        THEN 1 ELSE 0 END)::BIGINT AS n_outliers
      |  FROM events e JOIN med USING (event_type) JOIN mad USING (event_type)
      |  GROUP BY 1)
      |SELECT med.event_type, med.med, mad.mad, n_outliers
      |FROM med JOIN mad USING (event_type) JOIN o USING (event_type)
      |ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = Tables(s, dir).events.select($"event_type", $"value")
    // events.value (and therefore |value − med|) lives on a 0.01 grid —
    // the (type, value) histogram is bounded at any SF, so both quantile
    // passes route through the one-aggregate driver-walk dispatch
    val grid = Some(1L << 16)
    val med = WeightedQuantiles.byGroup(ev, Seq("event_type"), "value",
      lit(1L), Seq(("med", 1, 2)), distinctValueHint = grid)
    val dev = ev.join(broadcast(med), "event_type")
      .select($"event_type", abs($"value" - $"med").as("ad"))
    val mad = WeightedQuantiles.byGroup(dev, Seq("event_type"), "ad",
      lit(1L), Seq(("mad", 1, 2)), distinctValueHint = grid)
    val outl = ev.join(broadcast(med), "event_type")
      .join(broadcast(mad), "event_type")
      .groupBy($"event_type")
      .agg(sum(when(abs($"value" - $"med") > lit(3) * $"mad", 1L)
        .otherwise(0L)).as("n_outliers"))
    med.join(mad, "event_type").join(outl, "event_type")
      .select($"event_type", $"med", $"mad", $"n_outliers")
      .smallOrdered($"event_type")
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q74_dup_passages" -> q74,
    "q75_incremental_neardup" -> q75,
    "q76_event_transitions" -> q76,
    "q77_tvd_drift" -> q77,
    "q78_weighted_quantiles" -> q78,
    "q79_collocation_lift" -> q79,
    "q80_mad_outliers" -> q80
  )
}
