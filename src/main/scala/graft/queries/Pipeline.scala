package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextAnalysis
import graft.operators.{Dedup, Merge, Sampling, WeightedQuantiles}

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
  private val q75 = QueryDef.scalableSql(
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
      |ORDER BY da, db""".stripMargin)(
    """WITH grp AS MATERIALIZED (
      |SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep,
      |  count(*) OVER (PARTITION BY text) AS gsize
      |FROM documents),
      |rsh AS MATERIALIZED (
      |WITH reps AS (SELECT d.doc_id, d.text FROM documents d
      |    JOIN grp g ON d.doc_id = g.doc_id WHERE g.doc_id = g.rep),
      |tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM reps),
      |idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 1))) AS i FROM tok),
      |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx)
      |SELECT doc_id, s FROM sh),
      |rsizes AS MATERIALIZED (
      |SELECT doc_id, count(*) AS n FROM rsh GROUP BY 1),
      |rpairs AS MATERIALIZED (
      |WITH p AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
      |  FROM rsh a JOIN rsh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT p.da, p.db, p.inter, na.n AS na, nb.n AS nb
      |FROM p JOIN rsizes na ON p.da = na.doc_id
      |       JOIN rsizes nb ON p.db = nb.doc_id
      |WHERE 10 * p.inter >= 9 * (na.n + nb.n - p.inter)),
      |m75 AS MATERIALIZED (
      |SELECT ga.doc_id AS da, gb.doc_id AS db, r.inter, r.na AS na, r.nb AS nb
      |FROM rpairs r JOIN grp ga ON ga.rep = r.da AND ga.doc_id % 2 = 0
      |               JOIN grp gb ON gb.rep = r.db AND gb.doc_id % 2 = 1
      |UNION ALL
      |SELECT ga.doc_id, gb.doc_id, r.inter, r.nb, r.na
      |FROM rpairs r JOIN grp ga ON ga.rep = r.db AND ga.doc_id % 2 = 0
      |               JOIN grp gb ON gb.rep = r.da AND gb.doc_id % 2 = 1
      |UNION ALL
      |SELECT a.doc_id, b.doc_id, sz.n, sz.n, sz.n
      |FROM grp a JOIN grp b ON a.rep = b.rep AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
      |JOIN rsizes sz ON sz.doc_id = a.rep)
      |SELECT da, db, inter, na, nb,
      |  inter::DOUBLE / (na + nb - inter) AS jaccard
      |FROM m75 ORDER BY da, db""".stripMargin) { (s, dir) =>
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
    // groupCountHint (round 14): l_returnflag has 3 values at every SF
    // (schema invariant) — the hint removes the approx_count_distinct
    // dispatch probe, a full extra pass over lineitem (guide §1.2)
    WeightedQuantiles.byGroup(
        t.fanOut(t.lineitem
          .select($"l_returnflag", $"l_extendedprice", $"l_quantity")),
        Seq("l_returnflag"), "l_extendedprice", $"l_quantity",
        Seq(("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4)),
        groupCountHint = Some(3L))
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

  /** Largest-remainder apportionment of 100 training slots across sources
    * by total characters — the mix planner ahead of per-source draws
    * (`Sampling.apportionLargestRemainder`). Quotas sum to exactly 100;
    * every decision is 64-bit integer arithmetic (base = ⌊N·w/W⌋, extras
    * to the largest N·w mod W, ties to the first source).
    */
  private val q81 = QueryDef.sql(
    "largest-remainder apportionment: 100 slots across sources by chars")(
    """WITH w AS (SELECT source, sum(n_chars)::BIGINT AS wt FROM documents
      |  GROUP BY 1),
      |t AS (SELECT sum(wt)::BIGINT AS W FROM w),
      |q AS (SELECT source, wt, (100 * wt) // W AS base, (100 * wt) % W AS rem
      |  FROM w, t),
      |rk AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rr
      |  FROM q),
      |n AS (SELECT 100 - sum(base)::BIGINT AS extra FROM q)
      |SELECT source, wt, base::BIGINT AS base_quota,
      |  (CASE WHEN rr <= extra THEN 1 ELSE 0 END)::BIGINT AS extra_seat,
      |  (base + CASE WHEN rr <= extra THEN 1 ELSE 0 END)::BIGINT AS quota
      |FROM rk, n ORDER BY source""".stripMargin) { (s, dir) =>
    import s.implicits._
    val weights = Tables(s, dir).documents
      .groupBy($"source").agg(sum($"n_chars").as("chars"))
    Sampling.apportionLargestRemainder(weights, Seq("source"), "chars",
        total = 100L)
      .withColumnRenamed("wt", "wt")
      .smallOrdered($"source")
  }

  /** Time-weighted average value per event type (the time-in-state mean of
    * ops dashboards): each event's value holds until the next same-type
    * event; TWAP = Σ duration·value / Σ duration. Values quantized to the
    * 1e-2 fixed-point grid (the q73 rule) and durations are exact integer
    * micros, so BOTH sums are exact 64-bit integers and the single double
    * division replays bit-exactly. (Beyond ~10^18 μs·value mass the sums
    * need DECIMAL(38) — same shape, wider type.)
    */
  private val q82 = QueryDef.sql(
    "time-weighted average value per event type (fixed-point exact)")(
    """WITH e AS (SELECT event_type, epoch_us(ts) AS t_us,
      |    CAST(floor(value * 100.0) AS BIGINT) AS v100,
      |    lead(epoch_us(ts)) OVER (PARTITION BY event_type
      |                             ORDER BY ts, event_id) AS nxt
      |  FROM events),
      |s AS (SELECT event_type,
      |    sum((nxt - t_us) * v100)::BIGINT AS num,
      |    sum(nxt - t_us)::BIGINT AS dur_us
      |  FROM e WHERE nxt IS NOT NULL GROUP BY 1)
      |SELECT event_type, num, dur_us,
      |  (num::DOUBLE / dur_us::DOUBLE) / 100.0 AS twap
      |FROM s ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"ts", $"event_id")
    Tables(s, dir).events
      .select($"event_type", $"ts", $"event_id",
        Tables.epochUs($"ts").as("t_us"),
        floor($"value" * 100.0).cast("long").as("v100"))
      .withColumn("nxt", lead($"t_us", 1).over(w))
      .filter($"nxt".isNotNull)
      .groupBy($"event_type")
      .agg(sum(($"nxt" - $"t_us") * $"v100").as("num"),
        sum($"nxt" - $"t_us").as("dur_us"))
      .select($"event_type", $"num", $"dur_us",
        (($"num".cast("double") / $"dur_us".cast("double")) / 100.0)
          .as("twap"))
      .smallOrdered($"event_type")
  }

  /** Forward as-of join (`AsOfJoin.earliestAfter`): each signup matched to
    * the user's earliest purchase at-or-after it — conversion latency. One
    * union + one keyed window (same plan family as q32's backward as-of);
    * latency is exact integer micros. As in q32, the oracle pre-reduces
    * duplicate (user_id, ts) right rows to the engine's pinned tie-break
    * (the MIN payload tuple for the forward direction) so both sides are
    * deterministic by construction.
    */
  private val q83 = QueryDef.sql(
    "forward as-of join: earliest following purchase per signup + latency")(
    """SELECT s.event_id AS signup_id, s.user_id, p.event_id AS conv_id,
      |  epoch_us(p.ts) - epoch_us(s.ts) AS latency_us
      |FROM (SELECT * FROM events WHERE event_type = 'signup') s
      |ASOF JOIN (
      |  SELECT user_id, ts, event_id FROM (
      |    SELECT user_id, ts, event_id, row_number() OVER (
      |      PARTITION BY user_id, ts ORDER BY event_id ASC) AS rn
      |    FROM events WHERE event_type = 'purchase') WHERE rn = 1) p
      |  ON s.user_id = p.user_id AND s.ts <= p.ts
      |ORDER BY signup_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = Tables(s, dir).events
    val signups = ev.filter($"event_type" === "signup")
      .select($"event_id".as("signup_id"), $"user_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id".as("conv_id"),
        $"ts".as("conv_ts"))
    graft.operators.AsOfJoin.earliestAfter(
        signups, purchases, Seq("user_id"), "ts",
        rightPayload = Seq("conv_id", "conv_ts"))
      .select($"signup_id", $"user_id", $"conv_id",
        (Tables.epochUs($"conv_ts") - Tables.epochUs($"ts")).as("latency_us"))
      .cachedOrdered($"signup_id")
  }

  /** Int8 embedding quantization audit (the ANN-index compression step):
    * per-vector max-abs scale to [-127, 127], elementwise ⌊x·scale⌋ — all
    * decisions replayed exactly (float→double widening then one double
    * multiply and floor, both engines identical). Per-label totals certify
    * the quantized representation: sum/min/max of quantized codes are
    * exact integers.
    */
  private val q84 = QueryDef.sql(
    "int8 embedding quantization audit per label")(
    """WITH v AS (SELECT label, vec_id,
      |    127.0 / list_max(list_transform(embedding,
      |      x -> abs(CAST(x AS DOUBLE)))) AS scale,
      |    embedding FROM embeddings),
      |q AS (SELECT label, vec_id,
      |    unnest(list_transform(embedding,
      |      x -> CAST(floor(CAST(x AS DOUBLE) * scale) AS BIGINT))) AS qv
      |  FROM v)
      |SELECT label, count(DISTINCT vec_id) AS n_vecs, sum(qv)::BIGINT AS sum_q,
      |  min(qv)::BIGINT AS min_q, max(qv)::BIGINT AS max_q
      |FROM q GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables(s, dir).embeddingsFanned
      .select($"label", $"vec_id",
        expr("127.0 / array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))")
          .as("scale"), $"embedding")
      .select($"label", $"vec_id", explode(expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * scale) AS BIGINT))"))
        .as("qv"))
      .groupBy($"label")
      .agg(countDistinct($"vec_id").as("n_vecs"), sum($"qv").as("sum_q"),
        min($"qv").as("min_q"), max($"qv").as("max_q"))
      .smallOrdered($"label")
  }

  /** Snapshot diff (`Merge.snapshotDiff`): classify every customer key
    * across the q66 CDC merge as added / removed / changed / unchanged —
    * the change-data-feed between table versions. One full-outer key join;
    * values compare null-safely, never through rendered strings.
    */
  private val q85 = QueryDef.sql(
    "snapshot diff: per-status counts between customer and its CDC merge")(
    """WITH upd AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 10.0 AS c_acctbal,
      |         c_mktsegment
      |  FROM customer WHERE c_custkey IN (
      |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')),
      |ins AS (
      |  SELECT 1000000 + s_suppkey AS c_custkey, s_name AS c_name,
      |         s_nationkey AS c_nationkey, s_acctbal AS c_acctbal,
      |         'SUPPLIER' AS c_mktsegment
      |  FROM supplier),
      |chg AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
      |del AS (SELECT c_custkey FROM customer WHERE c_acctbal < -500.0),
      |b AS (SELECT * FROM (
      |  SELECT * FROM customer
      |  WHERE c_custkey NOT IN (SELECT c_custkey FROM chg)
      |  UNION ALL SELECT * FROM chg) m
      |  WHERE m.c_custkey NOT IN (SELECT c_custkey FROM del)),
      |d AS (SELECT coalesce(a.c_custkey, b.c_custkey) AS key,
      |  CASE WHEN a.c_custkey IS NULL THEN 'added'
      |       WHEN b.c_custkey IS NULL THEN 'removed'
      |       WHEN a.c_name IS DISTINCT FROM b.c_name
      |         OR a.c_nationkey IS DISTINCT FROM b.c_nationkey
      |         OR a.c_acctbal IS DISTINCT FROM b.c_acctbal
      |         OR a.c_mktsegment IS DISTINCT FROM b.c_mktsegment
      |         THEN 'changed' ELSE 'unchanged' END AS status
      |  FROM customer a FULL JOIN b ON a.c_custkey = b.c_custkey)
      |SELECT status, count(*) AS n FROM d GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val t = Tables(s, dir)
    val urgent = t.orders
      .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    val updates = t.customer
      .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
      .withColumn("c_acctbal", $"c_acctbal" + lit(10.0))
    val inserts = t.supplier.select(
      (lit(1000000L) + $"s_suppkey").as("c_custkey"),
      $"s_name".as("c_name"),
      $"s_nationkey".as("c_nationkey"),
      $"s_acctbal".as("c_acctbal"),
      lit("SUPPLIER").as("c_mktsegment"))
    val deletes = t.customer.filter($"c_acctbal" < -500.0).select($"c_custkey")
    val after = Merge.upsertDelete(t.customer,
      updates.unionByName(inserts), deletes, "c_custkey")
    Merge.snapshotDiff(t.customer, after, Seq("c_custkey"))
      .groupBy($"status").agg(count(lit(1)).as("n"))
      .smallOrdered($"status")
  }

  /** Functional-dependency audit (`Constraints.functionalDependency`): is
    * l_suppkey determined by l_orderkey? (It is not — the violation count
    * and share quantify by how much.) One hash aggregate by key plus a
    * bounded summary row; the FD check of schema discovery and data-quality
    * suites.
    */
  private val q86 = QueryDef.sql(
    "functional-dependency audit: l_orderkey -> l_suppkey")(
    """WITH fd AS (SELECT l_orderkey, count(DISTINCT l_suppkey) AS nv
      |  FROM lineitem GROUP BY 1)
      |SELECT 'fd(l_orderkey -> l_suppkey)' AS check_name,
      |  count(*) AS n_keys,
      |  sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END)::BIGINT AS violating_keys,
      |  max(nv)::BIGINT AS max_distinct,
      |  sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)
      |    AS violation_share,
      |  (CASE WHEN sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END) = 0
      |    THEN 1 ELSE 0 END)::INT AS pass
      |FROM fd""".stripMargin) { (s, dir) =>
    // project + fan out: the count_distinct partial aggregate otherwise
    // runs inside the single-row-group scan task (round 14 profile: one
    // 0.36 s task); two long columns shuffle cheaply (guide §2.3)
    val t86 = Tables(s, dir)
    graft.operators.Constraints.functionalDependency(
      t86.fanOut(t86.lineitem.select(col("l_orderkey"), col("l_suppkey"))),
      Seq("l_orderkey"), Seq("l_suppkey"))
  }

  /** Benford first-significant-digit audit of l_extendedprice — the
    * classic synthetic-data / fraud smell test. Digit extraction goes
    * through integer-string rendering (portable — never decimal
    * formatting); output is the per-digit observed distribution, shares
    * as one exact-integer division each.
    */
  private val q87 = QueryDef.sql(
    "Benford first-digit distribution of l_extendedprice")(
    """WITH d AS (SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT)
      |      AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |  FROM lineitem WHERE l_extendedprice >= 1),
      |t AS (SELECT count(*) AS n FROM d)
      |SELECT digit, count(*) AS obs,
      |  count(*)::DOUBLE / n::DOUBLE AS share
      |FROM d, t GROUP BY digit, n ORDER BY digit""".stripMargin) { (s, dir) =>
    import s.implicits._
    val d = Tables(s, dir).lineitem
      .filter($"l_extendedprice" >= 1)
      .select(substring(floor($"l_extendedprice").cast("long").cast("string"),
        1, 1).cast("long").as("digit"))
    val tot = d.agg(count(lit(1)).as("n"))
    d.groupBy($"digit").agg(count(lit(1)).as("obs"))
      .crossJoin(broadcast(tot))
      .select($"digit", $"obs",
        ($"obs".cast("double") / $"n".cast("double")).as("share"))
      .smallOrdered($"digit")
  }

  /** Vocabulary coverage curve: the top-20 corpus tokens by occurrence
    * count with their cumulative corpus share — the top-p/nucleus-style
    * vocabulary-planning view. Global top-k plans as
    * TakeOrderedAndProject (per-partition bounded heaps + driver merge —
    * no vocabulary sort at any scale); rank and cumulative sum run over
    * the 20-row result (bounded-window convention). Counts exact; each
    * share one double division.
    */
  private val q88 = QueryDef.sql(
    "vocabulary coverage curve: top-20 tokens + cumulative corpus share")(
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
      |c AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
      |n AS (SELECT sum(c)::BIGINT AS tot FROM c),
      |r AS (SELECT t, c, row_number() OVER (ORDER BY c DESC, t) AS rank,
      |    sum(c) OVER (ORDER BY c DESC, t) AS cum FROM c)
      |SELECT rank, t AS token, c AS cnt,
      |  cum::BIGINT AS cum_cnt, cum::DOUBLE / tot::DOUBLE AS cum_share
      |FROM r, n WHERE rank <= 20 ORDER BY rank""".stripMargin) { (s, dir) =>
    import s.implicits._
    val counts = Tables(s, dir).documentsFanned
      .select(explode(TextAnalysis.tokens($"text")).as("t"))
      .groupBy($"t").agg(count(lit(1)).as("c"))
    val tot = counts.agg(sum($"c").as("tot"))
    val top = counts.orderBy($"c".desc, $"t").limit(20)
    val w = Window.orderBy($"c".desc, $"t") // 20-row frame post-limit
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_cnt", sum($"c").over(w))
      .crossJoin(broadcast(tot))
      .select($"rank", $"t".as("token"), $"c".as("cnt"), $"cum_cnt",
        ($"cum_cnt".cast("double") / $"tot".cast("double")).as("cum_share"))
      .smallOrdered($"rank")
  }

  /** Class-balance audit of the embedding labels: label count, total,
    * majority share, and Kish effective sample size (Σn)²/Σn² — the
    * degree to which imbalance shrinks the usable sample. All sums exact
    * 64-bit integers; two double divisions.
    */
  private val q89 = QueryDef.sql(
    "class balance + effective sample size over embedding labels")(
    """WITH c AS (SELECT label, count(*)::BIGINT AS n FROM embeddings GROUP BY 1)
      |SELECT count(*)::BIGINT AS n_classes, sum(n)::BIGINT AS n_rows,
      |  max(n)::BIGINT AS max_class,
      |  (sum(n) * sum(n))::DOUBLE / sum(n * n)::DOUBLE AS ess,
      |  max(n)::DOUBLE / sum(n)::DOUBLE AS majority_share
      |FROM c""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables(s, dir).embeddings
      .groupBy($"label").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_classes"), sum($"n").as("n_rows"),
        max($"n").as("max_class"), sum($"n" * $"n").as("ss"))
      .select($"n_classes", $"n_rows", $"max_class",
        (($"n_rows" * $"n_rows").cast("double") / $"ss".cast("double"))
          .as("ess"),
        ($"max_class".cast("double") / $"n_rows".cast("double"))
          .as("majority_share"))
  }

  /** Join-key skew audit — the partition-planning question ahead of any
    * big join: how are fact rows distributed over the join key? Group
    * sizes live on a bounded grid (≤ max lines per order at ANY scale), so
    * the exact p50/p99 route through `WeightedQuantiles`' histogram
    * dispatch; n/max/avg are one aggregate over the counts frame.
    */
  private val q90 = QueryDef.sql(
    "join-key skew audit: lineitem rows per orderkey, exact p50/p99")(
    """WITH c AS (SELECT l_orderkey, count(*)::BIGINT AS cnt FROM lineitem
      |  GROUP BY 1),
      |w AS (SELECT cnt, sum(1) OVER (ORDER BY cnt) AS cw,
      |      count(*) OVER () AS n FROM c)
      |SELECT count(*) AS n_keys, max(cnt)::BIGINT AS max_per_key,
      |  (SELECT min(CASE WHEN cw*2 >= n THEN cnt END)::DOUBLE FROM w) AS p50,
      |  (SELECT min(CASE WHEN cw*100 >= n*99 THEN cnt END)::DOUBLE FROM w)
      |    AS p99,
      |  sum(cnt)::DOUBLE / count(*) AS avg_per_key
      |FROM c""".stripMargin) { (s, dir) =>
    import s.implicits._
    // Round-14 fanned the key column out of the scan task before the
    // per-key count; round 15's interleaved suite-context A/B REVERTED it
    // (VERDICT r14 #2, matching the driver's r14 line): l_orderkey is
    // near-unique (~4 rows/key), so the scan task's map-side partial
    // shrinks the exchange ~4x, while the fan-out shipped EVERY row to buy
    // scan parallelism worth less than the extra bytes (2+2 interleaved
    // legs: 0.585 s reverted vs 0.655 s fanned).
    val t90 = Tables(s, dir)
    val counts = t90.lineitem.select($"l_orderkey")
      .groupBy($"l_orderkey").agg(count(lit(1)).as("cnt"))
    val summary = counts.agg(count(lit(1)).as("n_keys"),
      max($"cnt").as("max_per_key"), sum($"cnt").as("__tot"))
    val pct = WeightedQuantiles.byGroup(counts, Seq.empty, "cnt", lit(1L),
      Seq(("p50", 1, 2), ("p99", 99, 100)), distinctValueHint = Some(1024L))
    summary.crossJoin(broadcast(pct))
      .select($"n_keys", $"max_per_key", $"p50", $"p99",
        ($"__tot".cast("double") / $"n_keys").as("avg_per_key"))
  }

  /** Inter-event gap audit per type (downtime / heartbeat monitoring):
    * max and median gap between consecutive same-type events, exact
    * integer micros; the median gap routes through the weighted-quantile
    * byte-gate dispatch (gaps are near-unique — no grid hint applies).
    */
  private val q91 = QueryDef.sql(
    "inter-event gap audit per type: count, max and median gap")(
    """WITH g AS (SELECT event_type,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY event_type
      |      ORDER BY ts, event_id) AS gap
      |  FROM events),
      |d AS (SELECT event_type, gap FROM g WHERE gap IS NOT NULL),
      |w AS (SELECT event_type, gap,
      |    sum(1) OVER (PARTITION BY event_type ORDER BY gap) AS cw,
      |    count(*) OVER (PARTITION BY event_type) AS n FROM d)
      |SELECT event_type, count(*) AS n_gaps, max(gap)::BIGINT AS max_gap_us,
      |  min(CASE WHEN cw*2 >= n THEN gap END)::DOUBLE AS p50_gap_us
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"ts", $"event_id")
    val gaps = Tables(s, dir).events
      .select($"event_type", $"ts", $"event_id",
        Tables.epochUs($"ts").as("t_us"))
      .withColumn("gap", $"t_us" - lag($"t_us", 1).over(w))
      .filter($"gap".isNotNull)
      .select($"event_type", $"gap")
    val summary = gaps.groupBy($"event_type")
      .agg(count(lit(1)).as("n_gaps"), max($"gap").as("max_gap_us"))
    // event_type is a 5-value enum at every SF; the hint removes the
    // dispatch probe's full extra pass over the gap frame (round 14). 8 is
    // a deliberate safety margin over the 5 known values — overestimating
    // is the safe direction (dispatch-only, results identical either way).
    val med = WeightedQuantiles.byGroup(gaps, Seq("event_type"), "gap",
      lit(1L), Seq(("p50_gap_us", 1, 2)), groupCountHint = Some(8L))
    summary.join(med, "event_type")
      .select($"event_type", $"n_gaps", $"max_gap_us", $"p50_gap_us")
      .smallOrdered($"event_type")
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q74_dup_passages" -> q74,
    "q75_incremental_neardup" -> q75,
    "q76_event_transitions" -> q76,
    "q77_tvd_drift" -> q77,
    "q78_weighted_quantiles" -> q78,
    "q79_collocation_lift" -> q79,
    "q80_mad_outliers" -> q80,
    "q81_mix_apportionment" -> q81,
    "q82_time_weighted_avg" -> q82,
    "q83_forward_asof" -> q83,
    "q84_int8_quantization" -> q84,
    "q85_snapshot_diff" -> q85,
    "q86_fd_audit" -> q86,
    "q87_benford_digits" -> q87,
    "q88_vocab_coverage" -> q88,
    "q89_class_balance" -> q89,
    "q90_key_skew_audit" -> q90,
    "q91_event_gap_audit" -> q91
  )
}
