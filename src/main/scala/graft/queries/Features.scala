package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.ParallelRank

/** ML feature-engineering + dataset-audit surface (round 10): the
  * operators a training pipeline runs between raw curation and model
  * fitting — leakage-free categorical target encoding, exact
  * equal-frequency binning, and the train/validation contamination audit
  * that catches exact-duplicate leakage across a split.
  *
  * Exactness notes: every aggregate is integer (prices as per-row exact
  * cents longs, folds/splits from the 52-bit md5 hash contract the
  * sampling family already uses — reference `curation` notebooks derive
  * the same style of deterministic splits). Results are bit-identical
  * under any partitioning and engine.
  */
object Features {

  /** The engine-portable 52-bit content hash (13 leading md5 hex digits):
    * Spark side of the same expression the DuckDB oracles spell as
    * `CAST('0x' || substr(md5(x), 1, 13) AS BIGINT)`.
    */
  private def hash52(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 13), 16, 10)
      .cast("long")

  /** Out-of-fold target encoding of order priority against order value:
    * the leakage-free categorical encoder (each fold's encoding averages
    * only the OTHER folds' labels). Folds are deterministic via the md5
    * contract; the encoding ships as an exact (oof_sum_cents, oof_cnt)
    * pair per (category, fold) — the consumer divides.
    *
    * Scale shape: ONE full-data shuffle (the (category, fold) hash
    * aggregate, map-side combined); the per-category totals derive from
    * those ~|C|·K partials and join back broadcast. The base table is
    * never scanned twice.
    */
  private val q119 = QueryDef.sql(
    "out-of-fold target encoding: priority x fold exact OOF sums")(
    """WITH f AS (
      |  SELECT o_orderpriority AS priority,
      |    CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 13)
      |         AS BIGINT) % 5 AS fold,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |pf AS (
      |  SELECT priority, fold, count(*) AS n_fold,
      |         sum(cents)::BIGINT AS sum_fold_cents
      |  FROM f GROUP BY 1, 2),
      |tot AS (
      |  SELECT priority, sum(n_fold)::BIGINT AS n_tot,
      |         sum(sum_fold_cents)::BIGINT AS sum_tot
      |  FROM pf GROUP BY 1)
      |SELECT p.priority, p.fold, p.n_fold, p.sum_fold_cents,
      |       t.sum_tot - p.sum_fold_cents AS oof_sum_cents,
      |       t.n_tot - p.n_fold AS oof_cnt
      |FROM pf p JOIN tot t USING (priority)
      |ORDER BY priority, fold""".stripMargin) { (s, dir) =>
    import s.implicits._
    // persisted: pf feeds BOTH the output and the per-category totals —
    // unpinned, Spark would recompute the branch and scan orders twice.
    // The frame is bounded at |categories| × folds rows.
    val pf = Tables(s, dir).orders
      .select($"o_orderpriority".as("priority"),
        pmod(hash52($"o_orderkey"), lit(5L)).as("fold"),
        round($"o_totalprice" * 100).cast("long").as("cents"))
      .groupBy($"priority", $"fold")
      .agg(count(lit(1)).as("n_fold"), sum($"cents").as("sum_fold_cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = pf.groupBy($"priority")
      .agg(sum($"n_fold").as("n_tot"), sum($"sum_fold_cents").as("sum_tot"))
    pf.join(broadcast(tot), Seq("priority"))
      .select($"priority", $"fold", $"n_fold", $"sum_fold_cents",
        ($"sum_tot" - $"sum_fold_cents").as("oof_sum_cents"),
        ($"n_tot" - $"n_fold").as("oof_cnt"))
      .smallOrdered($"priority", $"fold")
  }

  /** Exact equal-frequency (decile) binning of customer balances with a
    * per-bin profile — the feature-discretization step, and the bin-edge
    * producer for monotone WOE-style encoders. Bins replicate SQL
    * NTILE(10) semantics exactly: the first n mod 10 bins take one extra
    * row, assigned from the strict (cents, custkey) total order.
    *
    * Scale shape: ranks come from ParallelRank's range exchange (no
    * single sort task); the bin arithmetic is per-row integer math on the
    * rank; the profile is one bounded hash aggregate. Key packing guards:
    * |cents| < 2^24 and custkey < 2^31 keep the composite sort key inside
    * a long — 56 bits — with headroom (violations raise, not corrupt; the
    * original 2^20 custkey bound is the bug the sf10 gate caught at 1.5M
    * customers).
    */
  private val q120 = QueryDef.sql(
    "exact equal-frequency deciles of customer balance + per-bin profile")(
    """WITH c AS (
      |  SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS cents, c_custkey
      |  FROM customer),
      |b AS (SELECT cents,
      |        ntile(10) OVER (ORDER BY cents, c_custkey) AS bin FROM c)
      |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS cnt,
      |       min(cents) AS min_cents, max(cents) AS max_cents,
      |       sum(cents)::BIGINT AS sum_cents
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val k = 10L
    val keyed = Tables(s, dir).customer
      .select(round($"c_acctbal" * 100).cast("long").as("cents"), $"c_custkey")
      .withColumn("sk",
        when($"cents" >= (1L << 24) || $"cents" <= -(1L << 24) ||
            $"c_custkey" >= (1L << 31) || $"c_custkey" < 0L,
          raise_error(concat(lit("decile key out of packing range: "),
            $"cents", lit("/"), $"c_custkey")))
          .otherwise(shiftleft($"cents" + (1L << 24), 31) + $"c_custkey"))
    ParallelRank.rowNumber(keyed, Seq.empty, "sk", rankCol = "rn",
        totalCol = Some("n"), smallGroupsHint = true)
      // NTILE: big = n div k, rem = n mod k; the first rem bins hold
      // big+1 rows each, the rest big rows — all exact long division
      .withColumn("big", expr("n div 10"))
      .withColumn("rem", $"n" % k)
      .withColumn("bin",
        when($"rn" <= ($"big" + 1L) * $"rem",
          expr("(rn - 1) div (big + 1)") + 1L)
          .otherwise($"rem" + expr("(rn - 1 - rem * (big + 1)) div big") + 1L))
      .groupBy($"bin")
      .agg(count(lit(1)).as("cnt"), min($"cents").as("min_cents"),
        max($"cents").as("max_cents"), sum($"cents").as("sum_cents"))
      .smallOrdered($"bin")
  }

  /** 0.8 × 2^52, truncated once in Scala and inlined into both engines'
    * expressions (see q124 scaladoc).
    */
  private val TrainCut52: Long = (BigDecimal(1L << 52) * 0.8).toLong

  /** Train/validation leakage audit: deterministic 80/20 split by the md5
    * hash contract, then every leading-passage fingerprint (first 8
    * tokens — the opening-passage granularity; the corpus has no
    * full-text exact dups, near-dups share openings) that appears on BOTH
    * sides of the split — the contamination check a training pipeline
    * runs before every fit (a val doc opening identically to a train doc
    * inflates eval metrics).
    *
    * Scale shape: one hash aggregate keyed by the 32-hex fingerprint; the
    * shuffle rows carry (fp, two flags, two ids) — text never leaves its
    * scan. The split threshold is inlined as an integer literal in BOTH
    * engines (Scala toLong truncates where DuckDB CAST rounds — a
    * float-derived cut would silently disagree by one).
    */
  private val q124 = QueryDef.sql(
    "split-leakage audit: passage fingerprints straddling the 80/20 split")(
    s"""WITH d AS (
       |  SELECT doc_id,
       |    md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS fp,
       |    CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)
       |              AS BIGINT) < ${TrainCut52} THEN 1 ELSE 0 END AS is_train
       |  FROM documents),
       |g AS (
       |  SELECT fp, sum(is_train)::BIGINT AS train_cnt,
       |    (count(*) - sum(is_train))::BIGINT AS val_cnt,
       |    min(CASE WHEN is_train = 1 THEN doc_id END) AS min_train_doc,
       |    min(CASE WHEN is_train = 0 THEN doc_id END) AS min_val_doc
       |  FROM d GROUP BY fp)
       |SELECT fp, train_cnt, val_cnt, min_train_doc, min_val_doc
       |FROM g WHERE train_cnt > 0 AND val_cnt > 0
       |ORDER BY fp""".stripMargin) { (s, dir) =>
    import s.implicits._
    val isTrain = hash52($"doc_id") < TrainCut52
    Tables(s, dir).documents
      .select(md5(concat_ws(" ", slice(split($"text", " "), 1, 8))
          .cast("binary")).as("fp"),
        when(isTrain, 1L).otherwise(0L).as("t"), $"doc_id")
      .groupBy($"fp")
      .agg(sum($"t").as("train_cnt"),
        (count(lit(1)) - sum($"t")).as("val_cnt"),
        min(when($"t" === 1L, $"doc_id")).as("min_train_doc"),
        min(when($"t" === 0L, $"doc_id")).as("min_val_doc"))
      .filter($"train_cnt" > 0L && $"val_cnt" > 0L)
      .smallOrdered($"fp")
  }

  /** Hashed-feature linear quality scorer (the fastText-style shape: hash
    * tokens into B buckets, sum per-bucket weights, threshold) with a
    * deterministic integer weight table derived from the bucket id — the
    * classifier-based quality filter's serving path, gated end-to-end.
    *
    * Scale shape: the per-document score is ONE higher-order `aggregate`
    * over the token array — no explode, no per-token rows, no per-doc
    * shuffle; the only exchange carries (source, partial aggregates).
    * A learned weight table swaps in as a broadcast map-literal without
    * changing the plan shape.
    */
  private val q123 = QueryDef.sql(
    "hashed-feature linear scorer: per-source keep rate + score mass")(
    """WITH tok AS (
      |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS t
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, source,
      |    (CAST('0x' || substr(md5(t), 1, 13) AS BIGINT) % 1024) % 7 - 3 AS wt
      |  FROM tok),
      |d AS (
      |  SELECT doc_id, source, sum(wt)::BIGINT AS score
      |  FROM w GROUP BY 1, 2)
      |SELECT source, count(*) AS docs,
      |  sum(CASE WHEN score >= 0 THEN 1 ELSE 0 END)::BIGINT AS kept,
      |  sum(score)::BIGINT AS sum_score
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables(s, dir).documentsFanned
      .select($"source",
        expr("""aggregate(
            transform(split(text, ' '),
              t -> cast(conv(substring(md5(t), 1, 13), 16, 10) as bigint)
                     % 1024 % 7 - 3),
            0L, (acc, x) -> acc + x)""").as("score"))
      .groupBy($"source")
      .agg(count(lit(1)).as("docs"),
        sum(when($"score" >= 0L, 1L).otherwise(0L)).as("kept"),
        sum($"score").as("sum_score"))
      .smallOrdered($"source")
  }

  /** Bigram-frequency surprisal: each document scored by the mean corpus
    * document-frequency of its distinct bigrams — the count-based LM
    * surrogate for "how unusual is this text" (low mean df = rare
    * constructions; the quality-filter signal a real n-gram LM refines).
    * Emits the 20 most unusual docs with exact (sum_df, n_bigrams) pairs;
    * the ordering divides two exact longs, which is bit-identical IEEE
    * division in both engines.
    *
    * Scale shape: the bigram frame flows through a (bigram)-keyed hash
    * aggregate and joins back on the SAME key (the aggregate's exchange
    * partitioning is reused on the probe side — no extra corpus shuffle),
    * then collapses per doc. The df table is never broadcast: vocabulary
    * is unbounded at corpus scale.
    */
  private val q125 = QueryDef.sql(
    "bigram surprisal: 20 most unusual docs by mean bigram document-frequency")(
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t), 1))) AS i
      |        FROM tok),
      |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] AS s FROM idx),
      |df AS (SELECT s, count(*) AS df FROM sh GROUP BY 1),
      |d AS (SELECT sh.doc_id, count(*) AS n_bigrams, sum(df.df)::BIGINT AS sum_df
      |      FROM sh JOIN df USING (s) GROUP BY 1)
      |SELECT doc_id, n_bigrams, sum_df FROM d
      |ORDER BY CAST(sum_df AS DOUBLE) / n_bigrams, doc_id
      |LIMIT 20""".stripMargin) { (s, dir) =>
    import s.implicits._
    val bg = Tables(s, dir).documentsFanned
      .select($"doc_id",
        explode(graft.functions.TextAnalysis.wordShingles($"text", 2)).as("s"))
    val dfreq = bg.groupBy($"s").agg(count(lit(1)).as("df"))
    bg.join(dfreq, Seq("s"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"df").as("sum_df"))
      .orderBy(($"sum_df".cast("double") / $"n_bigrams").asc, $"doc_id")
      .limit(20)
      .smallOrdered(($"sum_df".cast("double") / $"n_bigrams").asc, $"doc_id")
  }

  /** Per-node triangle participation over the urgent-order co-purchase
    * part graph (the same graph q93 ranks): how embedded each part is in
    * locally dense co-purchase neighbourhoods — the clustering signal
    * component labeling (q44) can't see (components say "connected",
    * triangles say "tightly knit"). Degree-ordered compact-forward scheme;
    * see `GraphOps.triangleCounts` for why orientation bounds the wedge
    * blow-up at scale. The oracle replays the identical orientation with
    * SQL row-value comparisons.
    */
  private val q121 = QueryDef.sql(
    "degree-ordered triangle counts over the co-purchase part graph")(
    """WITH urg AS MATERIALIZED (
      |  SELECT l.l_orderkey, l.l_partkey FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_orderpriority = '1-URGENT'),
      |e AS MATERIALIZED (
      |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      |  FROM urg a JOIN urg b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |deg AS MATERIALIZED (
      |  SELECT node, count(*) AS deg FROM (
      |    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
      |  GROUP BY 1),
      |o AS MATERIALIZED (
      |  SELECT
      |    CASE WHEN (ds.deg, e.src) < (dd.deg, e.dst)
      |         THEN e.src ELSE e.dst END AS u,
      |    CASE WHEN (ds.deg, e.src) < (dd.deg, e.dst)
      |         THEN e.dst ELSE e.src END AS v,
      |    CASE WHEN (ds.deg, e.src) < (dd.deg, e.dst)
      |         THEN dd.deg ELSE ds.deg END AS degv
      |  FROM e JOIN deg ds ON ds.node = e.src
      |         JOIN deg dd ON dd.node = e.dst),
      |wdg AS (
      |  SELECT a.u, a.v, b.v AS w FROM o a JOIN o b
      |  ON a.u = b.u AND (a.degv, a.v) < (b.degv, b.v)),
      |tri AS (
      |  SELECT wdg.u, wdg.v, wdg.w FROM wdg
      |  JOIN o ON o.u = wdg.v AND o.v = wdg.w),
      |nodes AS (
      |  SELECT u AS node FROM tri UNION ALL SELECT v FROM tri
      |  UNION ALL SELECT w FROM tri)
      |SELECT node AS part_id, count(*) AS tri_cnt
      |FROM nodes GROUP BY 1
      |ORDER BY tri_cnt DESC, part_id LIMIT 20""".stripMargin) { (s, dir) =>
    import s.implicits._
    val t = Tables(s, dir)
    // no broadcast hint on the urgent-key side: it is fact-derived (not a
    // bounded dimension), so the right strategy is AQE's size-based call
    val urg = t.lineitem
      .join(t.orders.filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey"), $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_partkey")
    val edges = graft.operators.GraphOps.coOccurrenceEdges(
      urg, "l_orderkey", "l_partkey", distinctPairs = false)
    graft.operators.GraphOps.triangleCounts(edges, edgesDistinct = false)
      .select($"node".as("part_id"), $"tri_cnt")
      .orderBy($"tri_cnt".desc, $"part_id").limit(20)
      .smallOrdered($"tri_cnt".desc, $"part_id")
  }

  /** Directed shingle-containment pairs at τ = 0.8: documents ≥80% of
    * whose 3-gram shingles occur in another document — the subset-dup
    * detector that catches a short doc pasted into a longer one (Jaccard
    * dilutes with the container's size and misses exactly these). See
    * `SetSimilarity.containmentPairs` for the asymmetric prefix filter.
    */
  private val q122 = QueryDef.scalableSql(
    "containment pairs: docs >=80% shingle-contained in another doc")(
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 1))) AS i
      |        FROM tok),
      |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      |       FROM idx),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
      |  GROUP BY 1, 2)
      |SELECT da, db, inter, na.n AS na, nb.n AS nb
      |FROM pairs JOIN sizes na ON pairs.da = na.doc_id
      |           JOIN sizes nb ON pairs.db = nb.doc_id
      |WHERE 10*inter >= 8*na.n
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
      |rp122 AS MATERIALIZED (
      |WITH p AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
      |  FROM rsh a JOIN rsh b ON a.s = b.s AND a.doc_id <> b.doc_id
      |  GROUP BY 1, 2)
      |SELECT p.da, p.db, p.inter, na.n AS na, nb.n AS nb
      |FROM p JOIN rsizes na ON p.da = na.doc_id
      |       JOIN rsizes nb ON p.db = nb.doc_id
      |WHERE 10 * p.inter >= 8 * na.n)
      |SELECT da, db, inter, na, nb FROM (
      |  SELECT ga.doc_id AS da, gb.doc_id AS db, r.inter, r.na, r.nb
      |  FROM rp122 r JOIN grp ga ON ga.rep = r.da JOIN grp gb ON gb.rep = r.db
      |  UNION ALL
      |  SELECT a.doc_id, b.doc_id, sz.n, sz.n, sz.n
      |  FROM grp a JOIN grp b ON a.rep = b.rep AND a.doc_id <> b.doc_id
      |  JOIN rsizes sz ON sz.doc_id = a.rep)
      |ORDER BY da, db""".stripMargin) { (s, dir) =>
    import s.implicits._
    graft.operators.SetSimilarity.containmentPairs(
        Tables(s, dir).documentsFanned, "doc_id", "text", n = 3,
        tauNum = 8, tauDen = 10)
      .smallOrdered($"da", $"db")
  }

  /** Customer survival life-table (Kaplan-Meier input): per 30-day
    * lifetime interval, how many customers are still at risk, how many
    * churn there (90 days of inactivity at corpus end), how many leave
    * the table censored — the churn platform's population-level view, as
    * exact integers (the KM product itself is a driver-side fold over
    * these rows). One shuffle builds per-customer spans; the life table
    * derives from the bounded bucket frame (≤ ~85 rows), where the
    * cumulative at-risk window is free.
    */
  private val q126 = QueryDef.sql(
    "survival life-table: 30-day intervals with at-risk/event/censored counts")(
    """WITH span AS (
      |  SELECT o_custkey AS c, epoch_us(min(o_orderdate)) AS f,
      |         epoch_us(max(o_orderdate)) AS l
      |  FROM orders GROUP BY 1),
      |mx AS (SELECT max(l) AS m FROM span),
      |per AS (
      |  SELECT c, (l - f) // 86400000000 // 30 AS bucket,
      |    CASE WHEN (SELECT m FROM mx) - l > 90 * 86400000000 THEN 1 ELSE 0
      |    END AS churned
      |  FROM span),
      |b AS (SELECT bucket, count(*) AS ending,
      |             sum(churned)::BIGINT AS events
      |      FROM per GROUP BY 1)
      |SELECT CAST(bucket * 30 AS BIGINT) AS interval_start_day,
      |  sum(ending) OVER (ORDER BY bucket DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS at_risk,
      |  events, (ending - events)::BIGINT AS censored
      |FROM b ORDER BY interval_start_day""".stripMargin) { (s, dir) =>
    import s.implicits._
    lifeTable(s, dir).smallOrdered($"interval_start_day")
  }

  /** The unordered life-table frame (interval_start_day, at_risk, events,
    * censored) — shared by q126 (the table itself) and q132 (the
    * Kaplan-Meier product over it).
    */
  private def lifeTable(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    import graft.core.Tables.{epochUs => eus}
    val dayUs = 86400000000L
    val span = Tables(s, dir).orders
      .groupBy($"o_custkey")
      .agg(eus(min($"o_orderdate")).as("f"), eus(max($"o_orderdate")).as("l"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mx = span.agg(max($"l").as("m"))
    val b = span.crossJoin(broadcast(mx))
      .select(expr(s"(l - f) div $dayUs div 30").as("bucket"),
        when($"m" - $"l" > 90L * dayUs, 1L).otherwise(0L).as("churned"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("ending"), sum($"churned").as("events"))
    // single-partition window: the bucket frame is bounded (~lifetime/30
    // rows), so the unpartitioned cumulative sum is a non-issue
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"bucket".desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    b.select(($"bucket" * 30L).as("interval_start_day"),
        sum($"ending").over(w).as("at_risk"), $"events",
        ($"ending" - $"events").as("censored"))
  }

  /** Kaplan-Meier survival curve over the q126 life table, EXACT: the
    * product Π (1 − dᵢ/nᵢ) as a scaled-integer recurrence
    * sᵢ = ⌊sᵢ₋₁ · (nᵢ − dᵢ) / nᵢ⌋ from s₀ = 10¹², computed in arbitrary
    * precision (BigInt / HUGEINT) so the floored BIGINT output is
    * bit-identical across engines at ANY population size — the same
    * fixed-point regime as PageRank (q93). The recurrence is inherently
    * sequential over the ~lifetime/30 interval rows, so after the
    * distributed life-table aggregation the fold runs on the driver over
    * a frame bounded by construction (the same bounded-collect class as
    * the 2×2 confusion matrix); the oracle replays it with a recursive
    * CTE.
    */
  private val q132 = QueryDef.sql(
    "Kaplan-Meier survival product over the life table, exact fixed-point")(
    """WITH RECURSIVE span AS (
      |  SELECT o_custkey AS c, epoch_us(min(o_orderdate)) AS f,
      |         epoch_us(max(o_orderdate)) AS l
      |  FROM orders GROUP BY 1),
      |mx AS (SELECT max(l) AS m FROM span),
      |per AS (
      |  SELECT c, (l - f) // 86400000000 // 30 AS bucket,
      |    CASE WHEN (SELECT m FROM mx) - l > 90 * 86400000000 THEN 1 ELSE 0
      |    END AS churned
      |  FROM span),
      |b AS (SELECT bucket, count(*) AS ending,
      |             sum(churned)::BIGINT AS events
      |      FROM per GROUP BY 1),
      |lt AS (
      |  SELECT CAST(bucket * 30 AS BIGINT) AS interval_start_day,
      |    sum(ending) OVER (ORDER BY bucket DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS at_risk,
      |    events,
      |    row_number() OVER (ORDER BY bucket) AS rn
      |  FROM b),
      |km AS (
      |  SELECT rn, interval_start_day, at_risk, events,
      |    (1000000000000::HUGEINT * (at_risk - events)::HUGEINT)
      |      // at_risk::HUGEINT AS s
      |  FROM lt WHERE rn = 1
      |  UNION ALL
      |  SELECT lt.rn, lt.interval_start_day, lt.at_risk, lt.events,
      |    (km.s * (lt.at_risk - lt.events)::HUGEINT) // lt.at_risk::HUGEINT
      |  FROM km JOIN lt ON lt.rn = km.rn + 1)
      |SELECT interval_start_day, at_risk, events,
      |  CAST(s AS BIGINT) AS survival_fp
      |FROM km ORDER BY interval_start_day""".stripMargin) { (s, dir) =>
    import s.implicits._
    // bounded by construction: one row per 30-day lifetime interval
    val rows = lifeTable(s, dir)
      .select($"interval_start_day", $"at_risk", $"events")
      .orderBy($"interval_start_day").collect()
    var surv = BigInt(1000000000000L)
    val folded = rows.map { r =>
      val (isd, n, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
      surv = surv * BigInt(n - d) / BigInt(n)
      (isd, n, d, surv.toLong)
    }.toSeq
    folded.toDF("interval_start_day", "at_risk", "events", "survival_fp")
      .smallOrdered($"interval_start_day")
  }

  /** Join cardinality from key histograms — the 100 TB planning operator:
    * |events ⋈ orders| per key bucket computed WITHOUT executing the
    * fact-fact join, as Σ over shared keys of count_events(k) ×
    * count_orders(k), from two small aggregate frames. The oracle runs
    * the REAL join and groups its output — cross-engine equality is the
    * proof that the histogram estimate is exact, and the plan audit
    * proves no fact-fact join exists in the Spark plan.
    */
  private val q127 = QueryDef.sql(
    "join cardinality from key-count histograms, never executing the join")(
    """SELECT user_id % 10 AS bucket, count(*) AS pairs,
      |  count(DISTINCT user_id) AS keys
      |FROM events e JOIN orders o ON e.user_id = o.o_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val t = Tables(s, dir)
    val ec = t.events.groupBy($"user_id".as("k")).agg(count(lit(1)).as("ec"))
    val oc = t.orders.groupBy($"o_custkey".as("k")).agg(count(lit(1)).as("oc"))
    ec.join(oc, "k")
      .groupBy(($"k" % 10L).as("bucket"))
      .agg(sum($"ec" * $"oc").as("pairs"), count(lit(1)).as("keys"))
      .smallOrdered($"bucket")
  }

  /** Per-label embedding dispersion by the one-pass moment identity:
    * Σᵢⱼ‖xᵢ−xⱼ‖² = 2·(n·Σ‖x‖² − ‖Σx‖²) — the pairwise-distance statistic
    * with NO pairwise join, in exact scaled-long arithmetic (components
    * quantized to thousandths; every sum fits a long to ~1e9 rows/label
    * at unit-norm scale, past which the sums widen to decimals). Emits
    * the exact (dispersion_num, dispersion_den) rational per label — the
    * cluster-compactness audit for embedding spaces at corpus scale.
    */
  private val q128 = QueryDef.sql(
    "embedding dispersion per label: exact one-pass moment identity")(
    """WITH idx AS (
      |  SELECT label, vec_id, embedding AS e,
      |         unnest(range(1, len(embedding) + 1)) AS d
      |  FROM embeddings),
      |m AS (SELECT label, d,
      |        CAST(floor(CAST(e[d] AS DOUBLE) * 1000) AS BIGINT) AS q
      |      FROM idx),
      |a AS (SELECT label, d, sum(q)::BIGINT AS sd, sum(q*q)::BIGINT AS s2d
      |      FROM m GROUP BY 1, 2),
      |c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1)
      |SELECT a.label, c.n, sum(a.s2d)::BIGINT AS s2,
      |  sum(a.sd * a.sd)::BIGINT AS ss,
      |  (c.n * sum(a.s2d) - sum(a.sd * a.sd))::BIGINT AS dispersion_num,
      |  (c.n * c.n)::BIGINT AS dispersion_den
      |FROM a JOIN c ON a.label = c.label
      |GROUP BY a.label, c.n ORDER BY a.label""".stripMargin) { (s, dir) =>
    import s.implicits._
    val emb = Tables(s, dir).embeddingsFanned
    val melted = emb.select($"label", posexplode(
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
      .as(Seq("d", "q")))
    val a = melted.groupBy($"label", $"d")
      .agg(sum($"q").as("sd"), sum($"q" * $"q").as("s2d"))
    val c = emb.groupBy($"label").agg(count(lit(1)).as("n"))
    a.groupBy($"label")
      .agg(sum($"s2d").as("s2"), sum($"sd" * $"sd").as("ss"))
      .join(broadcast(c), "label")
      .select($"label", $"n", $"s2", $"ss",
        ($"n" * $"s2" - $"ss").as("dispersion_num"),
        ($"n" * $"n").as("dispersion_den"))
      .smallOrdered($"label")
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q119_oof_target_encoding" -> q119,
    "q120_decile_binning" -> q120,
    "q121_triangle_counts" -> q121,
    "q122_containment_pairs" -> q122,
    "q123_hashed_linear_score" -> q123,
    "q124_split_leakage" -> q124,
    "q125_bigram_surprisal" -> q125,
    "q126_survival_lifetable" -> q126,
    "q127_join_cardinality" -> q127,
    "q128_embedding_dispersion" -> q128,
    "q132_kaplan_meier" -> q132
  )
}
