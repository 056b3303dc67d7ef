package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{Redaction, TextAnalysis}
import graft.operators.{Bm25, ConnectedComponents, Dedup, ParallelRank, SubstringDedup, Winnowing}

/** Corpus-curation operator surface (round 5): near-dup CLUSTERING (the
  * step after pair generation), Gopher-style repetition quality filters,
  * BM25 retrieval, PII scrubbing, corpus n-gram statistics and the
  * deterministic global shuffle that materializes a training order.
  *
  * Scale notes: every per-row feature is a codegen'd kernel over one scan;
  * the cluster step shuffles only (long, long) labels; BM25's corpus stats
  * are a single broadcast row; the global shuffle is a range exchange
  * (ParallelRank), never a single-task sort.
  */
object Curation {

  /** Shared oracle CTE chain, SEMANTIC (transparent) form: exact near-dup
    * pairs at j >= 0.9 (q20 semantics) transitively closed into components
    * by a recursive CTE over the all-pairs shingle self-join. Ends with
    * `comp(id, component)`; q44/q61 select from it, q141/q174's delivery
    * chain (Delivery.scala) builds on it. This form is O(multiplicity²) in
    * the pair step and O(|component|²) in the closure, so at sf>=1 (10+
    * exact copies per doc by construction) a single-node replay collapses —
    * it is kept as the semantic DEFINITION, machine-checked frame-equal to
    * the committed scalable form below (OracleEquivalenceSpec, sf0.01).
    */
  private[queries] val clusterCtesSemantic =
    """WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 1))) AS i FROM tok),
      |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |p0 AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |nd AS (
      |  SELECT da, db FROM p0 JOIN sizes na ON p0.da = na.doc_id
      |                        JOIN sizes nb ON p0.db = nb.doc_id
      |  WHERE inter::DOUBLE / (na.n + nb.n - inter) >= 0.9),
      |edges AS (SELECT da AS src, db AS dst FROM nd
      |          UNION SELECT db AS src, da AS dst FROM nd),
      |reach(id, r) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.src, w.r FROM edges e JOIN reach w ON e.dst = w.id),
      |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY 1)""".stripMargin

  /** Shared oracle CTE chain, COMMITTED (scalable) form — round 14,
    * VERDICT r13 #1. Same contract as the semantic form (`tok/idx/sh`
    * defined, ends with `comp(id, component)`), rewritten by exact-
    * duplicate contraction: docs with identical text and >=3 tokens have
    * identical non-empty 3-shingle sets, so every identical-text group is
    * a CLIQUE in the near-dup graph (J = 1.0 >= 0.9) and contracting each
    * group to its min-id representative preserves components AND min-id
    * labels exactly (theorem machine-checked by ContractionSpec; SQL-level
    * proof at four SFs in bench_artifacts/r13/oracle_equiv.md, re-proven
    * for this single-statement form in bench_artifacts/r14/). Each stage
    * is `AS MATERIALIZED` so DuckDB 1.0 evaluates it once — the plain-CTE
    * form re-evaluates every reference, which is what made the staged
    * temp-table patch step necessary before promotion. Work is
    * O(distinct-texts²) only in the banded candidate step and linear in
    * the corpus everywhere else.
    */
  private[queries] val clusterCtes =
    """WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 1))) AS i FROM tok),
      |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
      |grp AS MATERIALIZED (
      |  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep,
      |    count(*) OVER (PARTITION BY text) AS gsize,
      |    len(string_split(text, ' ')) AS ntok
      |  FROM documents),
      |rsh AS MATERIALIZED (
      |  SELECT sh.doc_id, sh.s FROM sh JOIN grp g ON sh.doc_id = g.doc_id
      |  WHERE g.doc_id = g.rep),
      |rsizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM rsh GROUP BY 1),
      |rp0 AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
      |  FROM rsh a JOIN rsh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |rnd AS (
      |  SELECT da, db FROM rp0 JOIN rsizes na ON rp0.da = na.doc_id
      |                         JOIN rsizes nb ON rp0.db = nb.doc_id
      |  WHERE inter::DOUBLE / (na.n + nb.n - inter) >= 0.9),
      |redges AS MATERIALIZED (SELECT da AS src, db AS dst FROM rnd
      |  UNION SELECT db AS src, da AS dst FROM rnd),
      |reach(id, r) AS (
      |  SELECT src, src FROM redges
      |  UNION
      |  SELECT e.src, w.r FROM redges e JOIN reach w ON e.dst = w.id),
      |rcomp AS MATERIALIZED (SELECT id, min(r) AS component FROM reach GROUP BY 1),
      |comp AS MATERIALIZED (
      |  SELECT g.doc_id AS id, coalesce(rc.component, g.rep) AS component
      |  FROM grp g LEFT JOIN rcomp rc ON g.rep = rc.id
      |  WHERE rc.id IS NOT NULL OR (g.gsize >= 2 AND g.ntok >= 3))""".stripMargin

  /** Near-dup cluster assignment: MinHash-LSH pairs (q20 semantics,
    * exact-verified at j >= 0.9) grouped into connected components;
    * component = min doc_id, plus cluster size. The oracle replays the
    * exact pair pipeline and closes it transitively with a recursive CTE.
    */
  private val q44Tail =
    """SELECT id AS doc_id, component,
      |  count(*) OVER (PARTITION BY component) AS csize
      |FROM comp ORDER BY doc_id""".stripMargin

  private val q44 = QueryDef.scalableSql(
    "near-dup clusters: connected components over LSH pairs (j >= 0.9)")(
    s"$clusterCtesSemantic\n$q44Tail")(
    s"$clusterCtes\n$q44Tail") { (s, dir) =>
    import s.implicits._
    // contraction path (round 14, sf100 probe): components over VERIFIED
    // rep pairs + one member-attach join — never a member-pair edge list
    // (O(multiplicity²) rows per CC label round, ~3e9 at sf100)
    val comp = Dedup.nearDupComponents(Tables(s, dir).documentsFanned,
      "doc_id", "text", n = 3, minJaccard = 0.9)
    val sizes = comp.groupBy($"component").agg(count(lit(1)).as("csize"))
    comp.join(sizes, "component")
      .select($"id".as("doc_id"), $"component", $"csize")
      .cachedOrdered($"doc_id")
  }

  /** Gopher-style repetition quality filters: distinct-word share, share of
    * the top word, duplicate-bigram share, and the resulting keep/drop flag.
    */
  private val q45 = QueryDef.sql(
    "repetition quality filters (distinct-word/top-word/dup-bigram shares)")(
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |b2 AS (SELECT doc_id, count(DISTINCT t[i] || ' ' || t[i+1]) AS nb2
      |  FROM (SELECT doc_id, t, unnest(range(1, greatest(len(t), 1))) AS i FROM tok)
      |  GROUP BY doc_id),
      |f AS (SELECT tok.doc_id, len(t) AS n_tokens,
      |    len(list_distinct(t)) AS nd,
      |    list_max(list_transform(list_distinct(t),
      |      x -> len(list_filter(t, y -> y = x)))) AS maxf,
      |    coalesce(nb2, 0) AS nb2
      |  FROM tok LEFT JOIN b2 ON tok.doc_id = b2.doc_id),
      |r AS (SELECT doc_id, n_tokens,
      |    nd::DOUBLE / n_tokens AS distinct_ratio,
      |    maxf::DOUBLE / n_tokens AS top_word_ratio,
      |    CASE WHEN n_tokens - 1 <= 1 THEN 0.0
      |         ELSE 1.0 - nb2::DOUBLE / (n_tokens - 1)::DOUBLE END AS dup_bigram_frac
      |  FROM f)
      |SELECT doc_id, n_tokens, distinct_ratio, top_word_ratio, dup_bigram_frac,
      |  CASE WHEN top_word_ratio > 0.08 OR dup_bigram_frac > 0.6
      |       THEN 1 ELSE 0 END AS is_repetitive
      |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables(s, dir).documentsFanned.select(
        $"doc_id",
        TextAnalysis.tokenCount($"text").cast("long").as("n_tokens"),
        TextAnalysis.distinctWordRatio($"text").as("distinct_ratio"),
        TextAnalysis.topWordRatio($"text").as("top_word_ratio"),
        TextAnalysis.dupBigramFraction($"text").as("dup_bigram_frac"))
      .withColumn("is_repetitive",
        ($"top_word_ratio" > 0.08 || $"dup_bigram_frac" > 0.6).cast("int"))
      .cachedOrdered($"doc_id")
  }

  /** Query terms for the BM25 gate query (corpus vocabulary words). */
  private val Bm25Terms = Seq("spark", "vector")

  /** BM25 top-20 retrieval. Rational idf (see Bm25) keeps every op IEEE
    * +,*,/ so the score doubles are bit-identical to the SQL replay.
    */
  private val q46 = QueryDef.sql(
    "BM25 top-20 keyword retrieval (rational idf, one-scan tf kernels)")(
    """WITH f AS (SELECT doc_id, len(string_split(text, ' ')) AS dl,
      |    len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS tf0,
      |    len(list_filter(string_split(text, ' '), x -> x = 'vector')) AS tf1
      |  FROM documents),
      |st AS (SELECT count(*) AS n, sum(dl)::BIGINT AS sumdl,
      |    count(*) FILTER (WHERE tf0 > 0) AS df0,
      |    count(*) FILTER (WHERE tf1 > 0) AS df1
      |  FROM f),
      |sc AS (SELECT doc_id, dl,
      |    (n - df0 + 0.5::DOUBLE) / (df0 + 0.5::DOUBLE)
      |      * (tf0 * (1.2::DOUBLE + 1.0::DOUBLE)) /
      |      (tf0 + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
      |        + 0.75::DOUBLE * (dl::DOUBLE / (sumdl::DOUBLE / n))))
      |  + (n - df1 + 0.5::DOUBLE) / (df1 + 0.5::DOUBLE)
      |      * (tf1 * (1.2::DOUBLE + 1.0::DOUBLE)) /
      |      (tf1 + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
      |        + 0.75::DOUBLE * (dl::DOUBLE / (sumdl::DOUBLE / n))))
      |    AS score
      |  FROM f, st)
      |SELECT doc_id, dl, score FROM sc
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
    Bm25.topK(Tables(s, dir).documents, "doc_id", "text", Bm25Terms, k = 20)
  }

  /** PII scrubbing over the event stream's JSON props: digit runs redacted
    * to <NUM>, per-event-type redaction accounting.
    */
  private val q47 = QueryDef.sql(
    "PII scrub: digit-run redaction over event props, per-type accounting")(
    """SELECT event_type, count(*) AS n_events,
      |  sum(len(regexp_extract_all(props, '[0-9]+')))::BIGINT AS total_redactions,
      |  count(DISTINCT regexp_replace(props, '[0-9]+', '<NUM>', 'g')) AS distinct_redacted
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables(s, dir).events
      .select($"event_type", $"props",
        Redaction.redactionCount($"props",
          Seq(Redaction.NumberPattern -> "<NUM>")).as("nred"),
        Redaction.scrub($"props", Seq(Redaction.NumberPattern -> "<NUM>")).as("red"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"nred").as("total_redactions"),
        countDistinct($"red").as("distinct_redacted"))
      .smallOrdered($"event_type")
  }

  /** Corpus-wide bigram document frequencies, top 20. The shingle kernel is
    * distinct-per-doc, so the count is df; partial aggregation collapses
    * each map task to its local bigram counts before the one shuffle.
    */
  private val q48 = QueryDef.sql(
    "corpus top-20 bigrams by document frequency")(
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t), 1))) AS i FROM tok),
      |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] AS s FROM idx)
      |SELECT s AS bigram, count(*) AS df FROM sh
      |GROUP BY 1 ORDER BY df DESC, bigram LIMIT 20""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables(s, dir).documentsFanned
      .select(explode(TextAnalysis.wordShingles($"text", 2)).as("bigram"))
      .groupBy($"bigram").agg(count(lit(1)).as("df"))
      .orderBy($"df".desc, $"bigram")
      .limit(20)
  }

  /** Deterministic global training shuffle: every document ranked by its
    * content-independent md5 key (seedless, replayable) and dealt into 8
    * shards — the materialize-a-training-order step. The rank is a range
    * exchange + local row_number (ParallelRank), never one sorting task.
    */
  private val q49 = QueryDef.sql(
    "deterministic global shuffle: md5-order rank + 8-way shard assignment")(
    """SELECT doc_id, skey, rn AS shuffle_rank, (rn - 1) % 8 AS shard FROM (
      |  SELECT doc_id, md5(doc_id::VARCHAR) AS skey,
      |    row_number() OVER (ORDER BY md5(doc_id::VARCHAR)) AS rn
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val keyed = Tables(s, dir).documents
      .select($"doc_id", md5($"doc_id".cast("string").cast("binary")).as("skey"))
    ParallelRank.rowNumber(keyed, Seq.empty, "skey", "rn",
      smallGroupsHint = true)
      .select($"doc_id", $"skey", $"rn".cast("long").as("shuffle_rank"),
        (($"rn" - 1) % 8).cast("long").as("shard"))
      .cachedOrdered($"doc_id")
  }

  /** Stopword IN-list shared verbatim with the oracle (q16 convention). */
  private[queries] val stopList =
    TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")

  /** Per-source quality quota (the per-domain cap of corpus curation):
    * keep the 10 highest-quality documents per source, ties to the lowest
    * doc_id. Quality is the q16 composite score — bit-replayed by the
    * oracle like q16 does.
    */
  private val q52 = QueryDef.sql(
    "per-source quality quota: top-10 docs per source by composite quality")(
    s"""WITH tok AS (SELECT doc_id, source, text, string_split(text, ' ') AS t
       |  FROM documents),
       |f AS (SELECT doc_id, source,
       |  len(list_filter(t, x -> x IN ($stopList)))::DOUBLE / len(t) AS stop_ratio,
       |  (length(text) - len(t) + 1)::DOUBLE / len(t) AS mean_tok_len,
       |  len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE / length(text) AS punct_ratio
       |FROM tok),
       |q AS (SELECT doc_id, source,
       |  (1.0::DOUBLE - least(1.0::DOUBLE, abs(stop_ratio - 0.35::DOUBLE) / 0.35::DOUBLE)) * 0.4::DOUBLE
       |    + (1.0::DOUBLE - least(1.0::DOUBLE, abs(mean_tok_len - 5.0::DOUBLE) / 5.0::DOUBLE)) * 0.3::DOUBLE
       |    + (1.0::DOUBLE - least(1.0::DOUBLE, punct_ratio / 0.3::DOUBLE)) * 0.3::DOUBLE AS quality
       |FROM f),
       |r AS (SELECT doc_id, source, quality,
       |  row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rk
       |FROM q)
       |SELECT source, doc_id, quality FROM r WHERE rk <= 10
       |ORDER BY source, doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val scored = Tables(s, dir).documentsFanned.select(
      $"doc_id", $"source",
      TextAnalysis.qualityScore($"text").as("quality"))
    graft.operators.Sampling.qualityQuota(scored, Seq("source"),
        "quality", "doc_id", quota = 10)
      .select($"source", $"doc_id", $"quality")
      .smallOrdered($"source", $"doc_id")
  }

  /** Morton (Z-order) clustering-key histogram over lineitem's
    * (l_partkey, l_suppkey): the multi-dimensional layout key
    * (operators.Layout.zOrderKey) bucketed at 2^20 key granularity — the
    * file-assignment view a z-ordered write produces. Both key columns are
    * first quantized into 2^16 buckets over their actual domain
    * (Layout.quantize over a broadcast max row) — at SF >= 1 the raw keys
    * exceed 2^16 and bare masking would alias their high bits. Pure
    * integer math end to end, replayed bit-exactly by the oracle.
    */
  private val q53 = QueryDef.sql(
    "z-order (Morton) key histogram: lineitem clustered on partkey x suppkey")(
    """WITH mx AS (SELECT max(l_partkey) AS pmax, max(l_suppkey) AS smax
      |  FROM lineitem),
      |q AS (SELECT (l_partkey * 65536) // (pmax + 1) AS qp,
      |             (l_suppkey * 65536) // (smax + 1) AS qs
      |      FROM lineitem, mx),
      |z AS (SELECT cast(list_sum(list_transform(range(0, 16), b ->
      |    (((qp >> b) & 1) << (2*b)) + (((qs >> b) & 1) << (2*b+1))
      |  )) AS BIGINT) AS zkey FROM q)
      |SELECT zkey // 1048576 AS zbucket, count(*) AS n,
      |  min(zkey) AS zmin, max(zkey) AS zmax
      |FROM z GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.operators.Layout
    val li = Tables(s, dir).lineitem
    val mx = li.agg(max($"l_partkey").as("pmax"), max($"l_suppkey").as("smax"))
    li.crossJoin(broadcast(mx))
      .select(Layout.zOrderKey(
          Layout.quantize($"l_partkey", $"pmax", bits = 16),
          Layout.quantize($"l_suppkey", $"smax", bits = 16),
          bits = 16).as("zkey"))
      .select(expr("zkey div 1048576").as("zbucket"), $"zkey")
      .groupBy($"zbucket")
      .agg(count(lit(1)).as("n"), min($"zkey").as("zmin"), max($"zkey").as("zmax"))
      .smallOrdered($"zbucket")
  }

  /** Corpus token heavy hitters via the mergeable Space-Saving sketch
    * (org.apache.spark.sql.graft.SpaceSavingAgg): per-partition bounded
    * summaries merge instead of shuffling the distinct-token frame — the
    * 100 TB path for corpus token stats. Gated in the EXACT regime
    * (capacity >= corpus vocabulary, so nothing evicts and every count is
    * exact — same portable-exactness pattern as the q43 IVF probe); the
    * eviction/error-bound behavior is property-tested in HeavyHittersSpec.
    */
  private val q56 = QueryDef.sql(
    "corpus token heavy hitters via mergeable Space-Saving sketch (exact regime)")(
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      |SELECT t AS token, count(*) AS cnt FROM tok
      |GROUP BY 1 ORDER BY cnt DESC, token LIMIT 20""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.graft.{Bridge, SpaceSavingAgg}
    val tok = Tables(s, dir).documentsFanned
      .select(explode(TextAnalysis.tokens($"text")).as("t"))
    val sketch = Bridge.column(
      SpaceSavingAgg(Bridge.expression(col("t")), capacity = 4096)
        .toAggregateExpression())
    tok.agg(sketch.as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item".as("token"), $"e.cnt".as("cnt"))
      .orderBy($"cnt".desc, $"token")
      .limit(20)
  }

  /** Document chunking: overlapping 32-token windows every 24 tokens —
    * the chunker that feeds token-budget sequence packing
    * (operators.SequencePacking). Output is one slim row per chunk
    * (index, token count, content fingerprint); the oracle rebuilds every
    * window with list_slice over the token array.
    */
  private val q58 = QueryDef.sql(
    "document chunking: 32-token windows, stride 24, per-chunk fingerprints")(
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |idx AS (SELECT doc_id, t,
      |    unnest(range(0, greatest((len(t) + 23) // 24, 1))) AS ci
      |  FROM tok),
      |ch AS (SELECT doc_id, ci,
      |    array_to_string(list_slice(t, ci*24 + 1, least(ci*24 + 32, len(t))), ' ') AS c
      |  FROM idx WHERE ci*24 < len(t))
      |SELECT doc_id, ci AS chunk_idx,
      |  len(string_split(c, ' ')) AS chunk_tokens, md5(c) AS fp
      |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables(s, dir).documentsFanned
      .select($"doc_id",
        posexplode(TextAnalysis.wordChunks($"text", size = 32, stride = 24))
          .as(Seq("chunk_idx", "c")))
      .select($"doc_id", $"chunk_idx".cast("long").as("chunk_idx"),
        TextAnalysis.tokenCount($"c").cast("long").as("chunk_tokens"),
        TextAnalysis.fingerprint($"c").as("fp"))
      .cachedOrdered($"doc_id", $"chunk_idx")
  }

  /** Declarative data-quality audit over lineitem (operators.Constraints):
    * non-null / range / set-membership checks AND the exact key-uniqueness
    * check fused into ONE aggregate pass (one scan, one job — the
    * count_distinct rides Catalyst's single-distinct-group rewrite) — the
    * data-level sibling of the engine's schema validation, run before a
    * corpus ships to training. Integer counts only, so the oracle is exact.
    */
  private val q59 = QueryDef.sql(
    "data-quality constraint audit over lineitem (one-pass + uniqueness)")(
    """SELECT 'between(l_discount,0.0,0.1)' AS check_name,
      |  sum(CASE WHEN NOT coalesce(l_discount >= 0.0::DOUBLE
      |    AND l_discount <= 0.1::DOUBLE, false) THEN 1 ELSE 0 END)::BIGINT AS violations,
      |  count(*) AS n_rows,
      |  CASE WHEN sum(CASE WHEN NOT coalesce(l_discount >= 0.0::DOUBLE
      |    AND l_discount <= 0.1::DOUBLE, false) THEN 1 ELSE 0 END) = 0
      |    THEN 1 ELSE 0 END AS pass
      |FROM lineitem
      |UNION ALL
      |SELECT 'between(l_quantity,1.0,50.0)',
      |  sum(CASE WHEN NOT coalesce(l_quantity >= 1.0::DOUBLE
      |    AND l_quantity <= 50.0::DOUBLE, false) THEN 1 ELSE 0 END)::BIGINT,
      |  count(*),
      |  CASE WHEN sum(CASE WHEN NOT coalesce(l_quantity >= 1.0::DOUBLE
      |    AND l_quantity <= 50.0::DOUBLE, false) THEN 1 ELSE 0 END) = 0
      |    THEN 1 ELSE 0 END
      |FROM lineitem
      |UNION ALL
      |SELECT 'in_set(l_returnflag)',
      |  sum(CASE WHEN NOT coalesce(l_returnflag IN ('A', 'N', 'R'), false)
      |    THEN 1 ELSE 0 END)::BIGINT,
      |  count(*),
      |  CASE WHEN sum(CASE WHEN NOT coalesce(l_returnflag IN ('A', 'N', 'R'),
      |    false) THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END
      |FROM lineitem
      |UNION ALL
      |SELECT 'not_null(l_orderkey)',
      |  sum(CASE WHEN NOT coalesce(l_orderkey IS NOT NULL, false)
      |    THEN 1 ELSE 0 END)::BIGINT,
      |  count(*),
      |  CASE WHEN sum(CASE WHEN NOT coalesce(l_orderkey IS NOT NULL, false)
      |    THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END
      |FROM lineitem
      |UNION ALL
      |SELECT 'unique(l_orderkey,l_linenumber)',
      |  (count(*) - count(DISTINCT (l_orderkey, l_linenumber)))::BIGINT,
      |  count(*),
      |  CASE WHEN count(*) = count(DISTINCT (l_orderkey, l_linenumber))
      |    THEN 1 ELSE 0 END
      |FROM lineitem
      |ORDER BY check_name""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.operators.Constraints
    val li = Tables(s, dir).lineitem
    // uniqueness is FUSED into the same aggregate (one scan, one job) —
    // the earlier two-scan union measured ~2x the runtime of the audit
    // pass alone at sf0.1
    Constraints.audit(li, Seq(
        Constraints.notNull("l_orderkey"),
        Constraints.between("l_quantity", 1.0, 50.0),
        Constraints.between("l_discount", 0.0, 0.1),
        Constraints.isIn("l_returnflag", Seq("A", "N", "R"))),
      uniqueKeys = Seq(Seq("l_orderkey", "l_linenumber")))
      .smallOrdered($"check_name")
  }

  /** The cluster-level deduped corpus: every document except non-minimum
    * members of a near-dup cluster (the end-to-end result q18's exact
    * dedup, q44's clusters and this anti-join compose into). At scale the
    * anti-join carries only the (long) non-survivor ids — never text.
    */
  private val q61Tail =
    """SELECT d.doc_id, d.source FROM documents d
      |LEFT JOIN comp c ON d.doc_id = c.id AND c.id <> c.component
      |WHERE c.id IS NULL ORDER BY d.doc_id""".stripMargin

  private val q61 = QueryDef.scalableSql(
    "cluster-level dedup survivors: corpus minus non-min near-dup members")(
    s"$clusterCtesSemantic\n$q61Tail")(
    s"$clusterCtes\n$q61Tail") { (s, dir) =>
    import s.implicits._
    val docs = Tables(s, dir).documents
    // contraction path (round 14): non-survivors from the rep graph, no
    // member-pair edge list — see nearDupComponents
    docs.join(Dedup.nearDupNonSurvivors(Tables(s, dir).documentsFanned,
          "doc_id", "text", n = 3, minJaccard = 0.9)
        .withColumnRenamed("id", "doc_id"),
      Seq("doc_id"), "left_anti")
      .select($"doc_id", $"source")
      .cachedOrdered($"doc_id")
  }

  /** Exact top-5 character trigrams via sketch-then-verify — the EVICTION
    * regime gate for the Space-Saving aggregate (q56 gates the exact
    * regime): the corpus has 377 distinct trigrams, the sketch capacity is
    * 256, so every partition's summary genuinely evicts; a second scan
    * recounts the ≤256 tracked candidates exactly and certifies the top-5
    * against the sketch's untracked-item bound (SketchExact.topK). The
    * output is exact — hash-gateable and partition-invariant — but only
    * reachable if the eviction + merge rules preserved the Space-Saving
    * guarantee: a broken bound drops a true heavy hitter from the
    * candidate set and the gate goes red. Char trigrams (not tokens) are
    * the item stream because the synthetic token distribution is flat
    * (vocab 31, near-uniform) while letter frequencies are naturally
    * Zipf-ish: the top-5 trigrams carry ~1.2-1.8% of the stream each vs a
    * worst-case untracked bound of N/256 ≈ 0.4%.
    */
  private val q62 = QueryDef.sql(
    "exact top-5 char trigrams: Space-Saving candidates + exact recount (eviction regime)")(
    """WITH g AS (SELECT substr(text, i, 3) AS item
      |  FROM documents, unnest(range(1, greatest(length(text)-1, 2))) AS r(i))
      |SELECT item, count(*) AS cnt FROM g
      |GROUP BY 1 ORDER BY cnt DESC, item LIMIT 5""".stripMargin) { (s, dir) =>
    import s.implicits._
    val tris = Tables(s, dir).documentsFanned.select(
      explode(expr(
        "transform(sequence(1, greatest(length(text)-2, 1)), i -> substring(text, i, 3))"))
        .as("item"))
    graft.operators.SketchExact.topK(tris, "item", k = 5, capacity = 256)
  }

  /** BPE merge-candidate scan (the first step of byte-pair-encoding
    * vocabulary training, Sennrich et al. 2016): the corpus's most frequent
    * adjacent character pairs within tokens. The native per-document
    * kernel pre-aggregates pair counts (combiner form — the explode emits
    * distinct pairs per doc, bounded by alphabet², never one row per
    * character), the global sum map-side-combines, and the top-30 fuses to
    * TakeOrderedAndProject.
    */
  private val q104 = QueryDef.sql(
    "BPE merge candidates: top adjacent char pairs across the corpus")(
    """WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |p AS (
      |  SELECT w[i:i+1] AS pair
      |  FROM (SELECT w, unnest(range(1, len(w))) AS i FROM w)
      |  WHERE len(w) >= 2)
      |SELECT pair, count(*) AS cnt FROM p GROUP BY pair
      |ORDER BY cnt DESC, pair LIMIT 30""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables(s, dir).documentsFanned
      .select(explode(TextAnalysis.charPairCounts($"text")).as("pc"))
      .groupBy($"pc.p".as("pair"))
      .agg(sum($"pc.c").as("cnt"))
      .orderBy($"cnt".desc, $"pair").limit(30)
      .smallOrdered($"cnt".desc, $"pair")
  }

  /** Vocabulary OOV audit (tokenizer-coverage gate for incoming data): a
    * reference vocabulary — the top-16 tokens by document frequency over
    * the "training half" of the corpus (sources src0–src9, ties broken by
    * token) — is broadcast against the other half, reporting per-source
    * total and out-of-vocabulary token counts (duplicates counted: OOV
    * RATE is what a tokenizer sees). The corpus side never shuffles: the
    * bounded vocab broadcasts into an anti-join probe at the scan. The
    * vocab cap sits BELOW the corpus' distinct-token count (31) so the
    * gate certifies a real OOV split, not an everything-in-vocab
    * degenerate; a production run would pass the tokenizer's actual vocab
    * size here.
    */
  private val q107 = QueryDef.sql(
    "vocabulary OOV audit: per-source out-of-vocab token counts")(
    """WITH vocab AS (
      |  SELECT t FROM (
      |    SELECT t, count(*) AS df FROM (
      |      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS t
      |      FROM documents
      |      WHERE CAST(regexp_extract(source, '[0-9]+') AS INTEGER) < 10)
      |    GROUP BY t)
      |  ORDER BY df DESC, t LIMIT 16),
      |toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
      |  WHERE CAST(regexp_extract(source, '[0-9]+') AS INTEGER) >= 10)
      |SELECT source, count(*) AS total_tokens,
      |  sum(CASE WHEN t NOT IN (SELECT t FROM vocab) THEN 1 ELSE 0 END)::BIGINT
      |    AS oov_tokens
      |FROM toks GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables(s, dir).documentsFanned
      .withColumn("srcnum", regexp_extract($"source", "[0-9]+", 0).cast("int"))
    val vocab = docs.filter($"srcnum" < 10)
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .distinct()
      .groupBy($"t").agg(count(lit(1)).as("df"))
      .orderBy($"df".desc, $"t").limit(16)
      .select($"t")
    docs.filter($"srcnum" >= 10)
      .select($"source", explode(split($"text", " ")).as("t"))
      .join(broadcast(vocab.withColumn("__v", lit(1))), Seq("t"), "left")
      .groupBy($"source")
      .agg(count(lit(1)).as("total_tokens"),
        sum(when($"__v".isNull, 1L).otherwise(0L)).as("oov_tokens"))
      .smallOrdered($"source")
  }

  /** Winnowing fingerprint copy-suspect pairs (Schleimer et al. 2003, the
    * MOSS primitive): word-3-gram hashes, window-of-8 minima, pairs sharing
    * >= 3 fingerprints. LOCAL duplication — a single lifted passage of
    * >= w+n-1 tokens guarantees a shared fingerprint even between globally
    * dissimilar documents, the case MinHash (q20) is blind to. Fingerprints
    * shared by > 50 docs are boilerplate and cut before the pair walk (the
    * oracle replays the cut). See `operators.Winnowing` for the scale
    * shape: one scan-projection, one (long,long) exchange by fingerprint,
    * one by pair.
    */
  private val q108 = QueryDef.scalableSql(
    "winnowing fingerprint copy-suspect pairs (>= 3 shared window minima)")(
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |gr AS (SELECT doc_id, list_transform(range(1, greatest(len(t) - 2, 1) + 1),
      |         i -> array_to_string(t[i:i+2], ' ')) AS gs FROM tok),
      |hs AS (SELECT doc_id, list_transform(gs, g ->
      |         cast(list_sum(list_transform(range(1, 16), j ->
      |           (strpos('0123456789abcdef', substring(md5(g), j, 1)) - 1)::BIGINT
      |             << (4 * (15 - j)))) AS BIGINT)) AS hl FROM gr),
      |fp AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |         range(1, greatest(len(hl) - 7, 1) + 1),
      |         j -> list_min(hl[j:j+7])))) AS f FROM hs),
      |keep AS (SELECT f FROM fp GROUP BY f HAVING count(*) BETWEEN 2 AND 50),
      |fpk AS (SELECT doc_id, f FROM fp JOIN keep USING (f)),
      |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
      |  FROM fpk a JOIN fpk b ON a.f = b.f AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT da, db, shared FROM pairs WHERE shared >= 3
      |ORDER BY da, db""".stripMargin)(
    """WITH wgrp AS MATERIALIZED (
      |SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep,
      |  count(*) OVER (PARTITION BY text) AS gsize
      |FROM documents),
      |rfp AS MATERIALIZED (
      |WITH reps AS (SELECT d.doc_id, d.text FROM documents d
      |    JOIN wgrp g ON d.doc_id = g.doc_id WHERE g.doc_id = g.rep),
      |tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM reps),
      |gr AS (SELECT doc_id, list_transform(range(1, greatest(len(t) - 2, 1) + 1),
      |         i -> array_to_string(t[i:i+2], ' ')) AS gs FROM tok),
      |hs AS (SELECT doc_id, list_transform(gs, g ->
      |         cast(list_sum(list_transform(range(1, 16), j ->
      |           (strpos('0123456789abcdef', substring(md5(g), j, 1)) - 1)::BIGINT
      |             << (4 * (15 - j)))) AS BIGINT)) AS hl FROM gr)
      |SELECT doc_id, unnest(list_distinct(list_transform(
      |         range(1, greatest(len(hl) - 7, 1) + 1),
      |         j -> list_min(hl[j:j+7])))) AS f FROM hs),
      |rfpk AS MATERIALIZED (
      |WITH keep AS (SELECT f FROM rfp r JOIN wgrp g ON g.doc_id = r.doc_id
      |  GROUP BY f HAVING sum(g.gsize) BETWEEN 2 AND 50)
      |SELECT r.doc_id, r.f FROM rfp r JOIN keep USING (f)),
      |rp AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
      |  FROM rfpk a JOIN rfpk b ON a.f = b.f AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |rself AS (SELECT doc_id, count(*) AS kept FROM rfpk GROUP BY 1)
      |SELECT da, db, shared FROM (
      |  SELECT least(ga.doc_id, gb.doc_id) AS da,
      |    greatest(ga.doc_id, gb.doc_id) AS db, r.shared
      |  FROM rp r JOIN wgrp ga ON ga.rep = r.da JOIN wgrp gb ON gb.rep = r.db
      |  WHERE r.shared >= 3
      |  UNION ALL
      |  SELECT a.doc_id, b.doc_id, s.kept
      |  FROM wgrp a JOIN wgrp b ON a.rep = b.rep AND a.doc_id < b.doc_id
      |  JOIN rself s ON s.doc_id = a.rep
      |  WHERE s.kept >= 3)
      |ORDER BY da, db""".stripMargin) { (s, dir) =>
    import s.implicits._
    Winnowing.sharedFingerprintPairs(Tables(s, dir).documentsFanned,
        "doc_id", "text", n = 3, w = 8, minShared = 3L, maxFpFreq = 50L)
      .smallOrdered($"da", $"db")
  }

  /** Per-source distinctive token: the token with the highest frequency
    * lift (in-source rate over corpus rate) — the source-fingerprinting
    * audit that surfaces what a source over-represents (domain skew,
    * template residue) before it enters a training mix. Counts aggregate
    * map-side to a vocab x sources frame; per-source totals broadcast
    * back (source-count-bounded), per-token totals rejoin by the
    * planner's choice (vocabulary-sized — auto-broadcast when small,
    * shuffle join when a real corpus' vocabulary isn't).
    * The lift DOUBLE is division of exact longs in a fixed association —
    * (c_st/c_s)/(c_t/n) — so both engines produce the identical bits;
    * ties (same count profile) break by token.
    */
  private val q109 = QueryDef.sql(
    "per-source distinctive token by frequency lift")(
    """WITH st AS (SELECT source, unnest(string_split(text, ' ')) AS t FROM documents),
      |sc AS (SELECT source, t, count(*)::BIGINT AS c_st FROM st GROUP BY 1, 2),
      |stot AS (SELECT source, sum(c_st) AS c_s FROM sc GROUP BY 1),
      |ct AS (SELECT t, sum(c_st) AS c_t FROM sc GROUP BY 1),
      |tot AS (SELECT sum(c_t) AS n FROM ct),
      |lifts AS (SELECT sc.source, sc.t, c_st,
      |    (c_st::DOUBLE / c_s::DOUBLE) / (c_t::DOUBLE / n::DOUBLE) AS lift
      |  FROM sc JOIN stot USING (source) JOIN ct USING (t), tot),
      |rk AS (SELECT *, row_number() OVER (
      |    PARTITION BY source ORDER BY lift DESC, t) AS r FROM lifts)
      |SELECT source, t AS top_token, c_st AS cnt, lift
      |FROM rk WHERE r = 1 ORDER BY source""".stripMargin) { (s, dir) =>
    import s.implicits._
    val sc = Tables(s, dir).documentsFanned
      .select($"source", explode(split($"text", " ")).as("t"))
      .groupBy($"source", $"t").agg(count(lit(1)).as("c_st"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stot = sc.groupBy($"source").agg(sum($"c_st").as("c_s"))
    val ct = sc.groupBy($"t").agg(sum($"c_st").as("c_t"))
    val tot = ct.agg(sum($"c_t").as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"lift".desc, $"t")
    // stot/tot are source-count-bounded (broadcast); ct is VOCABULARY-sized
    // and grows with the corpus — leave its join strategy to the planner
    sc.join(broadcast(stot), "source").join(ct, "t")
      .crossJoin(broadcast(tot))
      .withColumn("lift",
        ($"c_st".cast("double") / $"c_s".cast("double")) /
          ($"c_t".cast("double") / $"n".cast("double")))
      .withColumn("r", row_number().over(w))
      .filter($"r" === 1)
      .select($"source", $"t".as("top_token"), $"c_st".as("cnt"), $"lift")
      .smallOrdered($"source")
  }

  /** Largest-remainder (Hamilton) apportionment of a global sampling budget
    * across sources, weighted by token count — the exact-integer allocator
    * behind "sample 997 sequences proportionally to source volume": floor
    * quotas first, then one extra to the largest fractional remainders
    * (ties by source) until the budget is spent. The budget is prime so
    * remainders are exercised at any corpus composition; allocations sum
    * to the budget EXACTLY, which a naive per-source round() does not.
    * Per-source token totals reduce map-side; everything after is a
    * 20-row frame.
    */
  private val q110 = QueryDef.sql(
    "largest-remainder apportionment of a 997-row budget by source tokens")(
    """WITH c AS (SELECT source, sum(len(string_split(text, ' ')))::BIGINT AS toks
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT sum(toks) AS n FROM c),
      |base AS (SELECT source, toks, (997 * toks) // n AS fl,
      |    (997 * toks) % n AS rem FROM c, tot),
      |ex AS (SELECT 997 - sum(fl) AS extra FROM base),
      |rk AS (SELECT source, toks, fl,
      |    row_number() OVER (ORDER BY rem DESC, source) AS r FROM base)
      |SELECT source, toks,
      |  (fl + CASE WHEN r <= (SELECT extra FROM ex) THEN 1 ELSE 0 END)::BIGINT
      |    AS alloc
      |FROM rk ORDER BY source""".stripMargin) { (s, dir) =>
    import s.implicits._
    val c = Tables(s, dir).documentsFanned
      .select($"source", size(split($"text", " ")).cast("long").as("k"))
      .groupBy($"source").agg(sum($"k").as("toks"))
    val tot = c.agg(sum($"toks").as("n"))
    val base = c.crossJoin(broadcast(tot))
      .select($"source", $"toks",
        expr("(997 * toks) DIV n").as("fl"),
        (lit(997L) * $"toks" % $"n").as("rem"))
    val ex = base.agg((lit(997L) - sum($"fl")).as("extra"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"rem".desc, $"source")
    base.withColumn("r", row_number().over(w))
      .crossJoin(broadcast(ex))
      .select($"source", $"toks",
        ($"fl" + when($"r" <= $"extra", 1L).otherwise(0L)).as("alloc"))
      .smallOrdered($"source")
  }

  /** Exact repeated-substring audit (the substring-level dedup of Lee et
    * al. 2022, fixed-minimum-length windowed-hash form — see
    * `operators.SubstringDedup`): per document, the maximal token spans
    * whose every length-10 window occurs >= 2 times corpus-wide, reported
    * as span count and exact covered-token total. This is the
    * passage-level complement of q18 (whole-doc) and q108 (sampled
    * fingerprints): coverage here is EXACT, so the "what fraction of my
    * corpus is duplicated text" number is an auditable quantity, not an
    * estimate.
    */
  private val q112 = QueryDef.sql(
    "exact repeated-substring spans (L=10 windows, corpus-wide)")(
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |gr AS (SELECT doc_id, i,
      |    cast(list_sum(list_transform(range(1, 16), j ->
      |      (strpos('0123456789abcdef',
      |         substring(md5(array_to_string(t[i:i+9], ' ')), j, 1)) - 1)::BIGINT
      |        << (4 * (15 - j)))) AS BIGINT) AS h
      |  FROM tok, LATERAL unnest(range(1, greatest(len(t) - 9, 0) + 1)) AS u(i)),
      |rep AS (SELECT h FROM gr GROUP BY h HAVING count(*) >= 2),
      |pos AS (SELECT doc_id, i FROM gr JOIN rep USING (h)),
      |isl AS (SELECT doc_id, i,
      |    sum(CASE WHEN prev IS NULL OR i - prev > 10 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING)
      |      AS island
      |  FROM (SELECT doc_id, i, lag(i) OVER (PARTITION BY doc_id ORDER BY i)
      |          AS prev FROM pos)),
      |sp AS (SELECT doc_id, island, min(i) AS s, max(i) AS e
      |       FROM isl GROUP BY 1, 2)
      |SELECT doc_id, count(*)::BIGINT AS spans,
      |  sum(e - s + 10)::BIGINT AS covered_tokens
      |FROM sp GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    SubstringDedup.repeatedSpans(Tables(s, dir).documentsFanned,
        "doc_id", "text", minLen = 10)
      .select($"id".as("doc_id"), $"start", $"end")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("spans"),
        sum($"end" - $"start" + lit(10L)).as("covered_tokens"))
      .smallOrdered($"doc_id")
  }

  /** Hybrid retrieval via reciprocal-rank fusion (Cormack et al. 2009,
    * k=60): the BM25 keyword top-100 (q46 scoring) fused with the
    * embedding-cosine top-100 (q22 scoring, ranked on the float32-cast
    * similarity both engines agree on bit-exactly) — RRF(d) = Σ 1/(60+r)
    * over the lists containing d. Rank-space fusion needs no score
    * calibration between lexical and vector scores, which is why it is
    * the default hybrid in production retrieval stacks. Both rank lists
    * are bounded (top-100), so fusion is driver-scale work after two
    * independent retrievals; each 1/(60+r) term is one exact-integer
    * division and the two-term sum is fixed-order — hash-stable.
    */
  private val q118 = QueryDef.sql(
    "hybrid retrieval: reciprocal-rank fusion of BM25 and cosine top-100")(
    """WITH f AS (SELECT doc_id, len(string_split(text, ' ')) AS dl,
      |    len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS tf0,
      |    len(list_filter(string_split(text, ' '), x -> x = 'vector')) AS tf1
      |  FROM documents),
      |st AS (SELECT count(*) AS n, sum(dl)::BIGINT AS sumdl,
      |    count(*) FILTER (WHERE tf0 > 0) AS df0,
      |    count(*) FILTER (WHERE tf1 > 0) AS df1
      |  FROM f),
      |sc AS (SELECT doc_id,
      |    (n - df0 + 0.5::DOUBLE) / (df0 + 0.5::DOUBLE)
      |      * (tf0 * (1.2::DOUBLE + 1.0::DOUBLE)) /
      |      (tf0 + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
      |        + 0.75::DOUBLE * (dl::DOUBLE / (sumdl::DOUBLE / n))))
      |  + (n - df1 + 0.5::DOUBLE) / (df1 + 0.5::DOUBLE)
      |      * (tf1 * (1.2::DOUBLE + 1.0::DOUBLE)) /
      |      (tf1 + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
      |        + 0.75::DOUBLE * (dl::DOUBLE / (sumdl::DOUBLE / n))))
      |    AS score
      |  FROM f, st),
      |bm AS (SELECT doc_id AS id,
      |    row_number() OVER (ORDER BY score DESC, doc_id) AS ra
      |  FROM sc ORDER BY score DESC, doc_id LIMIT 100),
      |cs AS (SELECT vec_id AS id,
      |    row_number() OVER (ORDER BY sim DESC, vec_id) AS rb
      |  FROM (SELECT vec_id, cast(list_cosine_similarity(
      |      list_transform(embedding, x -> x::DOUBLE),
      |      (SELECT list_transform(embedding, x -> x::DOUBLE)
      |       FROM embeddings WHERE vec_id = 0)) AS REAL) AS sim
      |    FROM embeddings)
      |  ORDER BY sim DESC, vec_id LIMIT 100),
      |u AS (SELECT coalesce(bm.id, cs.id) AS id,
      |    coalesce(1.0::DOUBLE / (60 + ra), 0.0::DOUBLE)
      |      + coalesce(1.0::DOUBLE / (60 + rb), 0.0::DOUBLE) AS rrf
      |  FROM bm FULL JOIN cs ON bm.id = cs.id)
      |SELECT id, rrf FROM u ORDER BY rrf DESC, id LIMIT 10""".stripMargin) {
    (s, dir) =>
    import s.implicits._
    import graft.functions.VectorFunctions
    val wBm = org.apache.spark.sql.expressions.Window
      .orderBy($"score".desc, $"doc_id")
    val bm = Bm25.topK(Tables(s, dir).documents, "doc_id", "text",
        Bm25Terms, k = 100)
      .withColumn("ra", row_number().over(wBm))
      .select($"doc_id".as("id"), $"ra")
    val emb = Tables(s, dir).embeddingsFanned
    val query = emb.filter($"vec_id" === 0).select($"embedding".as("q"))
    val wCs = org.apache.spark.sql.expressions.Window
      .orderBy($"sim".desc, $"id")
    val cs = emb.crossJoin(broadcast(query))
      .select($"vec_id".as("id"),
        VectorFunctions.cosineSim($"embedding", $"q").cast("float").as("sim"))
      .orderBy($"sim".desc, $"id").limit(100)
      .withColumn("rb", row_number().over(wCs))
      .select($"id", $"rb")
    bm.join(cs, Seq("id"), "full_outer")
      .select($"id",
        (coalesce(lit(1.0) / (lit(60) + $"ra"), lit(0.0))
          + coalesce(lit(1.0) / (lit(60) + $"rb"), lit(0.0))).as("rrf"))
      .orderBy($"rrf".desc, $"id").limit(10)
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q44_neardup_clusters" -> q44,
    "q45_repetition_filters" -> q45,
    "q46_bm25_topk" -> q46,
    "q47_pii_redaction" -> q47,
    "q48_corpus_bigrams" -> q48,
    "q49_global_shuffle" -> q49,
    "q52_source_quota" -> q52,
    "q53_zorder_histogram" -> q53,
    "q56_token_heavy_hitters" -> q56,
    "q58_doc_chunking" -> q58,
    "q59_constraint_audit" -> q59,
    "q61_dedup_survivors" -> q61,
    "q62_sketch_topk_exact" -> q62,
    "q104_bpe_merge_candidates" -> q104,
    "q107_oov_audit" -> q107,
    "q108_winnowing_pairs" -> q108,
    "q109_distinctive_tokens" -> q109,
    "q110_budget_apportionment" -> q110,
    "q112_repeated_substrings" -> q112,
    "q118_hybrid_rrf" -> q118
  )
}
