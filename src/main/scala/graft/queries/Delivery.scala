package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Sharding

/** Dataset-delivery queries (round 8): the shard-assignment + integrity
  * manifest contract of `operators.Sharding`, gated exactly — the oracle
  * replays the md5-derived 60-bit key hash (the q21/q31 portable-hash
  * pattern), the modular shard assignment, and the order-independent
  * 30-bit checksum sums. The WRITE half (partitionBy layout, write-then-
  * reread verification, torn-copy detection) is covered by ShardingSpec;
  * the gate pins the numbers any conforming consumer must reproduce.
  */
object Delivery {

  private val q136 = QueryDef.sql(
    "shard manifest: deterministic assignment + per-shard integrity checksums")(
    """WITH h AS (SELECT
      |    cast(list_sum(list_transform(range(1, 16), i ->
      |      (strpos('0123456789abcdef',
      |         substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)::BIGINT
      |        << (4 * (15 - i)))) AS BIGINT) AS h
      |  FROM documents)
      |SELECT CAST(h % 8 AS INT) AS shard, count(*) AS n_rows,
      |  sum(h & 1073741823)::BIGINT AS checksum
      |FROM h GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    Sharding.manifest(
        Sharding.assign(Tables(s, dir).documents, "doc_id", n = 8), "doc_id")
      .smallOrdered($"shard")
  }

  /** Deterministic next-fit packing of each source's documents into
    * 2000-character bins (SequencePacking.packGroupsSequential): the
    * resumable-delivery layout — bins are a pure function of the data, so
    * an unchanged source re-packs identically across runs. The oracle
    * replays the sequential fold with a recursive CTE; the gated output
    * is per-bin document counts and weight totals.
    */
  private val q139 = QueryDef.scalableSql(
    "per-source next-fit packing into 2000-char bins, deterministic layout")(
    """WITH RECURSIVE d AS (
      |  SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      |  FROM documents),
      |p AS (
      |  SELECT source, doc_id, n_chars, rn,
      |    CAST(0 AS BIGINT) AS bin, n_chars::BIGINT AS used
      |  FROM d WHERE rn = 1
      |  UNION ALL
      |  SELECT d.source, d.doc_id, d.n_chars, d.rn,
      |    CASE WHEN p.used + d.n_chars > 2000 AND p.used > 0
      |         THEN p.bin + 1 ELSE p.bin END,
      |    CASE WHEN p.used + d.n_chars > 2000 AND p.used > 0
      |         THEN d.n_chars::BIGINT ELSE p.used + d.n_chars END
      |  FROM p JOIN d ON d.source = p.source AND d.rn = p.rn + 1)
      |SELECT source, bin, count(*) AS n_docs, sum(n_chars)::BIGINT AS bin_chars
      |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)(
    """WITH cs AS MATERIALIZED (
      |WITH guard AS (SELECT CASE WHEN min(n_chars) >= 1 THEN 1
      |    ELSE error('q139 scalable oracle requires n_chars >= 1') END AS g
      |  FROM documents)
      |SELECT source, doc_id, n_chars,
      |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
      |  sum(n_chars::BIGINT) OVER (PARTITION BY source ORDER BY doc_id
      |    ROWS UNBOUNDED PRECEDING) AS cum
      |FROM documents, guard),
      |bins AS MATERIALIZED (
      |WITH RECURSIVE bins(source, bin, srn, base) AS (
      |  SELECT source, CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT)
      |  FROM cs WHERE rn = 1
      |  UNION ALL
      |  SELECT b.source, b.bin + 1, c.rn, cp.cum
      |  FROM bins b
      |  JOIN cs c ON c.source = b.source AND c.rn > b.srn
      |  JOIN cs cp ON cp.source = b.source AND cp.rn = c.rn - 1
      |  WHERE c.cum - b.base > 2000
      |    AND (c.rn = b.srn + 1 OR cp.cum - b.base <= 2000))
      |SELECT source, bin, srn FROM bins)
      |SELECT source, bin, count(*) AS n_docs, sum(n_chars)::BIGINT AS bin_chars
      |FROM (
      |  SELECT c.source, c.n_chars, b.bin
      |  FROM cs c ASOF JOIN bins b
      |    ON c.source = b.source AND b.srn <= c.rn)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.operators.SequencePacking
    SequencePacking.packGroupsSequential(
        Tables(s, dir).documents.select($"source", $"doc_id", $"n_chars"),
        "source", "doc_id", "n_chars", budget = 2000L)
      .groupBy($"source", $"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("bin_chars"))
      .smallOrdered($"source", $"bin")
  }

  /** End-to-end delivery chain (round 9): the event "two ingest batches
    * arrive, the second containing near-dups of the first", driven through
    * every already-gated link as ONE query — exactly-once ingest
    * (IdempotentSink, with the second batch REPLAYED and discarded) →
    * incremental near-dup fold (pairs of arrival 2 folded into arrival
    * 1's labels via `ConnectedComponents.incrementalAssign`) → cluster
    * survivors → per-source quality quota (q52 semantics) → deterministic
    * next-fit packing (q139 semantics) → bin-sharded delivery manifest
    * (q136's portable hash). The oracle replays the chain's batch
    * semantics in one SQL (the incremental fold is contract-equal to the
    * batch closure — IncrementalCcSpec/PRESSURE.md); the gated output is
    * the 4-shard manifest: bins, docs, chars, and an order-independent
    * content checksum per shard.
    */
  private val q141Tail =
    s"""surv AS (SELECT d.doc_id, d.source, d.text, d.n_chars FROM documents d
      |  LEFT JOIN comp c ON d.doc_id = c.id AND c.id <> c.component
      |  WHERE c.id IS NULL),
      |sf AS (SELECT doc_id, source, n_chars, text,
      |    string_split(text, ' ') AS t FROM surv),
      |sg AS (SELECT doc_id, source, n_chars,
      |  len(list_filter(t, x -> x IN (${Curation.stopList})))::DOUBLE / len(t) AS stop_ratio,
      |  (length(text) - len(t) + 1)::DOUBLE / len(t) AS mean_tok_len,
      |  len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE / length(text) AS punct_ratio
      |FROM sf),
      |sq AS (SELECT doc_id, source, n_chars,
      |  (1.0::DOUBLE - least(1.0::DOUBLE, abs(stop_ratio - 0.35::DOUBLE) / 0.35::DOUBLE)) * 0.4::DOUBLE
      |    + (1.0::DOUBLE - least(1.0::DOUBLE, abs(mean_tok_len - 5.0::DOUBLE) / 5.0::DOUBLE)) * 0.3::DOUBLE
      |    + (1.0::DOUBLE - least(1.0::DOUBLE, punct_ratio / 0.3::DOUBLE)) * 0.3::DOUBLE AS quality
      |FROM sg),
      |sr AS (SELECT doc_id, source, n_chars,
      |  row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rk
      |FROM sq),
      |kd AS (SELECT source, doc_id, n_chars,
      |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      |FROM sr WHERE rk <= 10),
      |pk AS (
      |  SELECT source, doc_id, n_chars, rn,
      |    CAST(0 AS BIGINT) AS bin, n_chars::BIGINT AS used
      |  FROM kd WHERE rn = 1
      |  UNION ALL
      |  SELECT k.source, k.doc_id, k.n_chars, k.rn,
      |    CASE WHEN p.used + k.n_chars > 2000 AND p.used > 0
      |         THEN p.bin + 1 ELSE p.bin END,
      |    CASE WHEN p.used + k.n_chars > 2000 AND p.used > 0
      |         THEN k.n_chars::BIGINT ELSE p.used + k.n_chars END
      |  FROM pk p JOIN kd k ON k.source = p.source AND k.rn = p.rn + 1),
      |hb AS (SELECT source, bin, doc_id, n_chars,
      |    cast(list_sum(list_transform(range(1, 16), i ->
      |      (strpos('0123456789abcdef',
      |         substring(md5(source || ':' || CAST(bin AS VARCHAR)), i, 1)) - 1)::BIGINT
      |        << (4 * (15 - i)))) AS BIGINT) % 4 AS shard,
      |    cast(list_sum(list_transform(range(1, 16), i ->
      |      (strpos('0123456789abcdef',
      |         substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)::BIGINT
      |        << (4 * (15 - i)))) AS BIGINT) AS hd
      |  FROM pk)
      |SELECT CAST(shard AS INT) AS shard,
      |  count(DISTINCT source || ':' || CAST(bin AS VARCHAR)) AS n_bins,
      |  count(*) AS n_docs, sum(n_chars)::BIGINT AS chars,
      |  sum(hd & 1073741823)::BIGINT AS checksum
      |FROM hb GROUP BY 1 ORDER BY 1""".stripMargin

  private val q141 = QueryDef.scalableSql(
    "end-to-end delivery: exactly-once ingest -> incremental dedup -> quota -> pack -> shard manifest")(
    s"${Curation.clusterCtesSemantic},\n${q141Tail}")(
    s"${Curation.clusterCtes},\n${q141Tail}") { (s, dir) =>
    import s.implicits._
    import graft.functions.TextAnalysis
    import graft.operators.{ConnectedComponents, Dedup, Sampling, SequencePacking}
    import graft.streaming.IdempotentSink
    val docs = Tables(s, dir).documents
      .select($"doc_id", $"source", $"text", $"n_chars")
    val root = java.nio.file.Files
      .createTempDirectory("graft-delivery-gate-").toString
    try {
      // 1. exactly-once ingest: two arrivals split by doc_id parity (the
      //    natural near-dup clusters straddle the parity cut, so arrival 2
      //    really does contain near-dups of arrival 1); arrival 2 is then
      //    REPLAYED — the restart case — and the sink must discard it
      val b0 = docs.filter(pmod($"doc_id", lit(2)) === 0)
      val b1 = docs.filter(pmod($"doc_id", lit(2)) === 1)
      require(IdempotentSink.writeOnce(b0, 0L, root), "batch 0 must write")
      require(IdempotentSink.writeOnce(b1, 1L, root), "batch 1 must write")
      require(!IdempotentSink.writeOnce(b1, 1L, root),
        "replayed batch 1 must be discarded (exactly-once)")
      val ingested = IdempotentSink.committedBatches(s, root).get
      // 2. near-dup pairs folded by arrival: arrival 1's labels, then the
      //    pairs arrival 2 introduces (within-2 and cross-batch) folded in
      val pairs = Dedup.minHashNearDups(ingested, "doc_id", "text",
          n = 3, minJaccard = 0.9)
        .select($"da", $"db")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val within0 = pmod($"da", lit(2)) === 0 && pmod($"db", lit(2)) === 0
      val labels0 = ConnectedComponents.assign(pairs.filter(within0))
      val labels = ConnectedComponents.incrementalAssign(
        labels0, pairs.filter(!within0))
      // 3. cluster survivors (min doc_id per component)
      val surv = ingested.join(
        labels.filter($"id" =!= $"comp").select($"id".as("doc_id")),
        Seq("doc_id"), "left_anti")
      // 4. per-source quality quota (q52 semantics over the survivor set)
      val kept = Sampling.qualityQuota(
        surv.select($"doc_id", $"source", $"n_chars",
          TextAnalysis.qualityScore($"text").as("quality")),
        Seq("source"), "quality", "doc_id", quota = 10)
      // 5. deterministic next-fit packing per source (q139 semantics)
      val packed = SequencePacking.packGroupsSequential(
        kept.select($"source", $"doc_id", $"n_chars"),
        "source", "doc_id", "n_chars", budget = 2000L)
      // 6. bin-sharded delivery manifest (q136's portable hash at both
      //    granularities: bins route, docs checksum)
      val keyed = packed
        .withColumn("bin_key", concat_ws(":", $"source", $"bin"))
      val out = Sharding.assign(keyed, "bin_key", n = 4)
        .groupBy($"shard")
        .agg(countDistinct($"bin_key").as("n_bins"),
          count(lit(1)).as("n_docs"),
          sum($"n_chars").as("chars"),
          sum(Dedup.tokenHash60($"doc_id".cast("string"))
            .bitwiseAND(lit((1L << 30) - 1))).as("checksum"))
        .repartition(1).sortWithinPartitions($"shard")
        // eager pin: the ingest dirs are deleted in the finally below
        .localCheckpoint()
      pairs.unpersist()
      out
    } finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(root))
    }
  }

  /** LLM-curation flagship (round 12, VERDICT r11 #3): the actual shape a
    * training-data run executes, chained through every already-gated link
    * as ONE oracle-replayed query — corpus-scale near-dup dedup (q61's
    * pairs → components → survivors), a self-trained bigram-LM quality
    * filter over the deduped corpus (q172's operator, threshold −3.40 on
    * the float32 score — bit-equal across engines, so the cut is exact),
    * benchmark decontamination against eval docs 0–19 (q37's containment,
    * any hit drops the doc), DSIR importance weights trained on the same
    * deduped corpus with a per-source top-40 quota by log_w (q173's
    * operator + q52's quota — the deterministic analog of importance
    * resampling), next-fit packing into 2000-char bins (q139) and the
    * 4-shard integrity manifest (q136/q141's portable hash). Every
    * corpus-scale stage runs at corpus scale; only the post-quota tail is
    * bounded. The survivor frame is pinned once and feeds the LM trainer,
    * the DSIR trainer and the decontamination probe — the operator-
    * boundary materialization a per-query gate never exercises. Wall
    * budget: ≤ the sum of its parts (q61+q172+q173+q37+q139+q136).
    */
  private val q174Tail =
    s"""surv AS (SELECT d.doc_id, d.source, d.n_chars FROM documents d
      |  LEFT JOIN comp c ON d.doc_id = c.id AND c.id <> c.component
      |  WHERE c.id IS NULL),
      |stok AS (SELECT tok.doc_id, tok.t FROM tok
      |  JOIN surv ON tok.doc_id = surv.doc_id),
      |bge AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
      |    i -> {'w1': t[i], 'w2': t[i + 1]})) AS b
      |  FROM stok WHERE len(t) >= 2),
      |bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bge),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
      |v AS (SELECT count(DISTINCT x) AS v
      |  FROM (SELECT unnest(t) AS x FROM stok)),
      |sc AS (SELECT bg.doc_id,
      |    CAST(avg(ln((c12.c12 + 1)::DOUBLE
      |      / (c1.c1 + (SELECT v FROM v))::DOUBLE)) AS REAL) AS avg_logp
      |  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) GROUP BY 1),
      |q AS (SELECT surv.doc_id, surv.source, surv.n_chars
      |  FROM surv JOIN sc ON surv.doc_id = sc.doc_id
      |  WHERE sc.avg_logp >= CAST(-3.40 AS REAL) AND surv.doc_id >= 20),
      |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 20),
      |qsh AS (SELECT sh.doc_id, sh.s FROM sh JOIN q ON sh.doc_id = q.doc_id),
      |hits AS (SELECT qsh.doc_id, count(b.s) AS n_hits
      |  FROM qsh LEFT JOIN bench b ON qsh.s = b.s GROUP BY 1),
      |clean AS (SELECT q.doc_id, q.source, q.n_chars
      |  FROM q JOIN hits ON q.doc_id = hits.doc_id WHERE hits.n_hits = 0),
      |tbg AS (SELECT * FROM bg WHERE doc_id % 7 = 0),
      |c12t AS (SELECT w1, w2, count(*) AS c12t FROM tbg GROUP BY 1, 2),
      |c1t AS (SELECT w1, count(*) AS c1t FROM tbg GROUP BY 1),
      |vt AS (SELECT count(DISTINCT x) AS vt
      |  FROM (SELECT unnest(t) AS x FROM stok WHERE doc_id % 7 = 0)),
      |dw AS (SELECT bg.doc_id,
      |    CAST(avg(ln((coalesce(c12t.c12t, 0) + 1)::DOUBLE
      |          / (coalesce(c1t.c1t, 0) + (SELECT vt FROM vt))::DOUBLE)
      |      - ln((c12.c12 + 1)::DOUBLE
      |          / (c1.c1 + (SELECT v FROM v))::DOUBLE)) AS REAL) AS log_w
      |  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
      |  LEFT JOIN c12t USING (w1, w2) LEFT JOIN c1t USING (w1)
      |  GROUP BY 1),
      |sel AS (SELECT clean.source, clean.doc_id, clean.n_chars,
      |    row_number() OVER (PARTITION BY clean.source
      |      ORDER BY dw.log_w DESC, clean.doc_id) AS rk
      |  FROM clean JOIN dw ON clean.doc_id = dw.doc_id),
      |kd AS (SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      |  FROM sel WHERE rk <= 40),
      |pk AS (
      |  SELECT source, doc_id, n_chars, rn,
      |    CAST(0 AS BIGINT) AS bin, n_chars::BIGINT AS used
      |  FROM kd WHERE rn = 1
      |  UNION ALL
      |  SELECT k.source, k.doc_id, k.n_chars, k.rn,
      |    CASE WHEN p.used + k.n_chars > 2000 AND p.used > 0
      |         THEN p.bin + 1 ELSE p.bin END,
      |    CASE WHEN p.used + k.n_chars > 2000 AND p.used > 0
      |         THEN k.n_chars::BIGINT ELSE p.used + k.n_chars END
      |  FROM pk p JOIN kd k ON k.source = p.source AND k.rn = p.rn + 1),
      |hb AS (SELECT source, bin, doc_id, n_chars,
      |    cast(list_sum(list_transform(range(1, 16), i ->
      |      (strpos('0123456789abcdef',
      |         substring(md5(source || ':' || CAST(bin AS VARCHAR)), i, 1)) - 1)::BIGINT
      |        << (4 * (15 - i)))) AS BIGINT) % 4 AS shard,
      |    cast(list_sum(list_transform(range(1, 16), i ->
      |      (strpos('0123456789abcdef',
      |         substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)::BIGINT
      |        << (4 * (15 - i)))) AS BIGINT) AS hd
      |  FROM pk)
      |SELECT CAST(shard AS INT) AS shard,
      |  count(DISTINCT source || ':' || CAST(bin AS VARCHAR)) AS n_bins,
      |  count(*) AS n_docs, sum(n_chars)::BIGINT AS chars,
      |  sum(hd & 1073741823)::BIGINT AS checksum
      |FROM hb GROUP BY 1 ORDER BY 1""".stripMargin

  private val q174 = QueryDef.scalableSql(
    "curation flagship: dedup -> LM quality -> decontaminate -> DSIR quota -> pack -> shard")(
    s"${Curation.clusterCtesSemantic},\n${q174Tail}")(
    s"${Curation.clusterCtes},\n${q174Tail}") { (s, dir) =>
    import s.implicits._
    import graft.operators.{ConnectedComponents, Decontamination, Dedup,
      NgramLm, Sampling, SequencePacking, Sharding}
    val t = Tables(s, dir)
    val docs = t.documents.select($"doc_id", $"source", $"text", $"n_chars")
    // 1. corpus-scale near-dup dedup (q61's chain) — contraction path
    //    (round 14): non-survivors from the rep graph, never the
    //    O(multiplicity²) member-pair edge list
    // pinned: the survivor corpus feeds the fused LM pass and the
    // decontamination probe; released by the harness's per-query
    // clearCache (ParallelRank's discipline)
    val surv = docs.join(
        Dedup.nearDupNonSurvivors(t.documentsFanned, "doc_id", "text",
            n = 3, minJaccard = 0.9)
          .withColumnRenamed("id", "doc_id"),
      Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 2+4. ONE fused LM pass over the deduped corpus emits the quality
    // score AND the DSIR weight (ln P_raw is a term of both; same joined
    // rows) — running q172's and q173's operators separately tokenized
    // the survivors twice and re-built the raw count tables
    val lm = NgramLm.bigramScoreWithDsir(t.fanOut(surv), "doc_id", "text",
      id => pmod(id, lit(7L)) === 0)
    // quality cut + eval-doc exclusion; pinned because BOTH the
    // decontamination probe and the post-report join consume it (without
    // the pin each consumer would re-run the whole LM stage)
    val qual = surv
      .join(lm.filter($"avg_logp" >= lit(-3.40f))
          .select($"doc_id", $"log_w"),
        Seq("doc_id"))
      .filter($"doc_id" >= 20)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 3. benchmark decontamination vs eval docs 0-19: any 3-gram hit drops
    val report = Decontamination.report(qual, docs.filter($"doc_id" < 20),
      "doc_id", "text", "text", n = 3, minHits = 1L)
    val clean = qual.join(
      report.filter(!$"contaminated").select($"doc_id"), Seq("doc_id"))
    // 5'. per-source top-40 quota by the DSIR weight already attached
    val sel = Sampling.qualityQuota(clean,
      Seq("source"), "log_w", "doc_id", quota = 40)
    // 5. deterministic next-fit packing per source (q139)
    val packed = SequencePacking.packGroupsSequential(
      sel.select($"source", $"doc_id", $"n_chars"),
      "source", "doc_id", "n_chars", budget = 2000L)
    // 6. 4-shard delivery manifest with integrity checksums (q136/q141)
    val keyed = packed.withColumn("bin_key", concat_ws(":", $"source", $"bin"))
    Sharding.assign(keyed, "bin_key", n = 4)
      .groupBy($"shard")
      .agg(countDistinct($"bin_key").as("n_bins"),
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("chars"),
        sum(Dedup.tokenHash60($"doc_id".cast("string"))
          .bitwiseAND(lit((1L << 30) - 1))).as("checksum"))
      .smallOrdered($"shard")
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q136_shard_manifest" -> q136,
    "q139_source_packing" -> q139,
    "q141_delivery_chain" -> q141,
    "q174_curation_flagship" -> q174
  )
}
