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
  private val q139 = QueryDef.sql(
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
      |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
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
  private val q141 = QueryDef.sql(
    "end-to-end delivery: exactly-once ingest -> incremental dedup -> quota -> pack -> shard manifest")(
    s"""${Curation.clusterCtes},
       |surv AS (SELECT d.doc_id, d.source, d.text, d.n_chars FROM documents d
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
       |FROM hb GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
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

  val defs: Seq[(String, QueryDef)] = Seq(
    "q136_shard_manifest" -> q136,
    "q139_source_packing" -> q139,
    "q141_delivery_chain" -> q141
  )
}
