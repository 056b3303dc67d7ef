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

  val defs: Seq[(String, QueryDef)] = Seq(
    "q136_shard_manifest" -> q136,
    "q139_source_packing" -> q139
  )
}
