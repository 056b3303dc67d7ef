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

  val defs: Seq[(String, QueryDef)] = Seq(
    "q136_shard_manifest" -> q136
  )
}
