package graft.queries

import graft.core.Tables
import graft.operators.BpeTrain

/** Tokenizer induction (round 8): distributed BPE merge learning over the
  * document corpus, gated exactly — the oracle unrolls the K merge steps
  * as materialized CTEs (the PageRank-oracle pattern: the iteration count
  * lives in ONE place for both engines) and replays pair counting, the
  * tie-broken argmax, and greedy merge application through the shared
  * double-space `replace` contract (`BpeTrain` scaladoc). Byte-identical
  * merge tables across engines certify that the learned tokenizer — not
  * just some tokenizer — is reproducible off-cluster.
  */
object Tokenizer {

  private val MergeSteps = 8

  private val q134 = QueryDef.sql(
    s"BPE tokenizer induction: $MergeSteps exact merge steps with tie-broken argmax")(
    BpeOracle.sql(MergeSteps)) { (s, dir) =>
    import s.implicits._
    val merges = BpeTrain.learnMerges(
      Tables(s, dir).documentsFanned, "text", MergeSteps)
    BpeTrain.mergesDf(s, merges)
      .select($"step", $"l", $"r", $"merged", $"pair_count")
      .smallOrdered($"step")
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q134_bpe_merges" -> q134
  )
}

/** K unrolled BPE steps: wN = words after N merges, bN = step N's argmax.
  * Built by loop so the step count stays next to the Spark side's.
  */
private object BpeOracle {
  def sql(k: Int): String = {
    val base =
      """WITH w0 AS MATERIALIZED (
        |  SELECT ' ' || array_to_string(list_transform(range(1, length(wd) + 1),
        |      i -> substring(wd, i, 1)), '  ') || ' ' AS w,
        |    count(*)::BIGINT AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS wd FROM documents)
        |  WHERE length(wd) > 0 GROUP BY wd)""".stripMargin
    val steps = (1 to k).map { i =>
      s""",
         |p$i AS (SELECT pr.l AS l, pr.r AS r, sum(freq)::BIGINT AS cnt FROM (
         |    SELECT unnest(list_transform(range(1, len(ts)), j ->
         |      {'l': ts[j], 'r': ts[j + 1]})) AS pr, freq
         |    FROM (SELECT string_split(trim(w), '  ') AS ts, freq FROM w${i - 1}))
         |  GROUP BY 1, 2),
         |b$i AS MATERIALIZED (SELECT l, r, l || r AS m, cnt FROM p$i
         |  ORDER BY cnt DESC, l, r LIMIT 1),
         |w$i AS MATERIALIZED (SELECT replace(w,
         |    ' ' || (SELECT l FROM b$i) || '  ' || (SELECT r FROM b$i) || ' ',
         |    ' ' || (SELECT m FROM b$i) || ' ') AS w, freq FROM w${i - 1})""".stripMargin
    }.mkString
    val union = (1 to k)
      .map(i => s"SELECT CAST($i AS INT) AS step, l, r, m AS merged, " +
        s"cnt AS pair_count FROM b$i")
      .mkString("\n|  UNION ALL ")
    (base + steps +
      s"""
         |SELECT * FROM (
         |  $union
         |) ORDER BY step""").stripMargin
  }
}
