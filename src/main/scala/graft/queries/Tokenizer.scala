package graft.queries

import org.apache.spark.sql.functions._

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

  /** Learned-merge memo — the production shape: a tokenizer is learned
    * ONCE per (corpus, k) and applied everywhere, so the application
    * queries (q135/q137/q138) must not each re-run the K sequential
    * argmax jobs q134 already timed. Keyed by (dir, corpus fingerprint,
    * k); the fingerprint is one cheap column-pruned aggregate over
    * (doc_id, n_chars) — guards a corpus changing under the same path
    * within one JVM without scanning text. q134 always relearns (it IS
    * the learn gate) and refreshes the memo.
    */
  private val mergeMemo = scala.collection.concurrent.TrieMap[
    (String, Long, Int), Seq[BpeTrain.Merge]]()

  private def corpusKey(s: org.apache.spark.sql.SparkSession, dir: String,
      k: Int): (String, Long, Int) = {
    val r = Tables(s, dir).documents
      .agg(count(lit(1)),
        // xor-fold, not sum: order-independent AND overflow-free under
        // ANSI mode (a sum of 64-bit hashes overflows within ~thousands
        // of rows)
        expr("bit_xor(xxhash64(doc_id, n_chars))"))
      .first()
    (dir, r.getLong(0) * 31L ^ r.getLong(1), k)
  }

  private def learnedMerges(s: org.apache.spark.sql.SparkSession,
      dir: String, k: Int): Seq[BpeTrain.Merge] =
    mergeMemo.getOrElseUpdate(corpusKey(s, dir, k),
      BpeTrain.learnMerges(Tables(s, dir).documentsFanned, "text", k))

  private val q134 = QueryDef.sql(
    s"BPE tokenizer induction: $MergeSteps exact merge steps with tie-broken argmax")(
    BpeOracle.sql(MergeSteps)) { (s, dir) =>
    import s.implicits._
    val merges = BpeTrain.learnMerges(
      Tables(s, dir).documentsFanned, "text", MergeSteps)
    mergeMemo(corpusKey(s, dir, MergeSteps)) = merges
    BpeTrain.mergesDf(s, merges)
      .select($"step", $"l", $"r", $"merged", $"pair_count")
      .smallOrdered($"step")
  }

  /** Corpus token histogram under the LEARNED tokenizer: apply the q134
    * merge table to the word frame and count resulting subword tokens,
    * corpus-weighted — top 20 with tie-break. The full learn → segment →
    * count chain under one exact gate: a tokenizer that merely "looks
    * learned" but segments differently diverges here even if its merge
    * table matches.
    */
  private val q135 = QueryDef.sql(
    "token histogram under the learned BPE tokenizer: top-20 subword counts")(
    BpeOracle.segmentationSql(MergeSteps, topN = 20)) { (s, dir) =>
    import s.implicits._
    val docs = Tables(s, dir).documentsFanned
    val merges = learnedMerges(s, dir, MergeSteps)
    BpeTrain.applyMerges(BpeTrain.wordFrequencies(docs, "text"), "w", merges)
      .select(explode(split(trim($"w"), "  ")).as("token"), $"freq")
      .groupBy($"token").agg(sum($"freq").as("n_tokens"))
      .orderBy($"n_tokens".desc, $"token")
      .limit(20)
      .smallOrdered($"n_tokens".desc, $"token")
  }

  /** Per-document cost in LEARNED tokens: the number every packing budget,
    * sampling quota, and training-cost estimate is denominated in. One
    * vocabulary-sized lookup (word → learned segment count) joins back to
    * the corpus word stream — documents are priced without re-segmenting
    * each occurrence.
    */
  private val q137 = QueryDef.sql(
    "per-document token counts under the learned BPE tokenizer")(
    BpeOracle.docTokensSql(MergeSteps)) { (s, dir) =>
    import s.implicits._
    val docs = Tables(s, dir).documentsFanned
    val merges = learnedMerges(s, dir, MergeSteps)
    val lut = BpeTrain.wordTokenCounts(docs, "text", merges)
    docs.select($"doc_id", explode(split($"text", " ")).as("wd"))
      .filter(length($"wd") > 0)
      .join(broadcast(lut), Seq("wd"))
      .groupBy($"doc_id")
      .agg(sum($"n_tokens").as("learned_tokens"))
      .cachedOrdered($"doc_id")
  }

  /** Per-source corpus cost under the learned tokenizer: document counts,
    * raw characters, and learned tokens by source — the curation signal
    * for which sources are boilerplate-heavy (few learned tokens per
    * character means the tokenizer's merges eat them) and how a token
    * budget splits across a source mix. Exact integers only.
    */
  private val q138 = QueryDef.sql(
    "per-source chars vs learned-token cost under the learned BPE tokenizer")(
    BpeOracle.sourceCostSql(MergeSteps)) { (s, dir) =>
    import s.implicits._
    val docs = Tables(s, dir).documentsFanned
    val merges = learnedMerges(s, dir, MergeSteps)
    val lut = BpeTrain.wordTokenCounts(docs, "text", merges)
    val perSource = docs
      .select($"source", explode(split($"text", " ")).as("wd"))
      .filter(length($"wd") > 0)
      .join(broadcast(lut), Seq("wd"))
      .groupBy($"source").agg(sum($"n_tokens").as("learned_tokens"))
    docs.groupBy($"source")
      .agg(count(lit(1)).as("docs"), sum($"n_chars").as("chars"))
      .join(perSource, Seq("source"))
      .select($"source", $"docs", $"chars", $"learned_tokens")
      .smallOrdered($"source")
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q134_bpe_merges" -> q134,
    "q135_bpe_token_histogram" -> q135,
    "q137_bpe_doc_tokens" -> q137,
    "q138_bpe_source_cost" -> q138
  )
}

/** K unrolled BPE steps: wN = words after N merges, bN = step N's argmax.
  * Built by loop so the step count stays next to the Spark side's.
  */
private object BpeOracle {
  def sql(k: Int): String = {
    val union = (1 to k)
      .map(i => s"SELECT CAST($i AS INT) AS step, l, r, m AS merged, " +
        s"cnt AS pair_count FROM b$i")
      .mkString("\n|  UNION ALL ")
    (chain(k) +
      s"""
         |SELECT * FROM (
         |  $union
         |) ORDER BY step""").stripMargin
  }

  /** Per-document token counts after the k merges — the pricing gate
    * (q137): each document's word stream joins the vocabulary's learned
    * segment lengths and sums.
    */
  def docTokensSql(k: Int): String =
    (chain(k) +
      s"""
         |SELECT d.doc_id, sum(len(string_split(trim(s.w), '  ')))::BIGINT
         |  AS learned_tokens
         |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS wd
         |      FROM documents) d
         |JOIN w$k s ON s.wd = d.wd
         |GROUP BY 1 ORDER BY 1""").stripMargin

  /** Per-source chars vs learned-token totals (q138). */
  def sourceCostSql(k: Int): String =
    (chain(k) +
      s"""
         |, wtok AS (SELECT wd, len(string_split(trim(w), '  ')) AS t FROM w$k),
         |dt AS (SELECT d.source, sum(wtok.t)::BIGINT AS toks
         |  FROM (SELECT source, unnest(string_split(text, ' ')) AS wd
         |        FROM documents) d
         |  JOIN wtok ON wtok.wd = d.wd
         |  GROUP BY 1),
         |sc AS (SELECT source, count(*) AS docs, sum(n_chars)::BIGINT AS chars
         |  FROM documents GROUP BY 1)
         |SELECT sc.source, sc.docs, sc.chars, dt.toks AS learned_tokens
         |FROM sc JOIN dt ON dt.source = sc.source
         |ORDER BY sc.source""").stripMargin

  /** Token counts after the k merges — the segmentation gate (q135). */
  def segmentationSql(k: Int, topN: Int): String =
    (chain(k) +
      s"""
         |SELECT token, sum(freq)::BIGINT AS n_tokens FROM (
         |  SELECT unnest(string_split(trim(w), '  ')) AS token, freq FROM w$k)
         |GROUP BY token ORDER BY n_tokens DESC, token LIMIT $topN""").stripMargin

  /** The shared WITH chain: wN = words after N merges, bN = step N's argmax. */
  private def chain(k: Int): String = {
    val base =
      """WITH w0 AS MATERIALIZED (
        |  SELECT wd,
        |    ' ' || array_to_string(list_transform(range(1, length(wd) + 1),
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
         |w$i AS MATERIALIZED (SELECT wd, replace(w,
         |    ' ' || (SELECT l FROM b$i) || '  ' || (SELECT r FROM b$i) || ' ',
         |    ' ' || (SELECT m FROM b$i) || ' ') AS w, freq FROM w${i - 1})""".stripMargin
    }.mkString
    base + steps
  }
}
