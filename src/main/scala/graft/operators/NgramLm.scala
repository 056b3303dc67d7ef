package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the classic
  * perplexity-style quality filter of a pretraining-data pipeline (score
  * every document by how predictable its token stream is under a model of
  * the corpus itself; garbled/boilerplate/foreign text scores low and gets
  * dropped or down-weighted). CCNet (Wenzek et al. 2020) popularized the
  * shape with KenLM; this is the engine-native equivalent at bigram order,
  * fully replayable by a SQL oracle.
  *
  * Model: add-one-smoothed bigram LM trained on the scored corpus —
  * P(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V), with c(w1·) counted over
  * bigram CONTEXTS (every token except a document's last) and V the
  * distinct-token vocabulary size. Score = mean ln P over the document's
  * bigrams.
  *
  * Plan shape (the 100 TB design): bigram extraction is a PURE PROJECTION
  * — zip_with over two slices of the split-token array, no window, no
  * per-document sort, so extraction stays inside the scan's codegen stage.
  * Training is two map-side-combined aggregates over the exploded bigrams
  * (vocabulary-sized results, shuffled on token keys — never collected);
  * V is a one-row frame cross-joined in (broadcast of one long). Scoring
  * re-joins the exploded bigrams against the two count tables on token
  * keys — Catalyst broadcasts them when they fit, shuffle-joins when a
  * web-scale vocabulary doesn't — then one groupBy(doc) mean. Nothing in
  * the plan is bounded by corpus size except the shuffles on their
  * natural keys. Train-on-sample / score-everything splits compose by
  * passing a different `train` frame.
  */
object NgramLm {

  /** (doc_id, w1, w2) exploded bigrams of `textCol`, split on spaces.
    * Single-token and empty documents contribute nothing (and are absent
    * from scores — matching the SQL oracle's semantics).
    */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = split(col(textCol), " ")
    docs.select(col(idCol).as("doc_id"), t.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(
        zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a: Column, b: Column) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
  }

  /** Per-document LM quality: (doc_id, n_bigrams, avg_logp float32).
    * `train` defaults to the scored corpus (self-scoring, the CCNet
    * bootstrap shape); pass a held-out/reference corpus to score against
    * a fixed model instead.
    */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String,
      train: Option[DataFrame] = None): DataFrame = {
    val scoreBg = bigrams(docs, idCol, textCol)
    val trainDf = train.getOrElse(docs)
    val trainBg =
      if (train.isEmpty) scoreBg
      else bigrams(trainDf, idCol, textCol)
    val c12 = trainBg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = trainBg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = trainDf
      .select(explode(split(col(textCol), " ")).as("x"))
      .agg(countDistinct(col("x")).as("v"))
    scoreBg
      // unseen (w1,w2) or unseen w1 under a foreign model: add-one floor
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        log((coalesce(col("c12"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(col("lp")).cast("float").as("avg_logp"))
  }

  /** (doc_id, w1, w2, w3) exploded trigrams of `textCol` — the same pure
    * projection as [[bigrams]] one order up (three aligned slices zipped in
    * the scan's codegen stage; no window, no per-document sort). Documents
    * with fewer than 3 tokens contribute nothing.
    */
  def trigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = split(col(textCol), " ")
    docs.select(col(idCol).as("doc_id"), t.as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(
        zip_with(
          slice(col("t"), lit(1), size(col("t")) - 2),
          zip_with(
            slice(col("t"), lit(2), size(col("t")) - 2),
            slice(col("t"), lit(3), size(col("t")) - 2),
            (b: Column, c: Column) => struct(b.as("w2"), c.as("w3"))),
          (a: Column, bc: Column) => struct(a.as("w1"),
            bc.getField("w2").as("w2"), bc.getField("w3").as("w3")))).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"),
        col("g.w3").as("w3"))
  }

  /** Trigram LM with stupid backoff (Brants et al. 2007, "Large Language
    * Models in Machine Translation") — the corpus-scale n-gram score:
    * bigram LMs saturate on short/templated documents, and stupid backoff
    * is the smoothing that needs NO held-out tuning and no normalization
    * pass, which is exactly why web-scale LM pipelines used it:
    *
    *   S(w3|w1 w2) = c(w1w2w3)/c(w1w2·)           when the trigram is seen
    *               = λ · c(w2w3)/c(w2·)            else, when the bigram is
    *               = λ² · (c(w3)+1)/(N+V)          else (add-one unigram
    *                                                floor: unseen words
    *                                                score finite, not −∞)
    *
    * with λ = 0.4 (the published constant), contexts counted over the
    * n-gram frames themselves (c(w1w2·) = trigram contexts, c(w2·) =
    * bigram contexts) so numerator ≤ denominator at every level. Score =
    * mean ln S over the document's trigrams. Same plan discipline as
    * [[bigramScore]]: extraction is a projection, training is three
    * map-side-combined vocabulary-sized aggregates, scoring re-joins on
    * token keys, N and V broadcast as one row.
    */
  def trigramBackoffScore(docs: DataFrame, idCol: String, textCol: String,
      train: Option[DataFrame] = None, lambda: Double = 0.4): DataFrame = {
    val scoreTg = trigrams(docs, idCol, textCol)
    val trainDf = train.getOrElse(docs)
    val trainTg = if (train.isEmpty) scoreTg
      else trigrams(trainDf, idCol, textCol)
    val trainBg = bigrams(trainDf, idCol, textCol)
    val c123 = trainTg.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c123"))
    val c12 = trainTg.groupBy("w1", "w2").agg(count(lit(1)).as("c12x"))
    // backoff tables are keyed on the SCORED trigram's (w2, w3) / (w2)
    val c23 = trainBg.groupBy("w1", "w2").agg(count(lit(1)).as("c23x"))
      .select(col("w1").as("w2"), col("w2").as("w3"), col("c23x"))
    val c2 = trainBg.groupBy("w1").agg(count(lit(1)).as("c2x"))
      .select(col("w1").as("w2"), col("c2x"))
    val toks = trainDf.select(explode(split(col(textCol), " ")).as("x"))
    val c3 = toks.groupBy(col("x")).agg(count(lit(1)).as("c3x"))
      .select(col("x").as("w3"), col("c3x"))
    val nv = toks.agg(count(lit(1)).as("nn"), countDistinct(col("x")).as("v"))
    scoreTg
      .join(c123, Seq("w1", "w2", "w3"), "left")
      .join(c12, Seq("w1", "w2"), "left")
      .join(c23, Seq("w2", "w3"), "left")
      .join(c2, Seq("w2"), "left")
      .join(c3, Seq("w3"), "left")
      .crossJoin(broadcast(nv))
      .select(col("doc_id"),
        when(col("c123").isNotNull,
          log(col("c123").cast("double") / col("c12x")))
        .when(col("c23x").isNotNull,
          log(lit(lambda) * col("c23x").cast("double") / col("c2x")))
        .otherwise(
          log(lit(lambda) * lit(lambda) *
            (coalesce(col("c3x"), lit(0L)) + 1).cast("double") /
            (col("nn") + col("v")).cast("double"))).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        avg(col("lp")).cast("float").as("avg_logp"))
  }

  /** Fused quality score + DSIR weight (round 12, for the q174 chain):
    * the raw-model log-probability ln P_raw is a term of BOTH outputs —
    * quality = mean ln P_raw, DSIR log w = mean (ln P_target − ln P_raw)
    * — and both average over the SAME joined bigram rows, so one
    * extraction, one set of count tables and one groupBy(doc) emit
    * (doc_id, n_bigrams, avg_logp, log_w) together. Calling
    * [[bigramScore]] and [[dsirWeights]] separately tokenizes the corpus
    * twice and re-aggregates the raw count tables; at chain scale the
    * fusion halves the LM stage. Values are identical to the unfused
    * operators (same rows, same float32-cast means).
    */
  def bigramScoreWithDsir(docs: DataFrame, idCol: String, textCol: String,
      isTargetId: Column => Column): DataFrame = {
    val bg = bigrams(docs, idCol, textCol)
    val tBg = bg.filter(isTargetId(col("doc_id")))
    val c12r = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12r"))
    val c1r = bg.groupBy("w1").agg(count(lit(1)).as("c1r"))
    val c12t = tBg.groupBy("w1", "w2").agg(count(lit(1)).as("c12t"))
    val c1t = tBg.groupBy("w1").agg(count(lit(1)).as("c1t"))
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("x"))
    val vr = toks.agg(countDistinct(col("x")).as("vr"))
    val vt = toks.filter(isTargetId(col("doc_id")))
      .agg(countDistinct(col("x")).as("vt"))
    def lp(c12: Column, c1: Column, v: Column): Column =
      log((coalesce(c12, lit(0L)) + lit(1L)).cast("double") /
        (coalesce(c1, lit(0L)) + v).cast("double"))
    bg.join(c12r, Seq("w1", "w2"))
      .join(c1r, Seq("w1"))
      .join(c12t, Seq("w1", "w2"), "left")
      .join(c1t, Seq("w1"), "left")
      .crossJoin(broadcast(vr))
      .crossJoin(broadcast(vt))
      .select(col("doc_id"),
        lp(col("c12r"), col("c1r"), col("vr")).as("lpr"),
        (lp(col("c12t"), col("c1t"), col("vt")) -
          lp(col("c12r"), col("c1r"), col("vr"))).as("dlp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(col("lpr")).cast("float").as("avg_logp"),
        avg(col("dlp")).cast("float").as("log_w"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): log w(doc) = mean
    * ln P_target − mean ln P_raw per bigram, where P_target is trained on
    * the target-domain subset (`isTargetId` over the id column) and P_raw
    * on the whole corpus. Resampling the corpus by exp(lw) shifts it
    * toward the target domain — the standard curation move for domain-
    * matching pretraining data.
    *
    * One bigram extraction is shared by the raw counts, the target counts
    * (a filter of the same frame) and the scoring join, so the corpus is
    * tokenized exactly once; the four count tables join on token keys and
    * the two vocabulary sizes ride in as broadcast one-row frames. Target
    * counts join LEFT: bigrams/contexts unseen in the target hit the
    * add-one floor. Returns (doc_id, n_bigrams, log_w float32).
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      isTargetId: Column => Column): DataFrame = {
    val bg = bigrams(docs, idCol, textCol)
    val tBg = bg.filter(isTargetId(col("doc_id")))
    val c12r = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12r"))
    val c1r = bg.groupBy("w1").agg(count(lit(1)).as("c1r"))
    val c12t = tBg.groupBy("w1", "w2").agg(count(lit(1)).as("c12t"))
    val c1t = tBg.groupBy("w1").agg(count(lit(1)).as("c1t"))
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("x"))
    val vr = toks.agg(countDistinct(col("x")).as("vr"))
    val vt = toks.filter(isTargetId(col("doc_id")))
      .agg(countDistinct(col("x")).as("vt"))
    def lp(c12: Column, c1: Column, v: Column): Column =
      log((coalesce(c12, lit(0L)) + lit(1L)).cast("double") /
        (coalesce(c1, lit(0L)) + v).cast("double"))
    bg.join(c12r, Seq("w1", "w2"))
      .join(c1r, Seq("w1"))
      .join(c12t, Seq("w1", "w2"), "left")
      .join(c1t, Seq("w1"), "left")
      .crossJoin(broadcast(vr))
      .crossJoin(broadcast(vt))
      .select(col("doc_id"),
        (lp(col("c12t"), col("c1t"), col("vt")) -
          lp(col("c12r"), col("c1r"), col("vr"))).as("dlp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(col("dlp")).cast("float").as("log_w"))
  }
}
