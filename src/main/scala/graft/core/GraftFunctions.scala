package graft.core

import org.apache.spark.sql.SparkSession

/** SQL registration of the engine's native expressions, making them
  * first-class in the `spark.sql` entry point (SURVEY.md §3.3):
  *
  *   SELECT cosine_sim(a.embedding, b.embedding), word_shingles(text, 3),
  *          text_hit_count(text, 'the,a'), histogram_sketch(value, 256) ...
  */
object GraftFunctions {

  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.graft._

  /** Name → expression builder for every native function — the single
    * source of truth shared by per-session registration (`registerAll`)
    * and config-time injection (GraftExtensions).
    */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" ->
      ((exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))),
    "dot_product" ->
      ((exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))),
    "dot_product_fd" ->
      ((exprs: Seq[Expression]) => DotProductFD(exprs(0), exprs(1))),
    "word_shingles" -> ((exprs: Seq[Expression]) =>
      WordShingles(exprs(0), foldableInt(exprs(1), "word_shingles(n)"))),
    "text_hit_count" -> ((exprs: Seq[Expression]) =>
      TextHitCount(exprs(0),
        foldableString(exprs(1), "text_hit_count(words)").split(",").toSeq)),
    "pair_combinations" ->
      ((exprs: Seq[Expression]) => PairCombinations(exprs(0))),
    "byte_histogram" ->
      ((exprs: Seq[Expression]) => ByteHistogram(exprs(0))),
    "histogram_sketch" -> ((exprs: Seq[Expression]) =>
      HistogramSketchAgg(exprs(0),
        foldableInt(exprs(1), "histogram_sketch(maxBins)"))
        .toAggregateExpression()),
    // minhash_signature(hashedToken, numPerm, seed): same permutation
    // family as Dedup.minHashSignatures (seeded universal hashes mod p)
    "minhash_signature" -> ((exprs: Seq[Expression]) => {
      val numPerm = foldableInt(exprs(1), "minhash_signature(numPerm)")
      val seed = foldableInt(exprs(2), "minhash_signature(seed)").toLong
      MinHashSigAgg(exprs(0),
        graft.operators.Dedup.permParams(numPerm, seed),
        graft.operators.Dedup.Modulus).toAggregateExpression()
    }),
    "simhash" ->
      ((exprs: Seq[Expression]) => SimHashSigAgg(exprs(0)).toAggregateExpression()),
    // portable_sign_bits(emb, numPlanes, dim): packed sign-LSH bits against
    // the md5-derived portable hyperplane family (one fused projection pass)
    "portable_sign_bits" -> ((exprs: Seq[Expression]) =>
      SignProjectionBits(exprs(0),
        graft.operators.Ann.portableHyperplanes(
          foldableInt(exprs(2), "portable_sign_bits(dim)"),
          foldableInt(exprs(1), "portable_sign_bits(numPlanes)")).toArray)),
    "max_token_freq" ->
      ((exprs: Seq[Expression]) => MaxTokenFreq(exprs(0))),
    "word_chunks" -> ((exprs: Seq[Expression]) =>
      WordChunks(exprs(0), foldableInt(exprs(1), "word_chunks(size)"),
        foldableInt(exprs(2), "word_chunks(stride)"))),
    // heavy_hitters(item, capacity): mergeable Space-Saving summary
    "heavy_hitters" -> ((exprs: Seq[Expression]) =>
      SpaceSavingAgg(exprs(0),
        foldableInt(exprs(1), "heavy_hitters(capacity)"))
        .toAggregateExpression()),
    // topk_by(ord, id, k): bounded-heap top-k (ord desc, ties to lower id)
    "topk_by" -> ((exprs: Seq[Expression]) =>
      TopKByAgg(exprs(0), exprs(1), foldableInt(exprs(2), "topk_by(k)"))
        .toAggregateExpression()),
    // kll_quantiles(v, k, 'q1,q2,...'): single-pass mergeable quantile sketch
    "kll_quantiles" -> ((exprs: Seq[Expression]) =>
      KllSketchAgg(exprs(0),
        foldableInt(exprs(1), "kll_quantiles(k)"),
        foldableString(exprs(2), "kll_quantiles(qs)")
          .split(",").toSeq.map(_.trim.toDouble))
        .toAggregateExpression())
  )

  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      registry.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  private def foldableInt(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  private def foldableString(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): String = {
    require(e.foldable, s"$what must be a literal")
    e.eval().toString
  }
}
