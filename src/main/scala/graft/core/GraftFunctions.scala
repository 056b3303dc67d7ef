package graft.core

import org.apache.spark.sql.SparkSession

/** SQL registration of the engine's native expressions, making them
  * first-class in the `spark.sql` entry point (SURVEY.md §3.3):
  *
  *   SELECT cosine_sim(a.embedding, b.embedding), word_shingles(text, 3),
  *          text_hit_count(text, 'the,a'), histogram_sketch(value, 256) ...
  */
object GraftFunctions {

  def registerAll(spark: SparkSession): Unit = {
    import org.apache.spark.sql.graft._
    val registry = spark.sessionState.functionRegistry

    registry.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("dot_product",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("word_shingles",
      exprs => WordShingles(exprs(0), foldableInt(exprs(1), "word_shingles(n)")),
      "built-in")
    registry.createOrReplaceTempFunction("text_hit_count",
      exprs => TextHitCount(exprs(0),
        foldableString(exprs(1), "text_hit_count(words)").split(",").toSeq),
      "built-in")
    registry.createOrReplaceTempFunction("pair_combinations",
      exprs => PairCombinations(exprs(0)), "built-in")
    registry.createOrReplaceTempFunction("histogram_sketch",
      exprs => HistogramSketchAgg(exprs(0),
        foldableInt(exprs(1), "histogram_sketch(maxBins)"))
        .toAggregateExpression(), "built-in")
    registry.createOrReplaceTempFunction("byte_histogram",
      exprs => ByteHistogram(exprs(0)), "built-in")
    registry.createOrReplaceTempFunction("dot_product_fd",
      exprs => DotProductFD(exprs(0), exprs(1)), "built-in")
    // minhash_signature(hashedToken, numPerm, seed): same permutation
    // family as Dedup.minHashSignatures (seeded universal hashes mod p)
    registry.createOrReplaceTempFunction("minhash_signature",
      exprs => {
        val numPerm = foldableInt(exprs(1), "minhash_signature(numPerm)")
        val seed = foldableInt(exprs(2), "minhash_signature(seed)").toLong
        MinHashSigAgg(exprs(0),
          graft.operators.Dedup.permParams(numPerm, seed),
          graft.operators.Dedup.Modulus).toAggregateExpression()
      }, "built-in")
    registry.createOrReplaceTempFunction("simhash",
      exprs => SimHashSigAgg(exprs(0)).toAggregateExpression(), "built-in")
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
