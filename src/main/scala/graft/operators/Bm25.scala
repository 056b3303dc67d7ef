package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** BM25 keyword scoring over a document corpus — the retrieval side of a
  * training-data pipeline (benchmark decontamination lookups, quality
  * slicing by topic, hard-negative mining all start with "top-k documents
  * for these terms").
  *
  * Scale design: per-term tf is the native one-pass TextHitCount kernel, so
  * scoring a query of m terms is one codegen'd scan of the corpus — no
  * tokenized explode, no inverted-index shuffle. The corpus statistics
  * (N, avg doc length, per-term document frequencies) reduce to ONE
  * single-row aggregate that broadcasts back; the big side never shuffles.
  * Top-k is TakeOrderedAndProject (per-partition heaps + driver merge of k
  * rows). For persistent many-query serving an inverted index (explode +
  * groupBy token) amortizes better; for pipeline-style ad-hoc scoring the
  * scan form is strictly cheaper at any corpus size.
  *
  * Determinism: the classic BM25 idf is ln((N-df+0.5)/(df+0.5)); `ln` is not
  * bit-guaranteed identical across math libraries, so cross-engine oracles
  * could flip last-ulp. We use the rational idf (N-df+0.5)/(df+0.5) — all
  * IEEE +,*,/ ops, bit-exact everywhere. Ranking equivalence to ln-idf
  * BM25 holds for SINGLE-term queries only (ln is monotone, so the
  * per-term ordering is preserved); for multi-term queries the SUM of
  * rational-idf contributions weights rare terms far more heavily than the
  * log-damped classic score and can order documents differently. That is
  * an intentional trade — this operator's contract is its own (oracle-
  * checked) scoring function, not numeric classic-BM25 parity; callers who
  * need reference-faithful multi-term ranking should substitute an ln idf
  * and accept engine-local last-ulp variance.
  */
object Bm25 {

  /** (doc_id, dl, score) for every document, BM25-scored against `terms`
    * with the rational idf. k1/b are the standard defaults.
    */
  def scored(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val text = col(textCol)
    val cols =
      col(idCol).as("doc_id") +:
        TextAnalysis.tokenCount(text).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          TextAnalysis.wordHitCount(text, Seq(t)).cast("long").as(s"tf$i")
        }
    val base = docs.select(cols: _*)

    // ONE single-row stats aggregate: N, Σdl, per-term df — broadcasts back
    val statAggs =
      Seq(count(lit(1)).as("n"), sum(col("dl")).as("sumdl")) ++
        terms.indices.map(i =>
          sum((col(s"tf$i") > 0).cast("long")).as(s"df$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)

    val withStats = base.crossJoin(broadcast(stats))
    val avgdl = col("sumdl").cast("double") / col("n")
    def contrib(i: Int): Column = {
      val tf = col(s"tf$i"); val df = col(s"df$i"); val n = col("n")
      // parenthesization mirrors the SQL oracle text exactly — every op is
      // IEEE +,*,/ in the same order, so the doubles are bit-identical
      (n - df + lit(0.5)) / (df + lit(0.5)) *
        (tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / avgdl)))
    }
    withStats.select(col("doc_id"), col("dl"),
      terms.indices.map(contrib).reduce(_ + _).as("score"))
  }

  /** Top-k search: highest-scoring k documents, ties broken by doc_id. */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame =
    scored(docs, idCol, textCol, terms)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
}
