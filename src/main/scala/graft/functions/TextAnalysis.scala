package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders (training-data-pipeline surface): token
  * counting, subword-ish token counting, stopword/quality features, word
  * n-gram shingles, language scoring and deterministic fingerprints.
  *
  * Everything here is composed from codegen'd Catalyst built-ins — no UDFs —
  * so the operators scale linearly over the documents table with whole-stage
  * codegen intact. All helpers are plain `Column` transforms: usable in any
  * select/groupBy, streaming or batch.
  */
object TextAnalysis {

  /** Whitespace tokens (single-space convention of the documents table). */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count without materializing the token array: split-with-limit -1
    * keeps empty tokens, so the count is exactly spaces + 1 — length minus
    * space-stripped length. Pure codegen'd built-ins.
    */
  def tokenCount(text: Column): Column =
    length(text) - length(translate(text, " ", "")) + lit(1)

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * non-alphanumeric marks — the usual cheap proxy for LLM token counts.
    * regexp_count counts matches without building the match array.
    */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))

  /** Number of tokens that appear in `words` (duplicates counted). Native
    * codegen'd expression — the higher-order filter/array_contains form is
    * interpreted per token.
    */
  def wordHitCount(text: Column, words: Seq[String]): Column = {
    import org.apache.spark.sql.graft.{Bridge, TextHitCount}
    Bridge.column(TextHitCount(Bridge.expression(text), words))
  }

  /** Default English stopword sample used by the quality score. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  def stopwordRatio(text: Column): Column =
    wordHitCount(text, Stopwords).cast("double") / tokenCount(text)

  /** Share of non-alphanumeric, non-space characters — the punctuation/
    * symbol density feature of the quality score.
    */
  def punctRatio(text: Column): Column =
    regexp_count(text, lit("[^a-z0-9 ]")).cast("double") / length(text)

  /** Heuristic document-quality score in [0, 1] (builder brief: "quality
    * scoring — length/punct/stopword ratios"): prose-like stopword share
    * (peak at 0.35), natural mean token length (peak at 5 chars) and low
    * symbol density, linearly penalized and weighted 0.4/0.3/0.3. All
    * codegen'd built-ins; deterministic double arithmetic, so SQL oracles
    * reproduce it bit-exactly.
    */
  def qualityScore(text: Column): Column = {
    def closeness(v: Column, peak: Double): Column =
      lit(1.0) - least(lit(1.0), abs(v - lit(peak)) / lit(peak))
    closeness(stopwordRatio(text), 0.35) * 0.4 +
      closeness(meanTokenLength(text), 5.0) * 0.3 +
      (lit(1.0) - least(lit(1.0), punctRatio(text) / lit(0.3))) * 0.3
  }

  /** Mean token length, derived from char count (single-space separation:
    * chars = sum(len) + n_tokens - 1).
    */
  def meanTokenLength(text: Column): Column =
    (length(text) - tokenCount(text) + lit(1)).cast("double") / tokenCount(text)

  /** Distinct word n-gram shingles, the MinHash/Jaccard unit. Guarded to an
    * empty array for texts shorter than n tokens. Backed by the native
    * codegen'd WordShingles expression — the composed higher-order form
    * (transform/sequence/element_at) is interpreted per element and ~15×
    * slower on this hot path.
    */
  def wordShingles(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.{Bridge, WordShingles}
    Bridge.column(WordShingles(Bridge.expression(text), n))
  }

  /** Overlapping token-window chunks (size/stride) — the document chunker
    * ahead of sequence packing. Native one-pass kernel.
    */
  /** Per-document adjacent char-pair counts within tokens (BPE merge-scan
    * kernel): array<struct<p,c>> of DISTINCT pairs with multiplicities —
    * the per-row combiner that keeps the corpus pair aggregate's explode
    * bounded by alphabet², not character count. Native one-pass kernel.
    */
  def charPairCounts(text: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, CharPairCounts}
    Bridge.column(CharPairCounts(Bridge.expression(text)))
  }

  def wordChunks(text: Column, size: Int, stride: Int): Column = {
    import org.apache.spark.sql.graft.{Bridge, WordChunks}
    Bridge.column(WordChunks(Bridge.expression(text), size, stride))
  }

  /** Marker lexicons for the lightweight language-ID heuristic. Order is the
    * deterministic tie-break (first wins on >=).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "la", "los"),
    "fr" -> Seq("le", "la", "les"))

  /** Predicted language = argmax of marker hit counts, ties resolved in
    * LangMarkers order, final fallback = first language.
    */
  def predictLang(text: Column): Column = {
    val scores = LangMarkers.map { case (l, ws) => l -> wordHitCount(text, ws) }
    // when-chain: lang_i wins iff its score >= every later score.
    scores.zipWithIndex.init.foldRight(lit(scores.last._1)) {
      case ((((l, s), i)), elseCol) =>
        val later = scores.drop(i + 1).map(_._2)
        when(later.map(s >= _).reduce(_ && _), lit(l)).otherwise(elseCol)
    }
  }

  /** Deterministic 128-bit content fingerprint (hex md5 of the utf-8 text) —
    * the exact-dedup key. Identical across engines (md5 is md5).
    */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  // --- Repetition quality (Gopher-style filters) -----------------------

  /** Distinct-word share of the document: |distinct tokens| / |tokens|.
    * Low values mean the document keeps repeating the same words — the
    * classic boilerplate / SEO-spam signal of LLM-corpus quality filtering.
    */
  def distinctWordRatio(text: Column): Column =
    size(array_distinct(tokens(text))).cast("double") / tokenCount(text)

  /** Frequency of the single most-common token (native one-pass kernel). */
  def maxTokenFreq(text: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, MaxTokenFreq}
    Bridge.column(MaxTokenFreq(Bridge.expression(text)))
  }

  /** Share of the document taken by its most-common word. */
  def topWordRatio(text: Column): Column =
    maxTokenFreq(text).cast("double") / tokenCount(text)

  /** Share of word bigrams that are repeats of an earlier bigram in the same
    * document: 1 - |distinct bigrams| / (n_tokens - 1). Zero for documents
    * of fewer than 3 tokens (0 or 1 bigram can't repeat).
    */
  def dupBigramFraction(text: Column): Column = {
    val total = tokenCount(text) - lit(1)
    when(total <= 1, lit(0.0))
      .otherwise(lit(1.0) -
        size(wordShingles(text, 2)).cast("double") / total.cast("double"))
  }

  /** Polynomial rolling hash of the text (base 31, mod 1e9+7) via the
    * higher-order aggregate — a seedless, portable alternative fingerprint
    * usable where a numeric key is wanted. Codegen-friendly (no UDF).
    */
  def rollingHash(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (h, c) => pmod(h * lit(31L) + ascii(c), lit(1000000007L)))
}
