package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Benchmark decontamination for training corpora (builder brief §LLM-data:
  * the standard pre-training hygiene step — drop or flag training documents
  * that overlap an evaluation benchmark, so the model isn't graded on its
  * own training set).
  *
  * Method: n-gram containment (the GPT-3/C4-style check): a training
  * document is contaminated iff at least `minHits` of the benchmark's
  * distinct n-gram shingles appear among the document's shingles.
  *
  * Scale design: the BENCHMARK side is small by construction (an eval set,
  * not a corpus) — its distinct shingle set broadcasts; the corpus side is
  * one scan producing (doc, shingle) rows that inner-join the broadcast and
  * re-aggregate per document. The corpus never shuffles: the only exchange
  * is the per-doc hit count aggregate, keyed on the doc id (and with
  * map-side partial aggregation the shuffle carries at most one row per
  * (partition, doc)). At 100 TB this is a single pass over the corpus.
  */
object Decontamination {

  /** Per-document contamination report: (idCol, n_shingles, n_hits,
    * containment = n_hits / n_shingles — the fraction of the DOCUMENT's
    * distinct shingles that appear in the benchmark — and the
    * `contaminated` flag at `minHits`). `n` = shingle width (word n-grams).
    */
  def report(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, benchTextCol: String, n: Int = 3,
      minHits: Long = 1L): DataFrame = {
    // distinct benchmark shingles — a driver-size set by construction;
    // broadcast so the corpus side stays shuffle-free
    val benchShingles = benchmark
      .select(explode(TextAnalysis.wordShingles(col(benchTextCol), n)).as("s"))
      .distinct()
    val docShingles = corpus.select(col(idCol).as("__id"),
      TextAnalysis.wordShingles(col(textCol), n).as("__shs"))
      .select(col("__id"), size(col("__shs")).as("n_shingles"),
        explode_outer(col("__shs")).as("s"))
    val hits = docShingles
      .join(broadcast(benchShingles.withColumn("__hit", lit(1L))), Seq("s"), "left")
      .groupBy(col("__id"), col("n_shingles"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
    hits.select(
      col("__id").as(idCol),
      col("n_shingles").cast("long").as("n_shingles"),
      col("n_hits"),
      when(col("n_shingles") > 0,
        col("n_hits").cast("double") / col("n_shingles"))
        .otherwise(lit(0.0)).as("containment"),
      (col("n_hits") >= minHits).as("contaminated"))
  }

  /** The filtered corpus: rows of `corpus` NOT contaminated (the production
    * shape — report() is the audit view). One broadcast semi-join world:
    * contaminated ids are found as in `report` and anti-joined back.
    */
  def clean(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, benchTextCol: String, n: Int = 3,
      minHits: Long = 1L): DataFrame = {
    val bad = report(corpus, benchmark, idCol, textCol, benchTextCol, n, minHits)
      .filter(col("contaminated"))
      .select(col(idCol))
    corpus.join(bad, Seq(idCol), "left_anti")
  }
}
