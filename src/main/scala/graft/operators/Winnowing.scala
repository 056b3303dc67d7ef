package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003 —
  * public algorithm): hash every word n-gram at its position, slide a
  * window of `w` consecutive gram hashes, and keep each window's minimum.
  * The selected set is a LOCAL fingerprint: any run of at least `w + n - 1`
  * shared tokens between two documents is guaranteed to contribute at least
  * one shared fingerprint, while only ~2/(w+1) of the gram hashes are kept.
  * This is the copy-detection primitive (MOSS) complementary to MinHash:
  * MinHash bounds GLOBAL set similarity; winnowing catches a single lifted
  * passage inside otherwise-unrelated documents.
  *
  * Scale shape: fingerprint extraction is one projection over the corpus
  * scan (no shuffle); the pair step groups (id, fp) rows by fingerprint —
  * one exchange of (long, long) rows, never text — and explodes bounded
  * in-group combinations exactly like the shingle pair-gen in
  * [[Dedup.jaccardPairs]]. Fingerprints shared by more than `maxFpFreq`
  * documents are boilerplate (license headers, navigation chrome) and are
  * cut BEFORE the quadratic step, so a hot fingerprint can never explode
  * the candidate count; the cut is part of the operator's contract and is
  * replayed by the SQL oracle.
  *
  * Gram hashes use the portable md5-derived 60-bit hash
  * ([[Dedup.tokenHash60]]) so an external engine replays them bit-exactly;
  * the per-gram md5 cost is the price of an engine-portable contract (an
  * engine-internal deployment would swap in xxhash64 — the fingerprint
  * GUARANTEE is hash-family-invariant, see the MinHash note at
  * `Dedup.minHashSignatures`).
  */
object Winnowing {

  /** Distinct (id, f) fingerprints per document: word n-gram hashes at
    * every position, window-of-`w` minima, deduplicated per document.
    * Documents shorter than n tokens contribute their whole text as one
    * gram; gram lists shorter than `w` yield their global minimum (the
    * standard short-input degenerations — both engines clamp the same
    * way).
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, w: Int = 8): DataFrame = {
    val ws = split(col(textCol), " ")
    // positional gram hashes: winnowing needs order and duplicates, so the
    // DISTINCT-set WordShingles kernel does not apply here
    val grams = transform(
      sequence(lit(1), greatest(size(ws) - lit(n - 1), lit(1))),
      i => Dedup.tokenHash60(concat_ws(" ", slice(ws, i, lit(n)))))
    val fps = array_distinct(transform(
      sequence(lit(1), greatest(size(col("__hl")) - lit(w - 1), lit(1))),
      j => array_min(slice(col("__hl"), j, lit(w)))))
    docs.select(col(idCol).as("id"), grams.as("__hl"))
      .select(col("id"), explode(fps).as("f"))
  }

  /** Document pairs (da < db) sharing at least `minShared` fingerprints,
    * with the shared count — the copy-suspect report. One exchange by
    * fingerprint (group sizes capped at `maxFpFreq`; singleton and
    * boilerplate groups never reach the pair walk), one by pair.
    */
  def sharedFingerprintPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, w: Int = 8, minShared: Long = 3L,
      maxFpFreq: Long = 50L): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, PairCombinations}
    val fp = fingerprints(docs, idCol, textCol, n, w)
    // same fan-out override as Dedup.pairsWithinGroups: the group+explode is
    // the CPU-heavy step, so when the bench pins post-agg shuffles narrow,
    // THIS exchange stays at scan width
    val keyed = fp.sparkSession.conf.getOption("spark.graft.fanout")
      .map(k => fp.repartition(k.toInt, col("f")))
      .getOrElse(fp)
    val grouped = keyed.groupBy(col("f"))
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxFpFreq))
    grouped.select(explode(
        Bridge.column(PairCombinations(Bridge.expression(col("ids"))))).as("p"))
      .select(col("p.da").as("da"), col("p.db").as("db"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
