package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextAnalysis

/** Prefix-filtered set-similarity self-join (the AllPairs/PPJoin candidate
  * scheme; public formulation: Bayardo et al. 2007 "Scaling Up All Pairs
  * Similarity Search", Xiao et al. 2008 PPJoin): for a Jaccard threshold
  * τ, two sets can only match if they share a token among either set's
  * (n − ⌈τ·n⌉ + 1) GLOBALLY RAREST tokens — so the inverted index used for
  * candidate generation holds only that prefix (≈ (1−τ)·n tokens per set)
  * instead of every token, with zero false negatives at the threshold.
  *
  * Versus the full-index join (`Dedup.jaccardPairs`): the quadratic
  * group-explode step sees only prefix postings — at τ = 0.7 that is ~30%
  * of the postings and, because prefixes are the RAREST tokens, the hot
  * groups (common shingles) vanish from pair generation entirely, which is
  * the difference between a bounded and an exploding candidate count at
  * corpus scale. Verification is exact over the per-document shingle sets.
  */
object SetSimilarity {

  /** Width for the CPU-bound candidate+verify pipeline (round 14, guide
    * §2): everything downstream of the prefix-rank window — pair
    * generation, the candidate distinct, the exact `array_intersect`
    * verify and the member expansion — runs in ONE stage (the joins are
    * all broadcast and the distinct's (da, db) clustering is already
    * satisfied by the window's hash-by-id), so the window's exchange is
    * the single width knob for the whole kernel. That stage wants the
    * machine's kernel width (the `spark.graft.fanout` convention
    * `Tables.fanOut` documents), not the session's post-aggregation
    * shuffle sizing — profiled at sf0.1, q122's verify stage held 59% of
    * the query's wall at 8 tasks / 3.3× parallelism on 32 cores. The
    * explicit `repartition(width, $"id")` REPLACES the window's implicit
    * ENSURE_REQUIREMENTS exchange (hash-by-id either way: same shuffle
    * count, same bytes, wider), never adds one.
    */
  private def verifyWidth(df: DataFrame): Int =
    graft.core.Tables.kernelWidth(df.sparkSession)

  /** The contracted reps frame, projected to (id, text) and fanned to the
    * kernel width before shingling (round 15, VERDICT r14 #4): the sets
    * frame's persisted partitioning bounds the width of BOTH the shingle
    * kernel and the exact verify stage — the candidate side broadcasts, so
    * the verify streams over the cached sets frame, which inherited the
    * contraction window's post-agg shuffle sizing (profiled at sf0.1:
    * q94's verify = 47% of wall in a 4-partition stream). Guarded like
    * `Tables.fanOut`: fires only when the reps frame is under-split
    * relative to the kernel width, so a lake-scale read (already wide)
    * never pays the extra (id, text) exchange.
    */
  private def fannedReps(repDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val slim = repDf.select(col(idCol), col(textCol))
    val width = verifyWidth(repDf)
    if (slim.rdd.getNumPartitions * 2 > width) slim
    else slim.repartition(width, col(idCol))
  }

  /** Exact-duplicate contraction (round 12, found by the sf10 gate — see
    * `operators.Contraction` for the theorem and the scale argument): both
    * joins in this object run their candidate + verify pipeline on one
    * representative per distinct text and expand rep pairs to member pairs
    * afterwards. Sound here because every emitted number (inter, na, nb)
    * and every threshold predicate is a pure function of the two TEXTS,
    * and the prefix filter's zero-false-negative guarantee survives the
    * rep-level document frequencies: the AllPairs/PPJoin proof needs only
    * ONE fixed global token order shared by all sets — rarest-first is a
    * performance heuristic, not a correctness requirement. The
    * uncontracted q122 verify join, which carried the two full shingle
    * arrays per candidate, overflowed 78 GB of spill disk at sf10.
    */
  private def expand(repPairs: DataFrame, members: DataFrame,
      sets: DataFrame, ordered: Boolean): DataFrame = {
    val withinAux = sets.filter(col("n") >= 1)
      .select(col("id").as("__rep0"), col("n").cast("long").as("inter"),
        col("n").cast("long").as("na"), col("n").cast("long").as("nb"))
    val cross =
      if (ordered) Contraction.expandDirected(repPairs, members)
      else Contraction.expandUndirected(repPairs, members, Seq(("na", "nb")))
    cross.unionByName(
      Contraction.withinPairs(members, withinAux, ordered = ordered))
  }

  /** Document pairs (da < db) whose distinct word-`n`-gram shingle sets
    * have Jaccard ≥ tauNum/tauDen. Output: (da, db, inter, na, nb) — all
    * longs, exact (the threshold compare is an integer cross-
    * multiplication; no doubles anywhere).
    *
    * Plan shape: exact-duplicate contraction first (Contraction.byKey),
    * then the corpus of distinct texts is shingled ONCE into
    * (id, n, hash64) postings (16-byte keys through every exchange — the
    * raw n-grams never leave their scan; a 64-bit collision between two
    * shingles of a candidate pair is the same ~2^-64-per-pair risk
    * `Dedup.jaccardPairs` documents, and verification is over the string
    * sets, so it can only add a spurious candidate, never a wrong row).
    * Global rep-level document frequencies rank each document's postings
    * (one aggregate + one join + one window by id — all linear); only
    * `rn ≤ prefixLen` postings enter the inverted index that feeds pair
    * generation. Candidates are verified with an exact `array_intersect`
    * against the persisted shingle-set frame, joined id-to-id (AQE
    * broadcasts the candidate side when small); member expansion last.
    */
  def prefixJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen, s"bad threshold $tauNum/$tauDen")
    val (members, repDf) = Contraction.byKey(df, idCol,
      md5(col(textCol).cast("binary")))
    // (id, shs, n) — feeds prefix generation AND both verify sides
    val sets = fannedReps(repDf, idCol, textCol).select(col(idCol).as("id"),
        TextAnalysis.wordShingles(col(textCol), n).as("shs"))
      .withColumn("n", size(col("shs")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cand = prefixCandidates(sets, tauNum, tauDen)
    val a = sets.select(col("id").as("da"), col("shs").as("__sa"),
      col("n").cast("long").as("na"))
    val b = sets.select(col("id").as("db"), col("shs").as("__sb"),
      col("n").cast("long").as("nb"))
    val repPairs = cand.join(a, "da").join(b, "db")
      // PPJoin length filter: J(A,B) ≤ min(n)/max(n), so any pair whose
      // sizes differ by more than τ is pruned BEFORE the O(n) intersect
      .filter(lit(tauDen.toLong) * least(col("na"), col("nb")) >=
        lit(tauNum.toLong) * greatest(col("na"), col("nb")))
      .withColumn("inter", size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .filter(lit(tauDen.toLong) * col("inter") >=
        lit(tauNum.toLong) * (col("na") + col("nb") - col("inter")))
      .select(col("da"), col("db"), col("inter"), col("na"), col("nb"))
    expand(repPairs, members, sets, ordered = false)
  }

  /** Candidate (da < db) pairs from the prefix-filtered inverted index over
    * a (id, shs, n) set frame — exposed separately so callers can measure
    * or reuse the candidate set (the verify step is `Dedup.verifyPairs`-
    * shaped and lives in `prefixJaccardPairs`).
    */
  def prefixCandidates(sets: DataFrame, tauNum: Int, tauDen: Int): DataFrame = {
    val postings = sets
      .select(col("id"), col("n"), explode(col("shs")).as("__s"))
      .select(col("id"), col("n"), xxhash64(col("__s")).as("s"))
    val freq = postings.groupBy("s").agg(count(lit(1)).as("df"))
    // prefix length n − ⌈τ·n⌉ + 1, integer ceiling (the double division is
    // exact for set sizes < 2^26; cast truncation = floor for positives);
    // ranked rarest-first with the hash as the deterministic tie-break
    val prefLen = col("n") -
      ((lit(tauNum) * col("n") + lit(tauDen) - 1) / lit(tauDen)).cast("int") + lit(1)
    val w = Window.partitionBy("id").orderBy(col("df"), col("s"))
    val prefix = postings.join(freq, "s")
      .repartition(verifyWidth(sets), col("id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= prefLen)
      .select(col("id"), col("s"))
    Dedup.pairsWithinGroups(prefix, Seq("s")).distinct()
  }

  /** Directed containment pairs: (da, db) where at least tauNum/tauDen of
    * document da's distinct word-`n`-gram shingles also occur in db — the
    * subset-duplicate detector (a short doc pasted inside a longer one has
    * low Jaccard but containment ≈ 1, so the symmetric joins miss it).
    * Output (da, db, inter, na, nb), da ≠ db, exact integer threshold.
    *
    * Prefix filter, asymmetric form (Chaudhuri et al. 2006 SSJoin): only
    * the PROBE side prunes to its (n − ⌈τ·n⌉ + 1) rarest shingles — if
    * none of those hit B, fewer than τ·n of A's shingles can (zero false
    * negatives); the indexed side must stay full, because containment
    * puts no floor on where in B the overlap falls. The size filter
    * nb ≥ τ·na prunes candidates before the exact verify (|A∩B| ≤ nb).
    * Exchanges carry (id, hash64) postings — shingle strings never leave
    * their scan; the hash64-collision caveat of `prefixJaccardPairs`
    * applies identically (spurious candidate only, verification is over
    * the string sets).
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen, s"bad threshold $tauNum/$tauDen")
    val (members, repDf) = Contraction.byKey(df, idCol,
      md5(col(textCol).cast("binary")))
    val sets = fannedReps(repDf, idCol, textCol).select(col(idCol).as("id"),
        TextAnalysis.wordShingles(col(textCol), n).as("shs"))
      .withColumn("n", size(col("shs")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val postings = sets
      .select(col("id"), col("n"), explode(col("shs")).as("__s"))
      .select(col("id"), col("n"), xxhash64(col("__s")).as("s"))
    val freq = postings.groupBy("s").agg(count(lit(1)).as("df"))
    val prefLen = col("n") -
      ((lit(tauNum) * col("n") + lit(tauDen) - 1) / lit(tauDen)).cast("int") + lit(1)
    val w = Window.partitionBy("id").orderBy(col("df"), col("s"))
    val prefix = postings.join(freq, "s")
      .repartition(verifyWidth(df), col("id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= prefLen)
      .select(col("id").as("da"), col("n").cast("long").as("na"), col("s"))
    val full = postings.select(col("id").as("db"),
      col("n").cast("long").as("nb"), col("s"))
    val cand = prefix.join(full, "s")
      .filter(col("da") =!= col("db") &&
        lit(tauDen.toLong) * col("nb") >= lit(tauNum.toLong) * col("na"))
      .select("da", "db").distinct()
    val repPairs = cand
      .join(sets.select(col("id").as("da"), col("shs").as("__sa"),
        col("n").cast("long").as("na")), "da")
      .join(sets.select(col("id").as("db"), col("shs").as("__sb"),
        col("n").cast("long").as("nb")), "db")
      .withColumn("inter",
        size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .filter(lit(tauDen.toLong) * col("inter") >= lit(tauNum.toLong) * col("na"))
      .select(col("da"), col("db"), col("inter"), col("na"), col("nb"))
    expand(repPairs, members, sets, ordered = true)
  }
}
