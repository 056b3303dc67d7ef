package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation (builder brief
  * §LLM-data): reproducible subsets keyed on a CONTENT hash rather than a
  * seeded RNG — re-running the pipeline (any partitioning, any cluster
  * size, any engine) selects the same rows, which is how production
  * pipelines keep train/validation membership stable across reruns.
  *
  * Two shapes:
  *  - `hashThreshold`: keep rows whose md5(id) falls below the fraction
  *    cut of the hash space. ZERO shuffles — a pure filter in the scan —
  *    so it is the 100 TB default; per-stratum counts are binomial around
  *    fraction (exact in expectation, not in cardinality).
  *  - `stratifiedExact`: exactly ceil(fraction × |stratum|) rows per
  *    stratum — the hash-ORDER smallest ids win. Needs a per-stratum rank
  *    (ParallelRank.rowNumber — every stage parallel, no one-task-per-
  *    stratum sort) plus a stratum-size aggregate joined back.
  */
object Sampling {

  private def hashKey(idCol: String) = md5(col(idCol).cast("string"))

  /** Shuffle-free deterministic sample: md5's leading 15 hex digits as a
    * 60-bit integer compared against fraction × 2^60. Engine-portable (the
    * same rows selected by any md5 implementation).
    */
  def hashThreshold(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"bad fraction $fraction")
    val cut = (BigDecimal(2).pow(60) * fraction).toLong
    df.filter(conv(substring(hashKey(idCol), 1, 15), 16, 10).cast("long") < cut)
  }

  /** Exact stratified sample: per stratum, the ceil(fraction × n) rows with
    * the smallest content hashes. Deterministic and engine-replayable (the
    * oracle is a plain window rank over md5 order).
    */
  def stratifiedExact(df: DataFrame, strataCols: Seq[String], idCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"bad fraction $fraction")
    val keyed = df.withColumn("__sk", hashKey(idCol))
    // stratum sizes ride the rank's offsets broadcast (totalCol) instead
    // of a second scan + aggregate + join; strata are bounded by contract
    // (stratification over unbounded strata is meaningless), so the
    // driver-offsets dispatch applies too
    val ranked = ParallelRank.rowNumber(keyed, strataCols, "__sk", "__rn",
      totalCol = Some("__n"), smallGroupsHint = true)
    ranked
      .filter(col("__rn") <= ceil(col("__n") * fraction).cast("long"))
      .select(df.columns.map(col): _*) // original column order (the rank
                                       // fronts the strata key columns)
  }

  /** Deterministic priority sampling (Duffield/Lund/Thorup): a weighted
    * size-k sample with unbiased Horvitz-Thompson totals, on the same
    * content-hash determinism contract as the other samplers. Each row gets
    * priority p = w / u with u a hash-derived uniform in (0, 1]; the k
    * highest-priority rows win, and the (k+1)-th priority τ yields the HT
    * weight estimate max(w, τ) — summing `est_w` over the sample is an
    * unbiased estimate of sum(w) over the population.
    *
    * Bit-portability (the md5-replay rule every gated sampler follows):
    * u = (m+1)/2^52 with m the md5's leading 13 hex digits — m+1 ≤ 2^52 is
    * exactly representable, and the single division w/u is IEEE
    * correctly-rounded, so any engine replaying the formula selects the
    * same rows AND the same float bits. No ln(): the exponential-variates
    * formulation (Efraimidis-Spirakis) needs a transcendental whose last
    * ulp is libm-specific — priority sampling gives the same weighted-
    * inclusion guarantees on pure field ops.
    *
    * Scale: one scan + a bounded-heap `TopKByAgg` (k+1 tuples per map
    * partial — never a global sort), then a broadcast join fetches the
    * winners' rows. τ is derived in-plan from the same aggregate row.
    */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.graft.{Bridge, TopKByAgg}
    val m = conv(substring(hashKey(idCol), 1, 13), 16, 10).cast("long")
    val u = (m + lit(1L)).cast("double") / lit(4503599627370496.0) // 2^52
    val priority = col(weightCol).cast("double") / u
    val top = Bridge.column(TopKByAgg(
      Bridge.expression(priority),
      Bridge.expression(col(idCol).cast("long")),
      k + 1).toAggregateExpression())
    val agged = df.agg(top.as("__top"))
    // τ = the (k+1)-th priority when the population exceeds k, else 0
    // (every row sampled ⇒ est_w = w exactly).
    val winners = agged.select(
      when(size(col("__top")) > k, element_at(col("__top"), k + 1)("ord"))
        .otherwise(lit(0.0)).as("__tau"),
      posexplode(slice(col("__top"), 1, k)).as(Seq("__pos", "__e")))
      .select(col("__e")("id").as("__wid"), col("__tau"))
    df.join(winners, col(idCol).cast("long") === col("__wid"))
      .withColumn("est_w",
        greatest(col(weightCol).cast("double"), col("__tau")))
      .drop("__wid", "__tau")
  }

  /** Per-group quality quota: keep at most `quota` rows per group, the
    * highest `scoreCol` values winning (ties to the smallest `idCol`) —
    * the per-domain cap of corpus curation (no single source may dominate
    * the training mix). Implemented as a keyed window rank: each group
    * sorts within its shuffle partition, which is the right plan while a
    * single group's rows fit one partition (domains in a crawl; same shape
    * as the top-k-per-group query). For a pathologically hot group,
    * ParallelRank.rowNumber over a composite (group, score-desc) key ranks
    * in parallel — swap in when a domain exceeds partition budget.
    */
  /** Largest-remainder (Hamilton) apportionment of an integer budget across
    * categories by integer weight — the training-mix planner: given
    * per-source weights (token counts, doc counts), how many of `total`
    * training slots does each source get so that quotas sum EXACTLY to
    * `total` and deviate from proportionality by less than one seat?
    * base_i = ⌊total·w_i / W⌋; the seats left over go to the largest
    * remainders total·w_i mod W (ties to the first key ascending). All
    * integer arithmetic — bit-portable, no float shares anywhere.
    *
    * Input is the per-category weight frame (the caller's aggregate).
    * Output: (key..., wt, base_quota, extra_seat, quota). The frame is
    * category-grained — bounded like every apportionment table — so the
    * remainder ranking runs as one bounded window (the `smallOrdered`
    * convention); weights up to 2^31 and totals up to 2^31 stay exact in
    * the 64-bit products.
    */
  def apportionLargestRemainder(weights: DataFrame, keyCols: Seq[String],
      weightCol: String, total: Long): DataFrame = {
    require(total >= 0, s"total must be >= 0, got $total")
    import org.apache.spark.sql.expressions.Window
    val wt = col(weightCol).cast("long")
    // per-key base quota + remainder against the grand total
    val grand = weights.agg(sum(wt).as("__W"))
    val q = weights.crossJoin(broadcast(grand))
      .select(keyCols.map(col) :+ wt.as("wt") :+
        expr(s"($total * CAST($weightCol AS BIGINT)) DIV __W").as("__base") :+
        expr(s"($total * CAST($weightCol AS BIGINT)) % __W").as("__rem"): _*)
    val extra = q.agg((lit(total) - sum(col("__base"))).as("__extra"))
    val w = Window.orderBy(col("__rem").desc +: keyCols.map(col): _*)
    q.withColumn("__rr", row_number().over(w))
      .crossJoin(broadcast(extra))
      .select(keyCols.map(col) ++ Seq(col("wt"),
        col("__base").as("base_quota"),
        when(col("__rr") <= col("__extra"), 1L).otherwise(0L).as("extra_seat"),
        (col("__base") + when(col("__rr") <= col("__extra"), 1L)
          .otherwise(0L)).as("quota")): _*)
  }

  def qualityQuota(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      idCol: String, quota: Int): DataFrame = {
    require(quota >= 1, s"quota must be >= 1, got $quota")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= quota)
      .drop("__rk")
  }
}
