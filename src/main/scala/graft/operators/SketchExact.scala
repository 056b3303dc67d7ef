package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Sketch-then-verify: EXACT answers whose first pass is a genuinely
  * sketching (evicting / compacting) mergeable summary, and whose second
  * pass verifies or refines the sketch's bounded candidate set exactly.
  *
  * This is the honest way to oracle-gate the sketch regimes: the output is
  * exact (hash-comparable against a SQL oracle, invariant to partitioning),
  * but a correct output is only reachable if the sketch's error guarantee
  * actually held — a broken eviction rule, merge rule, or compaction bound
  * surfaces as a loud failure or a wrong answer, not as silently-absorbed
  * approximation. Both operators are also the scale-right EXACT algorithms
  * at 100 TB: two scans with bounded state instead of a full-cardinality
  * shuffle (exact top-k) or a full range-shuffle sort (exact quantiles).
  */
object SketchExact {

  /** Exact top-k heavy hitters over a string column in two scans:
    *
    *  1. one scan builds a merged Space-Saving summary of `capacity`
    *     entries (map-side partials merge; the shuffle carries `capacity`
    *     rows per partition, never the key universe);
    *  2. the tracked items — a guaranteed superset of every item with true
    *     count above the summary's untracked-item bound m* (the minimum
    *     tracked estimate; Metwally et al.'s Space-Saving invariant,
    *     preserved under the Agarwal et al. merge rule) — are re-counted
    *     EXACTLY with a second scan filtered to those ≤ `capacity` keys,
    *     so the aggregate state is bounded by `capacity`, not by the
    *     column's cardinality.
    *
    * The result is certified: the k-th exact count must exceed m*, which
    * proves no untracked item could displace the reported top-k. If the
    * data is too flat for `capacity` (no certifiable top-k), this throws
    * rather than returning a plausible-but-unprovable answer.
    *
    * Output: (item, cnt) — exact, ordered by (cnt desc, item), k rows.
    */
  def topK(items: DataFrame, itemCol: String, k: Int, capacity: Int): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, SpaceSavingAgg}
    require(k < capacity, s"top-$k needs sketch capacity > $k, got $capacity")
    val spark = items.sparkSession
    val summary = items
      .agg(Bridge.column(SpaceSavingAgg(
          Bridge.expression(col(itemCol)), capacity)
        .toAggregateExpression()).as("hh"))
      .head().getSeq[Row](0)
    // Untracked-item bound: any item absent from the merged summary has
    // true count <= min tracked estimate (0 if the summary never filled —
    // then nothing was ever evicted and absent means never seen).
    val mStar =
      if (summary.size < capacity) 0L else summary.map(_.getLong(1)).min
    val candidates = summary.map(_.getString(0))
    // isin over <= capacity literals compiles to an O(1) InSet probe per
    // row; the filter sits directly above the item generator, so the
    // recount's aggregate hash map only ever sees candidate items
    val exact = items
      .filter(col(itemCol).isin(candidates: _*))
      .groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item"))
      .limit(k)
      .collect()
    require(exact.size == k,
      s"top-$k certification failed: only ${exact.size} candidates")
    val kth = exact.last.getLong(1)
    require(kth > mStar,
      s"top-$k certification failed: rank-$k exact count $kth does not " +
        s"exceed the sketch's untracked-item bound $mStar — the " +
        s"distribution is too flat for capacity $capacity; raise it")
    spark.createDataFrame(
      java.util.Arrays.asList(exact: _*),
      StructType(Seq(StructField("item", StringType),
        StructField("cnt", LongType, nullable = false))))
  }

  /** Exact quantiles of a numeric column WITHOUT a full sort: a compacting
    * KLL sketch brackets each target rank, then one exact pass counts rows
    * below the bracket and selects the target inside it.
    *
    *  1. one scan builds the merged KLL sketch (k doubles per level,
    *     O(k log n) state) and the exact row count n;
    *  2. for each quantile q with 1-based target rank t = max(ceil(q·n),1),
    *     the sketch's values at ranks t ± ε bracket the true value (ε =
    *     the KLL rank-error bound, taken with a safety factor); one exact
    *     scan computes cnt_lt = |v < lo| per target and the
    *     (t - cnt_lt)-th smallest value inside [lo, hi].
    *
    * The bracket is validated against the exact counts (cnt_lt < t ≤
    * cnt_lt + |bracket|); a violated bound widens the bracket and retries
    * (a sound sketch never needs it — the retry is the honest fallback,
    * not a correctness crutch). Bracket population is ≤ 2εn rows — at
    * 100 TB, size `k` so εn fits a partition sort (k=8192 → ε ≈ 0.2%).
    *
    * Output: one row, one DOUBLE column per (name, q) in `qs` — exact
    * order statistics, bit-identical under any partitioning.
    */
  def quantiles(df: DataFrame, valueCol: String,
      qs: Seq[(String, Double)], k: Int = 1024): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, KllSketchRawAgg}
    val spark = df.sparkSession
    val v = col(valueCol)
    // the rank-error bound of the uniform-capacity KLL variant:
    // each level-l compaction shifts any rank by <= 2^(l-1); level l fills
    // ~n/(k·2^l) times, so total error <= H·n/(2k), H = log2(n/k) levels.
    // Safety factor 2 on top (the alternating parity makes real error far
    // smaller; the validation loop below makes the choice non-critical).
    def epsRank(n: Long): Long = {
      val ratio = math.max(n.toDouble / k, 1.0)
      math.max(1L, (ratio * (log2(ratio) + 2.0)).toLong)
    }
    // pass 1 (ONE scan): merged raw sketch + exact non-null count; every
    // bracket probe and retry below queries the sketch on the driver
    val head = df.agg(
        count(v).as("n"),
        Bridge.column(KllSketchRawAgg(Bridge.expression(v.cast("double")),
          k = k).toAggregateExpression()).as("sk"))
      .head()
    val n = head.getLong(0)
    require(n > 0, "quantiles of an empty column")
    val sketch = KllSketchRawAgg.decode(head.getAs[Array[Byte]](1))
    var widen = 1L
    var out: Option[Seq[Double]] = None
    var attempt = 0
    while (out.isEmpty && attempt < 4) {
      val eps = epsRank(n) * widen
      val shifted = qs.flatMap { case (_, q) =>
        val t = math.max(math.ceil(q * n), 1.0)
        Seq(math.max((t - eps) / n, 0.0), math.min((t + eps) / n, 1.0))
      }
      val br = sketch.quantiles(shifted)
      val brackets = qs.indices.map(i => (br(2 * i), br(2 * i + 1)))
      // pass 2a: exact counts below each bracket's lo, one scan
      val cntAggs = brackets.zipWithIndex.map { case ((lo, _), i) =>
        sum(when(v < lo, 1L).otherwise(0L)).as(s"lt$i")
      }
      val cnts = df.agg(cntAggs.head, cntAggs.tail: _*).head()
      // pass 2b: select each target inside its bracket — the per-target
      // jobs are independent scans, submitted concurrently (wall = max,
      // not sum; same pattern as the q12 branch split)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val vals = Await.result(
        Future.sequence(qs.zipWithIndex.map { case ((_, q), i) => Future {
          val t = math.max(math.ceil(q * n).toLong, 1L)
          val (lo, hi) = brackets(i)
          val cntLt = cnts.getLong(i)
          if (cntLt >= t) None // bracket too high — sketch bound violated
          else {
            val need = (t - cntLt).toInt
            val inBr = df.filter(v >= lo && v <= hi).select(v.cast("double").as("v"))
            val got = inBr.orderBy(col("v")).limit(need)
              .agg(count(lit(1)).as("c"), max(col("v")).as("m")).head()
            if (got.getLong(0) < need) None // bracket too low/narrow
            else Some(got.getDouble(1))
          }
        }}), Duration.Inf)
      if (vals.forall(_.isDefined)) out = Some(vals.map(_.get))
      else { widen *= 4; attempt += 1 }
    }
    require(out.isDefined,
      s"quantile brackets failed validation after $attempt widenings — " +
        "KLL rank-error bound violated")
    val row = Row.fromSeq(out.get)
    spark.createDataFrame(java.util.Arrays.asList(row),
      StructType(qs.map { case (name, _) =>
        StructField(name, DoubleType, nullable = false) }))
  }

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)
}
