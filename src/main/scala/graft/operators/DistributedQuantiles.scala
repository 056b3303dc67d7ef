package graft.operators

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Exact per-group interpolated quantiles (and full describe stats) as two
  * light jobs over ONE shuffle — the canonical distributed order-statistics
  * plan:
  *
  *   1. collapse to distinct (group, value, count) — map-side combine, so
  *      repeated values never shuffle;
  *   2. range-repartition + sort within partitions on (group, value):
  *      partition p holds a contiguous, locally sorted slice of each
  *      group's value range;
  *   3. job 1: per-(partition, group) counts and moment partials
  *      (P × G tuples to the driver);
  *   4. driver: exclusive prefix sums locate, for every quantile bound
  *      rank = floor/ceil((n-1)q)+1, the exact partition and local rank;
  *   5. job 2: each partition walks its sorted slice once and emits just
  *      its bound values. Job 2 REUSES job 1's shuffle files (same RDD),
  *      so the pass costs one partition scan, no second exchange.
  *
  * Compared to expressing the same thing in SQL (ParallelRank.quantiles),
  * this runs 2 jobs instead of ~8 adaptive stages; at scale the work is
  * identical, and every stage is parallel — no one-task-per-group window
  * sort anywhere. Interpolation matches DuckDB's quantile_cont
  * (`(n-1)*q` two-row weighting). Null values must be pre-filtered.
  *
  * `describe` additionally returns n/mean/std/min/max from the job-1
  * partials (no second scan). Its stddev uses the sum-of-squares identity
  * over exact per-value counts — within ~1e-14 relative of the Welford
  * merge, i.e. identical after the float32 cast the metric contracts use.
  */
object DistributedQuantiles {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Job 1 collects O(P × G) per-(partition, group) partials to the driver —
    * the right trade at metric grain (G ≤ thousands), a driver OOM at
    * millions of groups. Above this budget `run` routes to the all-DataFrame
    * `ParallelRank.quantiles` path instead (identical results, no driver
    * state). P is bounded by the configured shuffle partitions.
    */
  val DriverPartialsBudget: Long = 1L << 20

  /** Upper bound on distinct (group, value) pairs for the driver-histogram
    * fast path (`distinctValueHint`): one map-side-combine aggregate, the
    * collapsed histogram collected, order statistics computed on the driver.
    * No range shuffle, no boundary-sampling job, no second pass — the right
    * plan for bounded value grids (enum/integer/currency-grain columns),
    * where the histogram is small NO MATTER the row count. 128k pairs ≈ a
    * few MB of driver rows.
    */
  val SmallHistogramBudget: Long = 1L << 17

  /** Default for `spark.graft.quantiles.smallInputBytes`: inputs whose
    * optimizer size estimate is at or under this take the one-job
    * driver-histogram path regardless of value cardinality (the collapsed
    * histogram can't exceed the input). 32 MB of input is at most a few
    * hundred MB of driver-side Row objects — comfortably inside any real
    * driver, and two orders of magnitude under where the distributed paths
    * start to win.
    */
  val SmallInputBytesDefault: Long = 1L << 25

  /** (group..., <qname>...) exact interpolated quantiles.
    *
    * `groupCountHint`: expected number of distinct groups. When absent, a
    * one-column `approx_count_distinct` pre-pass estimates it (cheap —
    * map-side partials only — but it is an extra scan; callers that know
    * their grain pass the hint).
    *
    * `distinctValueHint`: expected number of distinct (group, value) pairs.
    * When the caller knows the value column lives on a bounded grid (an
    * enum code, an integer score, a currency amount with fixed decimals),
    * pass it: at or under `SmallHistogramBudget` the whole computation is
    * one aggregate job (see there). Like `groupCountHint` this is a plan
    * hint, never a semantic change — results are identical either way
    * (QuantileDispatchSpec asserts it).
    */
  def exact(df: DataFrame, groupCols: Seq[String], valueCol: String,
      qs: Seq[(String, Double)], groupCountHint: Option[Long] = None,
      preCollapse: Boolean = true,
      distinctValueHint: Option[Long] = None): DataFrame =
    run(df, groupCols, valueCol, qs, withMoments = false, groupCountHint,
      preCollapse, distinctValueHint)

  /** (group..., n, mean, std, vmin, vmax, <qname>...): describe() in the
    * same two jobs. `groupCountHint`/`distinctValueHint` as in `exact`.
    *
    * `preCollapse`: collapse to distinct (group, value, count) before the
    * range shuffle (default). Right when values repeat (enum/integer-grain
    * columns — repeats never shuffle); for near-unique continuous columns
    * the collapse shuffles the same volume TWICE (aggregate exchange +
    * range exchange), so callers pass false to range-shuffle raw rows once.
    */
  def describe(df: DataFrame, groupCols: Seq[String], valueCol: String,
      qs: Seq[(String, Double)], groupCountHint: Option[Long] = None,
      preCollapse: Boolean = true,
      distinctValueHint: Option[Long] = None): DataFrame =
    run(df, groupCols, valueCol, qs, withMoments = true, groupCountHint,
      preCollapse, distinctValueHint)

  private final class GroupAgg(var cnt: Long = 0L, var sumV: Double = 0.0,
    var sumV2: Double = 0.0, var min: Double = Double.PositiveInfinity,
    var max: Double = Double.NegativeInfinity) extends Serializable

  private def run(df: DataFrame, groupCols: Seq[String], valueCol: String,
      qs: Seq[(String, Double)], withMoments: Boolean,
      groupCountHint: Option[Long], preCollapse: Boolean = true,
      distinctValueHint: Option[Long] = None): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    if (distinctValueHint.exists(_ <= SmallHistogramBudget)) {
      log.info(s"DistributedQuantiles: ~${distinctValueHint.get} distinct " +
        "(group, value) pairs within histogram budget; computing order " +
        "statistics from the collapsed histogram on the driver (one job)")
      return viaDriverHistogram(df, groupCols, valueCol, qs, withMoments)
    }
    // Small-INPUT regime (no hint needed): the optimizer's size estimate for
    // the input plan is free driver-side metadata (parquet footer bytes
    // scaled by column pruning — no job runs). When the whole input is at
    // most `smallInputBytes`, the collapsed (group, value, count) frame is
    // driver-bounded by the input itself, so the one-job driver-histogram
    // path is safe even for near-unique continuous columns the
    // distinctValueHint can't honestly cover. This is the same dispatch
    // shape a single-node engine applies implicitly; at lake scale the
    // estimate is astronomically over the budget and the distributed paths
    // below always run. Set spark.graft.quantiles.smallInputBytes=0 to
    // disable (QuantileDispatchSpec pins the distributed paths this way).
    val smallBytes = spark.conf
      .getOption("spark.graft.quantiles.smallInputBytes")
      .map(_.toLong).getOrElse(SmallInputBytesDefault)
    // Two eligibility guards on the byte gate:
    //  - size-only stats do NOT model generator fan-out (explode over a
    //    20 MB scan can be gigabytes of rows at an under-budget estimate),
    //    so any Generate in the plan disqualifies the driver path;
    //  - the driver comparator orders group keys via j.l.Comparable, so
    //    only atomic group-key types qualify (struct/array keys keep the
    //    distributed paths, which order them natively).
    val smallInputEligible = smallBytes > 0 &&
      df.queryExecution.optimizedPlan.stats.sizeInBytes <= smallBytes &&
      df.queryExecution.optimizedPlan.collectFirst {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }.isEmpty &&
      groupCols.forall(c => df.schema(c).dataType match {
        case _: org.apache.spark.sql.types.NumericType => true
        case StringType | org.apache.spark.sql.types.BooleanType |
             org.apache.spark.sql.types.DateType |
             org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType => true
        case _ => false
      })
    if (smallInputEligible) {
      log.info("DistributedQuantiles: input estimated at " +
        s"${df.queryExecution.optimizedPlan.stats.sizeInBytes} bytes <= " +
        s"$smallBytes; sorting distributed and walking the collected rows " +
        "on the driver (one job)")
      return viaSortedCollect(df, groupCols, valueCol, qs, withMoments)
    }
    val estGroups: Long =
      if (groupCols.isEmpty) 1L
      else groupCountHint.getOrElse {
        df.agg(approx_count_distinct(struct(groupCols.map(col): _*)))
          .first().getLong(0)
      }
    if (estGroups * parts > DriverPartialsBudget) {
      log.info(s"DistributedQuantiles: ~$estGroups groups x $parts partitions " +
        s"exceeds driver-partials budget $DriverPartialsBudget; dispatching to " +
        "ParallelRank.quantiles (all-DataFrame path)")
      return viaParallelRank(df, groupCols, valueCol, qs, withMoments)
    }
    val gcols = groupCols.map(col)
    val perValue =
      if (preCollapse) df
        .groupBy(gcols :+ col(valueCol).cast("double").as("__v"): _*)
        .agg(count(lit(1)).as("__cnt"))
      else df.select(gcols ++ Seq(col(valueCol).cast("double").as("__v"),
        lit(1L).as("__cnt")): _*)
    val keys = gcols :+ col("__v")
    // No explicit partition count: AQE's partition coalescing sizes the
    // range exchange to the actual distinct-value frame — one task when the
    // collapse leaves kilobytes (metric-grain describe), the configured
    // parallelism when values are near-unique. Coalescing merges ADJACENT
    // range partitions, so global sort order across partitions is preserved
    // and the two-job offset arithmetic below is unaffected.
    val sorted = perValue.repartitionByRange(keys: _*)
      .sortWithinPartitions(keys: _*)
      .select(gcols ++ Seq(col("__v"), col("__cnt")): _*)
    val g = groupCols.length
    // ONE rdd object: job 2 skips the shuffle map stage job 1 computed, and
    // the range boundaries are fixed in the RDD graph (retry-deterministic).
    // Persisted across the two jobs — without it job 2 re-reads the shuffle
    // AND re-runs the within-partition sort (measured ~40% of the pass);
    // MEMORY_AND_DISK so an oversized distinct-value frame spills instead
    // of evicting, and the unpersist below is unconditional.
    val rdd = sorted.rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {

    // job 1: per-(partition, group) value-mass counts + moment partials
    val partStats: Array[(Int, Seq[(Seq[Any], GroupAgg)])] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val m = mutable.LinkedHashMap[Seq[Any], GroupAgg]()
        it.foreach { r =>
          val k: Seq[Any] = (0 until g).map(r.get)
          val v = r.getDouble(g)
          val c = r.getLong(g + 1)
          val a = m.getOrElseUpdate(k, new GroupAgg)
          a.cnt += c
          a.sumV += v * c
          a.sumV2 += v * v * c
          if (v < a.min) a.min = v
          if (v > a.max) a.max = v
        }
        Iterator.single(pid -> m.toSeq)
      }.collect()

    // driver: totals, exclusive prefix offsets, target (rank, weight) pairs
    val totals = mutable.LinkedHashMap[Seq[Any], GroupAgg]()
    partStats.sortBy(_._1).foreach { case (_, m) =>
      m.foreach { case (k, a) =>
        val t = totals.getOrElseUpdate(k, new GroupAgg)
        t.cnt += a.cnt; t.sumV += a.sumV; t.sumV2 += a.sumV2
        if (a.min < t.min) t.min = a.min
        if (a.max > t.max) t.max = a.max
      }
    }
    val localTargets = mutable.Map[(Int, Seq[Any]), List[(String, Long, Double)]]()
    val running = mutable.Map[Seq[Any], Long]()
    partStats.sortBy(_._1).foreach { case (pid, m) =>
      m.foreach { case (k, a) =>
        val off = running.getOrElse(k, 0L)
        running(k) = off + a.cnt
        val hits = qs.toList.flatMap { case (name, q) =>
          val kk = (totals(k).cnt - 1).toDouble * q
          val frac = kk - math.floor(kk)
          List((name, (math.floor(kk) + 1).toLong, 1.0 - frac),
            (name, (math.ceil(kk) + 1).toLong, frac))
            .collect { case (n2, rank, w) if rank > off && rank <= off + a.cnt =>
              (n2, rank - off, w) // local rank within this partition's slice
            }
        }
        if (hits.nonEmpty) localTargets((pid, k)) = hits
      }
    }
    val bc = spark.sparkContext.broadcast(localTargets.toMap)

    // job 2: walk only the targeted slices, emit the bound values
    val picked: Array[(Seq[Any], String, Double)] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val want = bc.value.collect {
          case ((p, k), ts) if p == pid => k -> ts
        }
        if (want.isEmpty) Iterator.empty
        else {
          val cum = mutable.Map[Seq[Any], Long]()
          it.flatMap { r =>
            val k: Seq[Any] = (0 until g).map(r.get)
            want.get(k) match {
              case None => Iterator.empty
              case Some(ts) =>
                val before = cum.getOrElse(k, 0L)
                val after = before + r.getLong(g + 1)
                cum(k) = after
                ts.iterator
                  .filter(t => t._2 > before && t._2 <= after)
                  .map(t => (k, t._1, r.getDouble(g) * t._3))
            }
          }
        }
      }.collect()

    // combine the two weighted bound terms per (group, quantile); output is
    // one row per group — driver-size by construction
    val byTarget = picked.groupBy(p => (p._1, p._2))
      .map { case (key, arr) => key -> arr.map(_._3).sum }
    val outRows = totals.toSeq.map { case (k, t) =>
      val moments: Seq[Any] = if (!withMoments) Nil else {
        val n = t.cnt
        val mean = t.sumV / n
        val std =
          if (n < 2) Double.NaN
          else math.sqrt(math.max(0.0, (t.sumV2 - t.sumV * t.sumV / n) / (n - 1)))
        // Seq[Any] — a plain Seq would numerically widen the Long count to
        // Double and break the LongType schema field
        Seq[Any](n, mean, std, t.min, t.max)
      }
      Row.fromSeq(k ++ moments ++ qs.map { case (name, _) => byTarget((k, name)) })
    }
    val schema = StructType(
      groupCols.map(c => sorted.schema(c)) ++ momentFieldsOf(withMoments) ++
        qs.map { case (name, _) => StructField(name, DoubleType) })
    spark.createDataFrame(outRows.asJava, schema)
    } finally { rdd.unpersist(blocking = false); () }
  }

  /** Stats for one collapsed value histogram (ascending (value, count)):
    * the exact rank/weight interpolation shared by every driver-side path —
    * `v_lo*(1-frac) + v_hi*frac` on exact doubles; moments accumulate in
    * ascending value order (the single-partition case of the distributed
    * accumulation), so all paths agree bit-for-bit on quantiles/min/max/n
    * and to the usual summation-order ulp on mean/std (absorbed by the
    * float32 metric casts).
    */
  private def histStats(hist: IndexedSeq[(Double, Long)],
      qs: Seq[(String, Double)], withMoments: Boolean): Seq[Any] = {
    val n = hist.iterator.map(_._2).sum
    def valueAtRank(rank: Long): Double = {
      var cum = 0L
      var i = 0
      while (i < hist.length) {
        cum += hist(i)._2
        if (cum >= rank) return hist(i)._1
        i += 1
      }
      hist.last._1
    }
    val quantiles = qs.map { case (_, q) =>
      val kk = (n - 1).toDouble * q
      val frac = kk - math.floor(kk)
      val lo = valueAtRank((math.floor(kk) + 1).toLong)
      val hi = valueAtRank((math.ceil(kk) + 1).toLong)
      lo * (1.0 - frac) + hi * frac
    }
    val moments: Seq[Any] = if (!withMoments) Nil else {
      var sumV = 0.0; var sumV2 = 0.0
      hist.foreach { case (v, c) => sumV += v * c; sumV2 += v * v * c }
      val mean = sumV / n
      val std =
        if (n < 2) Double.NaN
        else math.sqrt(math.max(0.0, (sumV2 - sumV * sumV / n) / (n - 1)))
      Seq[Any](n, mean, std, hist.head._1, hist.last._1)
    }
    moments ++ quantiles
  }

  private def momentFieldsOf(withMoments: Boolean): Seq[StructField] =
    if (!withMoments) Nil else Seq(
      StructField("n", LongType), StructField("mean", DoubleType),
      StructField("std", DoubleType), StructField("vmin", DoubleType),
      StructField("vmax", DoubleType))

  /** Tall describe of SEVERAL bounded-grid columns in ONE aggregate job:
    * each column's exact value histogram rides the same scan as a mergeable
    * `ValueHistogramAgg` buffer (org.apache.spark.sql.graft) — map-side
    * partials collapse repeats before the exchange, so N columns of a
    * 100 TB table cost one scan and N bounded (≤ SmallHistogramBudget
    * entries) buffers, with NO melt generator and NO per-value row
    * exchange. Order statistics and moments come off the collected
    * histograms on the driver (histStats — bit-identical to the other
    * paths). Exactness is guarded, not assumed: a column exceeding the
    * histogram budget throws (route it through `describe` instead).
    *
    * Returns one row per column: (col_name, n, mean, std, vmin, vmax,
    * <qname>...), rows in `cols` order.
    */
  def describeGridColumns(df: DataFrame, cols: Seq[String],
      qs: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, ValueHistogramAgg}
    val spark = df.sparkSession
    val aggs = cols.map { c =>
      Bridge.column(ValueHistogramAgg(
          Bridge.expression(col(c).cast("double")),
          capacity = SmallHistogramBudget.toInt)
        .toAggregateExpression()).as(s"__h_$c")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val outRows = cols.zipWithIndex.map { case (c, i) =>
      val hist = row.getSeq[Row](i)
        .map(r => (r.getDouble(0), r.getLong(1))).toIndexedSeq
      Row.fromSeq(c +: histStats(hist, qs, withMoments = true))
    }
    val schema = StructType(StructField("col_name", StringType) +:
      (momentFieldsOf(withMoments = true) ++
        qs.map { case (name, _) => StructField(name, DoubleType) }))
    spark.createDataFrame(outRows.asJava, schema)
  }

  /** Bounded-grid path: collapse to distinct (group, value, count) with one
    * map-side-combine aggregate, collect the (small by declaration)
    * histogram, and walk it on the driver (histStats for the shared
    * arithmetic).
    */
  private def viaDriverHistogram(df: DataFrame, groupCols: Seq[String],
      valueCol: String, qs: Seq[(String, Double)],
      withMoments: Boolean): DataFrame = {
    val spark = df.sparkSession
    val gcols = groupCols.map(col)
    val perValue = df
      .groupBy(gcols :+ col(valueCol).cast("double").as("__v"): _*)
      .agg(count(lit(1)).as("__cnt"))
    val g = groupCols.length
    val collected = perValue.collect()
    val byKey = collected.groupBy(r => (0 until g).map(r.get): Seq[Any])
    val outRows = byKey.toSeq.map { case (k, arr) =>
      val hist = arr.map(r => (r.getDouble(g), r.getLong(g + 1)))
        .sortBy(_._1).toIndexedSeq
      Row.fromSeq(k ++ histStats(hist, qs, withMoments))
    }
    val schema = StructType(
      groupCols.map(c => perValue.schema(c)) ++ momentFieldsOf(withMoments) ++
        qs.map { case (name, _) => StructField(name, DoubleType) })
    spark.createDataFrame(outRows.asJava, schema)
  }

  /** Small-input path (byte-gated in `run`): ONE collect job with NO
    * exchange — project (group..., value), collect, sort on the driver,
    * and compute every group's stats in a single linear walk over
    * contiguous runs. A distributed sort would add a range-partitioner
    * sampling pass + shuffle for data the driver is about to hold anyway;
    * `viaDriverHistogram`'s hash-group collapse is ~3× slower than this
    * when values are near-unique (600k boxed keys). Rank arithmetic
    * indexes the sorted slice directly — bit-identical
    * quantiles/min/max/n vs the two-job path; moments accumulate
    * ascending (summation-order ulp vs the grouped accumulation, absorbed
    * by the float32 metric casts). NaNs sort last both here
    * (j.l.Double.compare / Arrays.sort) and in Spark's range sort, so the
    * paths agree on pathological inputs too.
    */
  /** Stats for one ASCENDING-sorted slice accessed by index: exact
    * interpolated quantiles (ranks index the slice directly) + moments.
    * Shared by both viaSortedCollect branches so the grouped and
    * group-less results can't drift apart.
    */
  private def sliceStats(n: Int, v: Int => Double,
      qs: Seq[(String, Double)], withMoments: Boolean): Seq[Any] = {
    val quantiles = qs.map { case (_, q) =>
      val kk = (n - 1).toDouble * q
      val frac = kk - math.floor(kk)
      val lo = v(math.floor(kk).toInt)
      val hi = v(math.ceil(kk).toInt)
      lo * (1.0 - frac) + hi * frac
    }
    val moments: Seq[Any] = if (!withMoments) Nil else {
      var s = 0.0; var s2 = 0.0
      var r = 0
      while (r < n) { val x = v(r); s += x; s2 += x * x; r += 1 }
      val mean = s / n
      val std =
        if (n < 2) Double.NaN
        else math.sqrt(math.max(0.0, (s2 - s * s / n) / (n - 1)))
      Seq[Any](n.toLong, mean, std, v(0), v(n - 1))
    }
    moments ++ quantiles
  }

  private def viaSortedCollect(df: DataFrame, groupCols: Seq[String],
      valueCol: String, qs: Seq[(String, Double)],
      withMoments: Boolean): DataFrame = {
    val spark = df.sparkSession
    val gcols = groupCols.map(col)
    val proj = df.select(gcols :+ col(valueCol).cast("double").as("__v"): _*)
    val g = groupCols.length
    if (g == 0) {
      // group-less: collect through the Double encoder — a primitive
      // array, no per-row boxing (a 600k-Row collect measured ~3× the
      // whole two-job path; the primitive collect is ~20 ms at that size)
      import spark.implicits._
      val vs = proj.select(col("__v")).as[Double].collect()
      java.util.Arrays.sort(vs)
      val schema = StructType(momentFieldsOf(withMoments) ++
        qs.map { case (name, _) => StructField(name, DoubleType) })
      // empty input -> empty frame, matching the two-job path (whose
      // totals frame simply has no groups); indexing vs(-1) would throw
      val outRows =
        if (vs.isEmpty) Nil
        else Seq(Row.fromSeq(sliceStats(vs.length, vs(_), qs, withMoments)))
      return spark.createDataFrame(outRows.asJava, schema)
    }
    val rows = proj.collect()
    // driver sort on (group..., value): group cols via their natural
    // orderings (the same total order Spark's sort would produce)
    java.util.Arrays.sort(rows, new java.util.Comparator[Row] {
      override def compare(a: Row, b: Row): Int = {
        var c = 0
        var k = 0
        while (c == 0 && k < g) {
          // null cases FIRST (nulls sort first, matching Spark's asc
          // default); a Comparable-first match would NPE on x.compareTo(null)
          c = (a.get(k), b.get(k)) match {
            case (null, null) => 0
            case (null, _) => -1
            case (_, null) => 1
            case (x: java.lang.Comparable[_], y) =>
              x.asInstanceOf[java.lang.Comparable[Any]].compareTo(y)
          }
          k += 1
        }
        if (c != 0) c
        else java.lang.Double.compare(a.getDouble(g), b.getDouble(g))
      }
    })
    val out = mutable.ArrayBuffer[Row]()
    var i = 0
    while (i < rows.length) {
      var j = i + 1
      while (j < rows.length &&
          (0 until g).forall(c => rows(j).get(c) == rows(i).get(c))) j += 1
      val n = j - i
      val base = i
      out += Row.fromSeq((0 until g).map(rows(i).get) ++
        sliceStats(n, r => rows(base + r).getDouble(g), qs, withMoments))
      i = j
    }
    val schema = StructType(
      groupCols.map(c => proj.schema(c)) ++ momentFieldsOf(withMoments) ++
        qs.map { case (name, _) => StructField(name, DoubleType) })
    spark.createDataFrame(out.asJava, schema)
  }

  /** High-group-cardinality path: quantiles from `ParallelRank.quantiles`
    * (every stage a DataFrame op, nothing driver-resident), moments from a
    * plain hash aggregate, joined on the group key. Same output contract as
    * `run`'s driver path — asserted equal in QuantileDispatchSpec.
    */
  private def viaParallelRank(df: DataFrame, groupCols: Seq[String],
      valueCol: String, qs: Seq[(String, Double)],
      withMoments: Boolean): DataFrame = {
    val vdf = df.select(groupCols.map(col) :+
      col(valueCol).cast("double").as("__v"): _*)
    val quant = ParallelRank.quantiles(vdf, groupCols, "__v", qs)
    if (!withMoments) quant
    else {
      val gcols = groupCols.map(col)
      val moments = vdf.groupBy(gcols: _*).agg(
        count(lit(1)).as("n"),
        avg(col("__v")).as("mean"),
        coalesce(stddev_samp(col("__v")), lit(Double.NaN)).as("std"),
        min(col("__v")).as("vmin"),
        max(col("__v")).as("vmax"))
      moments.join(quant, groupCols).select(
        gcols ++ Seq(col("n"), col("mean"), col("std"), col("vmin"),
          col("vmax")) ++ qs.map { case (name, _) => col(name) }: _*)
    }
  }
}
