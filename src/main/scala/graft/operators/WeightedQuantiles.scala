package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType, StructField, StructType}

/** Exact weighted quantiles per group, defined the distribution-function
  * way: wq(q) = the smallest value v whose cumulative weight (over all rows
  * with value ≤ v — RANGE tie semantics) reaches q of the group's total
  * weight. Thresholds are passed as exact rationals (num/den) and compared
  * as `cumw * den >= total * num`: when the weights are integral the whole
  * decision is exact arithmetic — no q*W float rounding can move a boundary
  * row and partial-sum association order cannot drift — so the result is
  * bit-identical across engines and partitionings. (Plain quantiles are the
  * weight ≡ 1 special case.)
  *
  * Four-way dispatch, mirroring `DistributedQuantiles`' budgets (results
  * identical on every path — the spec asserts it):
  *  1. `distinctValueHint` ≤ SmallHistogramBudget (grid-bounded values):
  *     collapse to the (group, value, weight-mass) histogram in one
  *     map-side-combined aggregate — tiny no matter the row count — and
  *     walk crossings on the driver;
  *  2. small-input byte gate (same conf knob as DistributedQuantiles):
  *     the raw rows are driver-bounded; sort distributed, walk collected
  *     rows linearly — no collapse, no range machinery;
  *  3. two jobs over ONE shuffle (`viaRddTwoJob`, the DistributedQuantiles
  *     core with weight mass for counts): range-repartition + local sort
  *     as a single persisted RDD; job 1 collects P × G weight partials,
  *     the driver locates each target's crossing cell, job 2 walks ONLY
  *     targeted slices. Bounded driver state (DriverPartialsBudget);
  *  4. beyond that budget, a fully-declarative located-cell plan
  *     (`declarative`): offsets/targets as joins over tiny frames, a
  *     second window exchange carrying located cells only — no driver
  *     state at all. (The naive alternative — `runningSums` + window —
  *     re-exchanges and re-sorts the ENTIRE frame, since the window's
  *     `partitionBy(pid, group)` clustering cannot be satisfied by range
  *     partitioning; measured 3× slower at sf0.1.)
  * Equal values never straddle a range-partition boundary (equal keys map
  * to one partition), so a crossing value lies wholly inside its cell and
  * in-cell RANGE tie handling reproduces global semantics.
  */
object WeightedQuantiles {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** @param qs (outputName, num, den) exact-rational quantile list,
    *           e.g. ("p50", 1, 2). Rows with null `valueCol` must be
    *           pre-filtered (as with ParallelRank.quantiles). The value
    *           column is computed as double (the quantile contracts here
    *           are numeric); weights may be any numeric type.
    */
  /** `groupCountHint`: expected number of distinct groups — the same plan
    * hint `DistributedQuantiles.exact` already takes. When absent, an
    * `approx_count_distinct` pre-pass estimates it for the two-job-vs-
    * declarative dispatch; that probe is a FULL extra pass over the input
    * (guide §1.2 — at lake scale a real scan), so callers whose group
    * column has schema-bounded cardinality (a flag, an enum) should pass
    * the bound. Dispatch-only: results are identical on every path
    * (WeightedQuantilesSpec asserts it).
    */
  def byGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
      weight: Column, qs: Seq[(String, Int, Int)],
      distinctValueHint: Option[Long] = None,
      groupCountHint: Option[Long] = None): DataFrame = {
    val gcols = groupCols.map(col)
    val base = df.select(
      (gcols :+ col(valueCol).cast("double").as(valueCol) :+
        weight.as("__w")): _*)
    // Grid-bounded dispatch (DistributedQuantiles' distinctValueHint, same
    // semantics): when the caller knows the value column lives on a bounded
    // grid, the collapsed (group, value, weight-mass) histogram is small NO
    // MATTER the row count — one map-side-combined aggregate, a distributed
    // sort of the tiny histogram, and a linear driver walk. A plan hint,
    // never a semantic change (the spec asserts path equality).
    if (distinctValueHint.exists(_ <= DistributedQuantiles.SmallHistogramBudget)) {
      log.info(s"WeightedQuantiles: ~${distinctValueHint.get} distinct " +
        "(group, value) pairs within histogram budget; walking the " +
        "collapsed weight histogram on the driver (one aggregate job)")
      return viaDriverWalk(
        base.groupBy((gcols :+ col(valueCol)): _*)
          .agg(sum(col("__w")).as("__w")),
        groupCols, valueCol, qs)
    }
    // Small-input byte gate — DistributedQuantiles' dispatch, same conf
    // knob (`spark.graft.quantiles.smallInputBytes`), same eligibility
    // guards (no generator fan-out, atomic group keys): when the whole
    // input is driver-bounded, collapse to the (group, value, weight-mass)
    // histogram in ONE map-side-combined aggregate job and walk the
    // crossings on the driver — no range exchange, no boundary-sampling
    // job, no persist, no second pass. At lake scale the size estimate is
    // astronomically over budget and the located-cell plan below runs.
    // Results are identical either way (WeightedQuantilesSpec pins the
    // distributed path via smallInputBytes=0 and asserts equality).
    val smallBytes = df.sparkSession.conf
      .getOption("spark.graft.quantiles.smallInputBytes")
      .map(_.toLong).getOrElse(DistributedQuantiles.SmallInputBytesDefault)
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
      log.info("WeightedQuantiles: input estimated at " +
        s"${df.queryExecution.optimizedPlan.stats.sizeInBytes} bytes <= " +
        s"$smallBytes; sorting distributed and walking collected rows " +
        "on the driver (no collapse — raw rows are already driver-bounded)")
      return viaDriverWalk(base, groupCols, valueCol, qs)
    }
    // group-count probe for the two-job dispatch: P × G driver cells must
    // stay bounded (DistributedQuantiles.DriverPartialsBudget); beyond it
    // the fully-declarative plan runs (no driver state at all)
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val estGroups: Long =
      if (groupCols.isEmpty) 1L
      else groupCountHint.getOrElse(
        df.agg(approx_count_distinct(struct(gcols: _*))).first().getLong(0))
    if (estGroups * parts > DistributedQuantiles.DriverPartialsBudget) {
      log.info(s"WeightedQuantiles: ~$estGroups groups x $parts partitions " +
        "exceeds driver-partials budget; running the declarative " +
        "located-cell plan")
      declarative(
        base.repartitionByRange((gcols :+ col(valueCol)): _*)
          .withColumn("__pid", spark_partition_id()),
        groupCols, valueCol, qs)
    } else viaRddTwoJob(base, groupCols, valueCol, qs)
  }

  /** Mid-scale path — DistributedQuantiles' two-jobs-over-one-shuffle
    * pattern with weight mass in place of row counts: range-repartition +
    * sort-within-partitions on (group, value) as ONE rdd (job 2 reuses
    * job 1's shuffle files; boundaries fixed in the RDD graph, so the two
    * jobs see identical pids without caching a DataFrame); job 1 collects
    * per-(partition, group) weight sums (P × G tuples); the driver locates
    * each target's crossing cell by exclusive prefix offsets; job 2 walks
    * ONLY targeted slices in sorted order, resolving crossings at
    * tie-run boundaries (RANGE semantics). The rdd is persisted across the
    * two jobs (without it job 2 re-runs the within-partition sort) and
    * unpersisted before returning.
    */
  private[operators] def viaRddTwoJob(base: DataFrame, groupCols: Seq[String],
      valueCol: String, qs: Seq[(String, Int, Int)]): DataFrame = {
    val gcols = groupCols.map(col)
    val g = groupCols.size
    val keys = gcols :+ col(valueCol)
    val sorted = base.repartitionByRange(keys: _*)
      .sortWithinPartitions(keys: _*)
      .select((gcols :+ col(valueCol) :+ col("__w")): _*)
    val rdd = sorted.rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def num(a: Any): Double = a match {
        case d: java.lang.Double => d.doubleValue
        case l: java.lang.Long => l.toDouble
        case n: java.lang.Number => n.doubleValue
      }
      // job 1: per-(partition, group) weight mass, insertion-ordered (the
      // partition is sorted, so groups appear in key order)
      val partW: Array[(Int, Seq[(Seq[Any], Double)])] =
        rdd.mapPartitionsWithIndex { (pid, it) =>
          val m = scala.collection.mutable.LinkedHashMap[Seq[Any], Double]()
          it.foreach { r =>
            val k: Seq[Any] = (0 until g).map(r.get)
            m(k) = m.getOrElse(k, 0.0) + num(r.get(g + 1))
          }
          Iterator.single(pid -> m.toSeq)
        }.collect()
      // driver: totals then, in pid order, the one crossing cell per target
      val totals = scala.collection.mutable.Map[Seq[Any], Double]()
      partW.foreach { case (_, m) =>
        m.foreach { case (k, w) => totals(k) = totals.getOrElse(k, 0.0) + w }
      }
      // wanted(pid)(key) = (qname, num, den, off, wtot) list for crossings
      // inside that cell
      val wanted = scala.collection.mutable
        .Map[Int, Map[Seq[Any], List[(String, Int, Int, Double, Double)]]]()
      val running = scala.collection.mutable.Map[Seq[Any], Double]()
      partW.sortBy(_._1).foreach { case (pid, m) =>
        val hits = m.flatMap { case (k, w) =>
          val off = running.getOrElse(k, 0.0)
          running(k) = off + w
          val wtot = totals(k)
          val ts = qs.toList.collect {
            case (name, n, d) if off * d < wtot * n &&
                (off + w) * d >= wtot * n =>
              (name, n, d, off, wtot)
          }
          if (ts.nonEmpty) Some(k -> ts) else None
        }
        if (hits.nonEmpty) wanted(pid) = hits.toMap
      }
      val bc = base.sparkSession.sparkContext.broadcast(wanted.toMap)
      // job 2: walk only targeted slices; resolve at tie-run boundaries so
      // the full tied mass counts at its value (RANGE semantics)
      val picked: Array[(Seq[Any], String, Double)] =
        rdd.mapPartitionsWithIndex { (pid, it) =>
          bc.value.get(pid) match {
            case None => Iterator.empty
            case Some(want) =>
              val out = List.newBuilder[(Seq[Any], String, Double)]
              var curKey: Seq[Any] = null
              var pending: List[(String, Int, Int, Double, Double)] = Nil
              var cum = 0.0
              var runVal = 0.0
              var runW = 0.0
              var runOpen = false
              def closeRun(): Unit = if (runOpen) {
                cum += runW
                val (hit, still) = pending.partition { case (_, n, d, off, wtot) =>
                  (off + cum) * d >= wtot * n
                }
                hit.foreach { case (name, _, _, _, _) =>
                  out += ((curKey, name, runVal))
                }
                pending = still
                runW = 0.0
                runOpen = false
              }
              it.foreach { r =>
                val k: Seq[Any] = (0 until g).map(r.get)
                if (k != curKey) {
                  closeRun()
                  curKey = k
                  pending = want.getOrElse(k, Nil)
                  cum = 0.0
                } else if (runOpen && r.getDouble(g) != runVal) closeRun()
                if (pending.nonEmpty) {
                  if (!runOpen) { runVal = r.getDouble(g); runOpen = true }
                  runW += num(r.get(g + 1))
                }
              }
              closeRun()
              out.result().iterator
          }
        }.collect()
      val byKey = picked.groupBy(_._1)
      val outRows = byKey.map { case (k, hits) =>
        val m = hits.map(h => h._2 -> h._3).toMap
        Row.fromSeq(k ++ qs.map { case (name, _, _) =>
          m.getOrElse(name, Double.NaN) })
      }.toSeq
      val schema = StructType(
        groupCols.map(c => base.schema(c)) ++
          qs.map { case (name, _, _) =>
            StructField(name, DoubleType, nullable = true) })
      base.sparkSession.createDataFrame(
        new java.util.ArrayList(
          scala.jdk.CollectionConverters.SeqHasAsJava(outRows).asJava), schema)
    } finally rdd.unpersist(blocking = false)
  }

  /** Driver-walk core shared by the byte-gate (raw rows) and hint
    * (collapsed histogram) dispatches: sort DISTRIBUTED on (group, value),
    * collect in order, and resolve every target in one linear pass over
    * each group's contiguous segment — no driver-side sort, no boxed-key
    * groupBy (an earlier per-group `groupBy`+`sortBy` form spent ~2 s on
    * 583k driver rows; the segment walk is O(n) array traversal). Same
    * double accumulation as the distributed paths — bit-identical
    * decisions for integral weights.
    */
  private[operators] def viaDriverWalk(frame: DataFrame, groupCols: Seq[String],
      valueCol: String, qs: Seq[(String, Int, Int)]): DataFrame = {
    val gcols = groupCols.map(col)
    val g = groupCols.size
    val rows = frame
      .select((gcols :+ col(valueCol) :+ col("__w")): _*)
      .orderBy((gcols :+ col(valueCol)): _*)
      .collect()
    def num(a: Any): Double = a match {
      case d: java.lang.Double => d.doubleValue
      case l: java.lang.Long => l.toDouble
      case n: java.lang.Number => n.doubleValue
    }
    def sameGroup(a: Row, b: Row): Boolean =
      (0 until g).forall(i => a.get(i) == b.get(i))
    val outRows = Vector.newBuilder[Row]
    var i = 0
    while (i < rows.length) {
      var j = i
      var wtot = 0.0
      while (j < rows.length && sameGroup(rows(i), rows(j))) {
        wtot += num(rows(j).get(g + 1)); j += 1
      }
      val crossings = Array.fill[Double](qs.size)(Double.NaN)
      var cum = 0.0
      var k = i
      while (k < j) {
        cum += num(rows(k).get(g + 1))
        // resolve at the LAST row of a tied value run (RANGE semantics:
        // the full tied mass counts at that value)
        if (k + 1 == j || rows(k + 1).getDouble(g) != rows(k).getDouble(g)) {
          var qi = 0
          while (qi < qs.size) {
            val (_, n, d) = qs(qi)
            if (crossings(qi).isNaN && cum * d >= wtot * n)
              crossings(qi) = rows(k).getDouble(g)
            qi += 1
          }
        }
        k += 1
      }
      outRows += Row.fromSeq((0 until g).map(rows(i).get) ++ crossings.toSeq)
      i = j
    }
    val schema = StructType(
      groupCols.map(c => frame.schema(c)) ++
        qs.map { case (name, _, _) =>
          StructField(name, DoubleType, nullable = true) })
    frame.sparkSession.createDataFrame(
      new java.util.ArrayList(
        scala.jdk.CollectionConverters.SeqHasAsJava(outRows.result()).asJava),
      schema)
  }

  /** Budget-overflow path: offsets / totals / located as declarative joins
    * over the same tiny frames, nothing collected, no persist.
    */
  private[operators] def declarative(b: DataFrame, groupCols: Seq[String],
      valueCol: String, qs: Seq[(String, Int, Int)]): DataFrame = {
    val gcols = groupCols.map(col)
    val cellW = b.groupBy((col("__pid") +: gcols): _*)
      .agg(sum(col("__w")).as("__cw"))
    val earlier = cellW.select(
      (col("__pid").as("__e_pid") +:
        groupCols.map(c => col(c).as(s"__e_$c"))) :+
        col("__cw").as("__e_cw"): _*)
    val offCond = (groupCols.map(c => col(c) === col(s"__e_$c")) :+
      (col("__e_pid") < col("__pid"))).reduce(_ && _)
    val off = cellW.join(earlier, offCond, "left")
      .groupBy((col("__pid") +: gcols): _*)
      .agg(coalesce(sum(col("__e_cw")), lit(0.0).cast("double")).as("__off"),
        first(col("__cw")).as("__cellw"))
    val totals = cellW.groupBy(gcols: _*).agg(sum(col("__cw")).as("__wtot"))
    val targetStructs = qs.map { case (name, num, den) =>
      struct(lit(name).as("qname"), lit(num).as("num"), lit(den).as("den"))
    }
    val targets = totals
      .select(gcols :+ col("__wtot") :+
        explode(array(targetStructs: _*)).as("__t"): _*)
      .select(gcols ++ Seq(col("__wtot"), col("__t.qname").as("__qname"),
        col("__t.num").as("__num"), col("__t.den").as("__den")): _*)
    val locCond = groupCols.map(c => col(c) === col(s"__l_$c")).foldLeft(
      col("__off") * col("__den") < col("__wtot") * col("__num") &&
        (col("__off") + col("__cellw")) * col("__den") >=
          col("__wtot") * col("__num"))(_ && _)
    val located = targets
      .join(off.select((col("__pid").as("__l_pid") +:
        groupCols.map(c => col(c).as(s"__l_$c"))) ++
        Seq(col("__off"), col("__cellw")): _*), locCond)
      .select((col("__l_pid").as("__pid") +:
        groupCols.map(c => col(s"__l_$c").as(c))) ++
        Seq(col("__off"), col("__wtot"), col("__qname"), col("__num"),
          col("__den")): _*)
    val cellKeys = located
      .select((col("__pid") +: gcols): _*)
      .distinct()
    finish(b, groupCols, valueCol, qs, cellKeys, located)
  }

  /** Pass 2, shared by both dispatches: in-cell RANGE cumulative weights
    * over located cells only, then the min qualifying value per target.
    * `located`/`cellKeys` carry (__pid, groups...) plus target metadata.
    */
  private def finish(b: DataFrame, groupCols: Seq[String], valueCol: String,
      qs: Seq[(String, Int, Int)], cellKeys: DataFrame,
      located: DataFrame): DataFrame = {
    val gcols = groupCols.map(col)
    val cellRows = b.join(broadcast(cellKeys), "__pid" +: groupCols)
    val wLocal = Window
      .partitionBy((col("__pid") +: gcols): _*)
      .orderBy(col(valueCol))
    val ranked = cellRows.withColumn("__lcw", sum(col("__w")).over(wLocal))
    val locNamed = located.select(
      (col("__pid").as("__l_pid") +:
        groupCols.map(c => col(c).as(s"__l_$c"))) ++
        Seq(col("__off"), col("__wtot"), col("__qname"), col("__num"),
          col("__den")): _*)
    val pickCond = groupCols.map(c => col(c) === col(s"__l_$c")).foldLeft(
      col("__pid") === col("__l_pid"))(_ && _)
    val picked = ranked.join(broadcast(locNamed), pickCond)
      .filter((col("__off") + col("__lcw")) * col("__den") >=
        col("__wtot") * col("__num"))
    val vals = picked.groupBy((gcols :+ col("__qname")): _*)
      .agg(min(col(valueCol)).as("__qv"))
    val aggCols = qs.map { case (name, _, _) =>
      max(when(col("__qname") === name, col("__qv"))).as(name)
    }
    vals.groupBy(gcols: _*).agg(aggCols.head, aggCols.tail: _*)
  }
}
