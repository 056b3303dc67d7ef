package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.ParallelRank

/** Pressure certification of the POST-FIX pinned-exchange ParallelRank
  * paths (round 11, VERDICT r10 #7): the round-10 bug corrupted ranks via
  * independently re-sampled range boundaries, and its fix pins the
  * bucketed exchange (MEMORY_AND_DISK) across every two-branch read. This
  * tool certifies, at ~10M rows x 16 groups:
  *
  *  - `rowNumber` on BOTH dispatches (the declarative joinOffsets path and
  *    the budget-guarded driver-offsets path) bit-equal to Spark's own
  *    one-task-per-group window `row_number` — an independent execution
  *    path, compared distributedly (a join counting mismatches, nothing
  *    large collected);
  *  - `runningSums` bit-equal to the window running sum the same way;
  *  - `quantiles` exactly equal to a shared-nothing DRIVER REPLAY (plain
  *    sorted arrays + the (n-1)·q two-row interpolation, no engine code),
  *    collected one group at a time so driver memory stays ~60 MB;
  *  - an EVICTION phase: a second SparkContext with
  *    spark.memory.fraction=0.02 + storageFraction=0 (no protected
  *    storage — execution may evict every cached block) and a 3x dataset
  *    (30M rows, ~330 MB columnar pin) re-runs both rowNumber dispatches
  *    and runningSums under guaranteed storage displacement, asserting
  *    some pinned blocks actually went to DISK
  *    (sc.getRDDStorageInfo) — the MEMORY_AND_DISK pin's disk path is the
  *    one a 100 TB job lives on, and a pin that silently fell back to
  *    recomputation would reintroduce the exact re-sampling bug.
  *
  * Values are a bijective xorshift scramble of the row id — unique
  * within every group, so ranks are tie-free and the equality is exact,
  * while the range sampler sees pseudorandom order (the adversarial
  * layout: every boundary sample matters).
  */
object PressureRank {

  private val N = 10000000L
  private val G = 16

  private def data(spark: SparkSession, n: Long = N): DataFrame = {
    // xorshift scramble: each step is invertible, so values are UNIQUE
    // (tie-free ranks) while the range sampler sees pseudorandom order.
    // Pure bit ops — no overflow, so ANSI mode (Spark 4 default) is happy.
    val x1 = col("id").bitwiseXOR(shiftleft(col("id"), 21))
    val v = x1.bitwiseXOR(shiftright(x1, 17))
    spark.range(n).select(
      col("id").as("rid"),
      (col("id") % G).cast("int").as("g"),
      v.as("v"))
      .withColumn("w", pmod(col("v"), lit(1000L)))
  }

  private def timed[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"  $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
  }

  /** Count of rows where the engine column differs from the window
    * reference — computed distributedly, must be 0.
    */
  private def mismatches(eng: DataFrame, ref: DataFrame,
      cols: Seq[String]): Long =
    eng.select(col("rid") +: cols.map(c => col(c).as(s"e_$c")): _*)
      .join(ref.select(col("rid") +: cols.map(c => col(c).as(s"r_$c")): _*),
        "rid")
      .filter(cols.map(c => col(s"e_$c") =!= col(s"r_$c")).reduce(_ || _))
      .count()

  private def checkRanks(spark: SparkSession, label: String,
      n: Long = N): Unit = {
    val df = data(spark, n)
    val wRef = df.withColumn("rn_ref",
      row_number().over(Window.partitionBy("g").orderBy("v")))
      .select("rid", "rn_ref")
    for (hint <- Seq(false, true)) {
      val eng = timed(s"$label rowNumber(smallGroupsHint=$hint)") {
        ParallelRank.rowNumber(df, Seq("g"), "v", rankCol = "rn",
            smallGroupsHint = hint)
          .select(col("rid"), col("rn").as("rn_ref"))
      }
      val bad = timed(s"$label   compare vs window reference") {
        mismatches(eng, wRef, Seq("rn_ref"))
      }
      require(bad == 0L, s"$label rowNumber(hint=$hint): $bad rank mismatches")
      println(s"  $label rowNumber(hint=$hint): EXACT over $n rows")
      spark.catalog.clearCache()
    }
    val rsRef = df.withColumn("s_ref",
      sum(col("w")).over(Window.partitionBy("g").orderBy("v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("rid", "s_ref")
    val rsEng = timed(s"$label runningSums") {
      ParallelRank.runningSums(df, Seq("g"), "v", Seq("w"), Seq("s_ref"))
        .select("rid", "s_ref")
    }
    val badRs = timed(s"$label   compare vs window reference") {
      mismatches(rsEng, rsRef, Seq("s_ref"))
    }
    require(badRs == 0L, s"$label runningSums: $badRs mismatches")
    println(s"  $label runningSums: EXACT over $n rows")
    spark.catalog.clearCache()
  }

  def main(args: Array[String]): Unit = {
    println(s"pressure-rank: $N rows, $G groups, unique scrambled values")

    // ---- phase A: normal memory config -------------------------------
    val sparkA = graft.core.GraftSession.local(cores = 16,
      appName = "pressure-rank")
    checkRanks(sparkA, "normal")

    // quantiles vs driver replay (plain arrays, no engine code)
    val qs = Seq("p01" -> 0.01, "p25" -> 0.25, "p50" -> 0.5,
      "p75" -> 0.75, "p99" -> 0.99)
    val engQ = timed("normal quantiles (5 bounds x 16 groups)") {
      ParallelRank.quantiles(data(sparkA), Seq("g"), "v", qs)
        .collect().map(r => r.getAs[Int]("g") ->
          qs.map { case (n, _) => r.getAs[Double](n) }).toMap
    }
    val repQ = timed("driver replay (per-group collect + sort)") {
      (0 until G).map { gi =>
        val vs = data(sparkA).filter(col("g") === gi).select("v")
          .collect().map(_.getLong(0))
        java.util.Arrays.sort(vs)
        gi -> qs.map { case (_, q) =>
          val k = (vs.length - 1) * q
          val lo = math.floor(k).toInt; val hi = math.ceil(k).toInt
          val frac = k - lo
          vs(lo) * (1.0 - frac) + vs(hi) * frac
        }
      }.toMap
    }
    require(engQ == repQ,
      s"quantiles diverge:\n  engine $engQ\n  replay $repQ")
    println(s"  quantiles: bit-identical to driver replay, $G groups x " +
      s"${qs.size} bounds")
    sparkA.stop()

    // ---- phase B: forced eviction (tiny storage pool, 3x data) --------
    // 2% memory fraction (~235 MB unified on the 12g tool heap) with
    // storageFraction=0 (NO protected storage region — with the default
    // 50% region this starves execution of its minimum pages: measured
    // UNABLE_TO_ACQUIRE_MEMORY at 16 tasks) against a 30M-row pin
    // (~330 MB columnar > the whole pool): eviction is guaranteed,
    // 4 cores so each task's execution share (pool/8 ~ 29 MB) clears the
    // sorter/agg minimum pages 16-way concurrency could not,
    // MEMORY_AND_DISK must land pinned blocks ON DISK, and correctness
    // must ride the disk path, not recomputation (a silent recompute
    // would re-sample the range boundaries: the exact round-10 bug).
    val nEvict = 3 * N
    val sparkB = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[4]")
        .appName("pressure-rank-evict")
        .config("spark.memory.fraction", "0.02")
        .config("spark.memory.storageFraction", "0"),
      shufflePartitions = 16).getOrCreate()
    sparkB.sparkContext.setLogLevel("WARN")
    // materialize one engine pass, then PROVE blocks hit disk
    val probe = ParallelRank.rowNumber(data(sparkB, nEvict), Seq("g"), "v",
      rankCol = "rn")
    timed("evict rowNumber materialize")(probe.count(): Unit)
    val storage = sparkB.sparkContext.getRDDStorageInfo
    val onDisk = storage.map(_.diskSize).sum
    val inMem = storage.map(_.memSize).sum
    println(s"  evict storage: ${storage.length} cached RDDs, " +
      s"mem=${inMem / 1024 / 1024} MB disk=${onDisk / 1024 / 1024} MB")
    require(onDisk > 0L,
      "eviction phase kept every pinned block in memory — raise pressure")
    sparkB.catalog.clearCache()
    checkRanks(sparkB, "evict", nEvict)
    sparkB.stop()
    println("  PRESSURE-RANK: all paths exact, eviction disk path exercised")
  }
}
