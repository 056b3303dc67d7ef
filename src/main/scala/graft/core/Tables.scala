package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the engine's standard table set (TESTDATA.md): a TPC-H-ish
  * star schema plus an `events` stream table, a `documents` text corpus and
  * an `embeddings` vector table. One parquet per table under `dir`.
  *
  * All reads go through `spark.read.parquet` so Catalyst's vectorized reader,
  * filter pushdown and column pruning apply; never pre-materialize.
  */
final case class Tables(spark: SparkSession, dir: String) {
  // Memoized per (session, dir, name): spark.read.parquet re-lists the
  // directory and re-reads footers on every call, a fixed per-query tax that
  // dominates small-SF benchmarks. DataFrames are immutable plans — safe to
  // share across queries of the same session.
  // The fault gate's suite-wide injection point (scope "scan"): identity
  // unless spark.graft.fault.scopes enables it, in which case every task
  // of every table-reading stage fails once on attempt 0 and is retried.
  // Applied OUTSIDE the memo so the cached plan stays probe-free.
  private def t(name: String): DataFrame =
    graft.fault.FaultInjection.probe(
      Tables.cache.computeIfAbsent((spark, dir, name),
        _ => spark.read.parquet(s"$dir/$name.parquet")), "scan")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS); with
    * spark.sql.legacy.parquet.nanosAsLong=true it arrives as nano-epoch long
    * and is rebuilt here as a proper TimestampType (truncated to micros).
    */
  def events: DataFrame = {
    val raw = t("events")
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.LongType
    // `div` is exact long division; a double-division round trip shifts
    // nano-epoch values (~1.7e18 > 2^53) by ±1µs and diverges from the
    // oracle's exact epoch_us truncation.
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** The text corpus and vector table feed the per-row-heavy kernels
    * (shingling, md5, minhash, plane projections): those queries opt into a
    * fanned-out scan. Plain aggregates use the raw accessors — for an
    * agg-only query the extra shuffle costs more than the serial scan saves
    * (measured at sf0.1: fanning `documents` for every query regressed the
    * one-pass fingerprint profile 0.5→1.2 s).
    */
  // keyed on the table's unique id (round 14): a full-row hash would force
  // EVERY column into the exchange expression, blocking column pruning
  // through the repartition — fanned consumers that touch two columns were
  // reading and shuffling all five. A unique id spreads identically
  // (uniform, deterministic per row, retry-stable, and distinct even under
  // exact-copy amplified corpora) while the untouched columns prune away.
  def documentsFanned: DataFrame  =
    fanOut(t("documents"), Seq(org.apache.spark.sql.functions.col("doc_id")))
  def embeddingsFanned: DataFrame =
    fanOut(t("embeddings"), Seq(org.apache.spark.sql.functions.col("vec_id")))

  /** For per-row JSON parsing over events (the one events kernel heavy
    * enough to out-cost the fan-out exchange — from_json/get_json_object
    * is ~1 µs/row of Jackson work that otherwise runs inside the single
    * row-group scan task). */
  def eventsFanned: DataFrame =
    fanOut(events, Seq(org.apache.spark.sql.functions.col("event_id")))

  /** Fan an under-split scan out to the session's parallelism: the test
    * files are single-row-group parquet, which reads as ONE task no matter
    * the split size, serializing every scan-side kernel. Filters and
    * pruning push through the repartition, so the shuffle moves only the
    * rows/columns a query actually reads. A real lake read has many row
    * groups per executor and the guard makes this a no-op. Public so
    * compute-heavy query paths (e.g. the q12 melt) can opt in for other
    * tables.
    *
    * Keyless callers beware (ADVICE r14): the full-row default hashes
    * `df.columns`, which throws `AnalysisException` on frames with
    * duplicate column names (e.g. post-join) and sends exact-duplicate
    * rows to one partition (skew under amplified corpora). Callers with
    * ambiguous names or heavy duplication must pass explicit `keys`
    * (ideally a unique id) after projecting the columns they need.
    */
  def fanOut(df: DataFrame,
      keys: Seq[org.apache.spark.sql.Column] = Seq.empty): DataFrame = {
    // fan to HALF the executor cores: measured at sf0.1 on 32 cores,
    // 16-way fan-out beats 32-way on BOTH wall and CPU (16 heavier tasks
    // amortize per-task kernel setup better than 32 slivers). Deliberately
    // INDEPENDENT of spark.sql.shuffle.partitions: shuffle sizing tracks
    // post-agg data volume (4-8 at bench scale), while fan-out parallelizes
    // scan-side compute kernels, which want the machine's cores. The
    // explicit conf exists because the bench pins default.parallelism to
    // its (small) shuffle sizing — without it the fan-out silently follows
    // and kernel stages collapse to the shuffle width.
    val target = Tables.kernelWidth(spark)
    if (df.rdd.getNumPartitions * 2 > target) df
    // hash-partition rather than round-robin: a keyless repartition(n)
    // must LOCALLY SORT its input first so retried tasks reproduce the
    // same row-to-partition assignment (SPARK-23207,
    // spark.sql.execution.sortBeforeRepartition) — an O(n log n) pass
    // serialized inside the very single-task scan this fan-out exists to
    // relieve. Hashing is deterministic per row (the guide-§2.5
    // prescription) and needs no sort. Measured round 14 (7-query
    // fanned-family A/B, 5-rep solo at sf0.1): 9.27 -> 8.29 s suite, with
    // the CPU drop that proves the sort left (q122 10.9 -> 8.0 s cpu,
    // q94 12.2 -> 9.2 s cpu). `keys` picks the hash columns: the fanned
    // table accessors pass their unique id so the other columns stay
    // prunable through the exchange; generic callers (who project the
    // exact columns they need first) default to the full row.
    else df.repartition(target,
      (if (keys.nonEmpty) keys
       else df.columns.toSeq.map(org.apache.spark.sql.functions.col)): _*)
  }

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view so `spark.sql` is a first-class
    * entry point (SURVEY.md §3.3).
    */
  def registerAll(): Unit =
    names.foreach(n => t(n).createOrReplaceTempView(n))
}

object Tables {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** Width for CPU-bound scan/verify kernels: the `spark.graft.fanout`
    * override when set, else half the executor cores (but never below the
    * session's shuffle sizing). ONE definition (ADVICE r14): `fanOut`,
    * `SetSimilarity.verifyWidth` and the q69 candidate-distinct width all
    * used to inline this formula and would have drifted under future
    * tuning.
    */
  def kernelWidth(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.fanout").map(_.toInt)
      .getOrElse(math.max(spark.sparkContext.defaultParallelism / 2,
        spark.sessionState.conf.numShufflePartitions))

  /** Exact epoch microseconds, tolerant of the timestamp flavor the scan
    * produced. Parquet writers vary: the test corpus has shipped `events.ts`
    * both as TIMESTAMP(NANOS) (read as nano-epoch long under
    * `nanosAsLong`, rebuilt by `Tables.events`) and as TIMESTAMP_NTZ
    * (micros, isAdjustedToUTC=false) — and `unix_micros` hard-rejects the
    * NTZ flavor. The cast to TimestampType is a no-op for instant
    * timestamps and interprets NTZ in the session timezone (pinned UTC by
    * GraftSession/Verify), which is exactly DuckDB's `epoch_us(ts)` reading
    * of a naive timestamp — so oracle replays stay bit-identical. All
    * integer time math in the engine routes through this helper.
    */
  def epochUs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.unix_micros
    unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
  }
}
