package graft

import java.io.File

/** Fault-injection correctness gate (round 11, VERDICT r10 #1). Round 10's
  * own ParallelRank bug — rank corruption from an un-contracted assumption
  * of re-execution consistency, exposed only by a layout change — proved
  * this failure class live, and nothing in the suite exercised it: at
  * 100 TB, task retries, stage re-execution and speculative re-runs are
  * routine. Two forked-child runs, both compared row-identical to the
  * in-process no-fault build (which the driver's DuckDB gate hashes):
  *
  *  1. DETERMINISTIC TASK RETRY: `local[8,4]` (maxFailures=4) with
  *     `spark.graft.fault.scopes=scan,rank,cc,stream` — every task of
  *     every table scan, of ParallelRank's pinned range exchange, of each
  *     ConnectedComponents label round, and of the q130 SCD2 stream's
  *     micro-batches throws on attempt 0 and is retried. The spec also
  *     asserts the injections actually FIRED (a silently disabled probe
  *     must fail the gate, not pass it).
  *
  *  2. MID-SUITE EXECUTOR KILL: `local-cluster[4,8,4096]` with one
  *     executor hard-halted (Runtime.halt — no shutdown hooks, the
  *     OOM-kill shape) between queries, forcing executor-loss recovery:
  *     lost shuffle/cache blocks, task rescheduling, standalone relaunch.
  *
  * Coverage is the verdict's named set — the ParallelRank family
  * (q54/q160/q170), the CC label rounds (q44), the q141 delivery chain, a
  * streaming state-store gate (q130) — plus the quantile dispatch family
  * that shares ParallelRank's exchange (q12/q78/q120). Evidence runs at
  * sf0.01 are committed as bench_artifacts/r11/faultgate.md.
  */
class FaultGateSpec extends SparkSpec {

  private val covered = Seq(
    "q54_percentile_rank", "q160_roc_auc", "q170_stratified_folds",
    "q44_neardup_clusters", "q141_delivery_chain", "q130_streaming_scd2",
    "q12_summary_stats", "q78_weighted_quantiles", "q120_decile_binning",
    // round 12 (VERDICT r11 #5): the window-frame exchanges and the
    // TypedImperativeAggregate PARTIAL-merge path
    "q41_rolling_windows", "q164_rolling_median", "q57_sketch_quantiles")

  test("injected first-attempt task failures: results identical to the " +
    "no-fault build (scan/rank/cc/stream/window/agg scopes, maxFailures=4)") {
    val out = java.nio.file.Files.createTempDirectory("graft-fault-gate-")
    try {
      val (rc, childLog) = ChildVerify.fork(sf(), out.toFile, Map(
        "SPARK_GRAFT_MASTER" -> "local[8,4]",
        "SPARK_GRAFT_CPUS" -> "8",
        "SPARK_GRAFT_FAULT_SCOPES" -> "scan,rank,cc,stream,window,agg",
        // gate-sized graphs sit under the CC driver budget; pin it to 0 so
        // the DISTRIBUTED label rounds run (the `cc` probe's only surface)
        "SPARK_GRAFT_CONF" -> "spark.graft.cc.driverEdgeBudget=0",
        "SPARK_GRAFT_ONLY" -> covered.mkString(",")))
      assert(rc == 0, s"fault child failed rc=$rc; tail:\n" +
        childLog.takeRight(40).mkString("\n"))
      val childFails = childLog.filter(_.startsWith("[verify]"))
      assert(childFails.isEmpty,
        s"queries failed under fault injection:\n${childFails.mkString("\n")}")
      // the probes must have fired: a refactor that silently drops the
      // injection turns this gate into a no-op — fail loudly instead
      val fired = childLog.count(_.contains("graft fault injection"))
      assert(fired >= covered.size,
        s"only $fired injected failures logged — probes not firing")
      // per-scope firing: the suite-wide scan probe alone could satisfy the
      // aggregate count while a refactor silently dropped a narrower probe
      Seq("scan", "rank", "cc", "stream", "window", "agg").foreach { sc =>
        assert(childLog.exists(_.contains(s"scope=$sc")),
          s"scope '$sc' never fired — its probe is a no-op")
      }

      val diverged = ChildVerify.diverged(spark, out.toFile, sf(), covered)
      assert(diverged.isEmpty,
        s"${diverged.size} queries diverge under task retry:\n" +
          diverged.mkString("\n"))
    } finally ChildVerify.deleteRecursively(out.toFile)
  }

  test("mid-suite executor hard-kill under local-cluster: results " +
    "identical to the no-fault build") {
    val out = java.nio.file.Files.createTempDirectory("graft-kill-gate-")
    try {
      val (rc, childLog) = ChildVerify.fork(sf(), out.toFile, Map(
        "SPARK_GRAFT_MASTER" -> "local-cluster[4,8,4096]",
        "SPARK_GRAFT_CPUS" -> "8",
        // sorted order: kill lands after q120/q12 completed, before the
        // ParallelRank/CC/stream queries run on the degraded cluster
        "SPARK_GRAFT_KILL_AFTER" -> "2",
        "SPARK_GRAFT_ONLY" -> covered.mkString(",")))
      assert(rc == 0, s"kill child failed rc=$rc; tail:\n" +
        childLog.takeRight(40).mkString("\n"))
      val childFails = childLog.filter(_.startsWith("[verify]"))
      assert(childFails.isEmpty,
        s"queries failed after executor kill:\n${childFails.mkString("\n")}")
      assert(childLog.exists(_.contains("[fault] halting executor")),
        "executor kill did not happen — gate would be a no-op")
      assert(childLog.exists(_.contains("Lost executor")),
        "scheduler never observed the executor loss")

      val missing =
        covered.filterNot(n => new File(out.toFile, n).isDirectory)
      assert(missing.isEmpty, s"missing post-kill results: $missing")
      val diverged = ChildVerify.diverged(spark, out.toFile, sf(), covered)
      assert(diverged.isEmpty,
        s"${diverged.size} queries diverge after executor loss:\n" +
          diverged.mkString("\n"))
    } finally ChildVerify.deleteRecursively(out.toFile)
  }

  test("sink scope: injected crash between batch write and commit marker — " +
    "every batch replays through the torn-directory path, zero duplicates") {
    // round 12 (VERDICT r11 #2): the one at-least-once -> exactly-once
    // claim never exercised under injected failure. The crash lands in the
    // DANGEROUS half of the commit protocol — after the batch directory
    // became visible, before the marker — so a replay that trusted
    // directory existence would double-count, and a replay that blindly
    // appended would duplicate. Keyed per batch dir, the stream crashes
    // once per micro-batch: three batches, three crash/restart cycles, and
    // the sink must still hold each input row exactly once.
    val s = spark
    val root = java.nio.file.Files.createTempDirectory("graft-sink-fault-")
    val inDir = root.resolve("in")
    java.nio.file.Files.createDirectory(inDir)
    val sink = root.resolve("sink").toString
    val ckpt = root.resolve("ckpt").toString
    s.conf.set("spark.graft.fault.scopes", "sink")
    try {
      (0 until 3).foreach { i =>
        val lines = (0 until 10).map(j => s"""{"v":${i * 10 + j}}""")
        val p = java.nio.file.Files.write(inDir.resolve(s"f_$i.json"),
          lines.mkString("\n").getBytes("UTF-8"))
        // mtime spacing: batch order = file order (same trick as
        // StreamRecoverySpec)
        java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(
            1000000000000L + i * 1000L))
        ()
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType)))
      def start() = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").json(inDir.toString)
        .writeStream
        .foreachBatch(graft.streaming.IdempotentSink.intoPath(sink))
        .option("checkpointLocation", ckpt).start()
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(e => Option(e.getMessage).getOrElse("")).toSeq
      var crashes = 0
      var done = false
      while (!done) {
        val q = start()
        try { q.processAllAvailable(); done = true }
        catch {
          case e: org.apache.spark.sql.streaming.StreamingQueryException =>
            assert(chain(e).exists(_.contains("graft fault injection")),
              s"stream died of a REAL failure, not the probe: ${chain(e)}")
            crashes += 1
            assert(crashes <= 10, "crash/restart loop not converging")
        } finally q.stop()
      }
      assert(crashes == 3,
        s"expected one injected commit crash per batch (3), got $crashes")
      val out = graft.streaming.IdempotentSink.committedBatches(s, sink).get
      assert(out.count() == 30, "sink must hold every input row exactly once")
      assert(out.select("v").distinct().count() == 30,
        "replay duplicated rows through the commit-crash window")
      val batchDirs = new File(sink).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch=")).toSeq
      assert(batchDirs.size == 3 && batchDirs.forall(d =>
        new File(d, "_COMMITTED").exists()),
        "every batch directory must exist and carry its commit marker")
    } finally {
      s.conf.unset("spark.graft.fault.scopes")
      ChildVerify.deleteRecursively(root.toFile)
    }
  }
}
