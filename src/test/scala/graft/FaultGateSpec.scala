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
    "q12_summary_stats", "q78_weighted_quantiles", "q120_decile_binning")

  test("injected first-attempt task failures: results identical to the " +
    "no-fault build (scan/rank/cc/stream scopes, maxFailures=4)") {
    val out = java.nio.file.Files.createTempDirectory("graft-fault-gate-")
    try {
      val (rc, childLog) = ChildVerify.fork(sf(), out.toFile, Map(
        "SPARK_GRAFT_MASTER" -> "local[8,4]",
        "SPARK_GRAFT_CPUS" -> "8",
        "SPARK_GRAFT_FAULT_SCOPES" -> "scan,rank,cc,stream",
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
}
