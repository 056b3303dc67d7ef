package graft.fault

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.graft.{Bridge, FaultOnce}

/** Fault-injection hooks for the correctness gate (round 11, VERDICT r10
  * #1). At 100 TB, task retries, stage re-execution and speculative re-runs
  * are routine; round 10's ParallelRank bug (rank corruption from an
  * un-contracted assumption of re-execution consistency, caught only by a
  * layout change at sf0.1) proved nothing in the suite was testing them.
  * This module lets the driver-contract gate (`graft.Verify`) run the
  * declared query surface with
  *
  *  - deterministic first-attempt task failures injected into chosen
  *    scopes (every task of a covered stage fails once and is retried),
  *    via the [[org.apache.spark.sql.graft.FaultOnce]] expression; and
  *  - a hard mid-suite executor kill under `local-cluster` masters
  *    (Runtime.halt in a task — shutdown hooks deliberately skipped, the
  *    closest sandbox equivalent of an OOM-killed container), forcing
  *    executor-loss recovery: lost shuffle/cache blocks, stage
  *    re-execution, relaunch.
  *
  * Insertion is PLAN-TIME and conf-gated: `probe` is an identity function
  * unless `spark.graft.fault.scopes` (comma list) names its scope, so
  * production plans never carry the expression — the same latching
  * discipline as the bench's A/B conf overlay. Scopes wired in round 11:
  *
  *  - `scan`  — every Tables accessor (all stage-1 table reads, suite-wide)
  *  - `rank`  — ParallelRank's bucketed range exchange (the reduce side of
  *              the pinned exchange: exactly the round-10 bug's surface)
  *  - `cc`    — each ConnectedComponents label round before its
  *              localCheckpoint materialization
  *  - `stream`— the q130 SCD2 gate's event stream (per-micro-batch task
  *              retry against live state stores)
  *
  * Round 12 (VERDICT r11 #2/#5) widens to the three surfaces retry had not
  * crossed:
  *
  *  - `window`— above the Temporal/Features frame computations, so the
  *              retried task re-executes the window sort + frame evaluation
  *              and re-fetches the window exchange's shuffle blocks
  *  - `agg`   — inside `KllSketchAgg.merge` (FaultOnce.maybeFail): retry
  *              through deserialized PARTIAL aggregation buffers, a
  *              different re-execution path than any rescanned input
  *  - `sink`  — DRIVER-side, between IdempotentSink's batch write and its
  *              commit marker (the dangerous half of exactly-once): the
  *              replay must find the torn directory and rewrite it, never
  *              duplicate it
  */
object FaultInjection {

  def scopes(spark: SparkSession): Set[String] =
    spark.conf.getOption("spark.graft.fault.scopes")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)

  def enabled(spark: SparkSession, scope: String): Boolean =
    scopes(spark).contains(scope)

  /** Identity unless `scope` is enabled in the session conf; then a filter
    * that passes every row but throws once per task on attempt 0.
    */
  def probe(df: DataFrame, scope: String): DataFrame =
    if (!enabled(df.sparkSession, scope)) df
    else df.filter(Bridge.column(FaultOnce(scope)))

  /** Typed variant — `Dataset.filter(Column)` preserves the element type. */
  def probeDs[T](ds: Dataset[T], scope: String): Dataset[T] =
    if (!enabled(ds.sparkSession, scope)) ds
    else ds.filter(Bridge.column(FaultOnce(scope)))

  /** Driver-side once-per-key failure (the `sink` scope): throws
    * [[FaultOnce.InjectedCommitFailure]] the FIRST time a (scope, key) pair
    * is seen with the scope enabled — subsequent calls (the replay of the
    * same batch after restart) pass. Keyed per batch directory so a
    * multi-batch stream crashes once per batch, exercising the replay path
    * at every commit boundary, not just the first.
    */
  private val driverFired =
    scala.collection.concurrent.TrieMap[(String, String), Unit]()

  def driverFailOnce(spark: SparkSession, scope: String, key: String): Unit =
    if (enabled(spark, scope) &&
        driverFired.putIfAbsent((scope, key), ()).isEmpty) {
      System.err.println(s"[fault] injected commit failure scope=$scope key=$key")
      throw new FaultOnce.InjectedCommitFailure(scope, key)
    }

  /** Out-of-band executor kill: destroy one CoarseGrainedExecutorBackend
    * JVM directly through ProcessHandle — no Spark job involved, so the
    * kill lands MID-QUERY at an exact wall-clock offset regardless of
    * scheduler state (the in-band `killOneExecutor` needs free task slots,
    * which a running query may be holding). Picks the lowest-pid executor
    * process. Returns the killed pid, None when no executor process
    * exists (single-JVM masters).
    *
    * TEST HARNESS ONLY: invoked by `graft.Verify` under
    * SPARK_GRAFT_KILL_DURING — never from any operator or query.
    */
  def killExecutorProcess(): Option[Long] = {
    import scala.jdk.CollectionConverters._
    // victims restricted to DESCENDANTS of this JVM: a machine-wide scan
    // could destroy an executor of an unrelated concurrently-running Spark
    // app (a parallel `sbt test` fork, a simultaneous bench)
    val victims = ProcessHandle.current().descendants().iterator().asScala
      .filter(_.info().commandLine().map[Boolean](
        _.contains("CoarseGrainedExecutorBackend")).orElse(false))
      .toSeq.sortBy(_.pid())
    victims.headOption.map { p =>
      System.err.println(s"[fault] destroying executor process pid=${p.pid()}" +
        s" (of ${victims.map(_.pid()).mkString(",")})")
      p.destroyForcibly()
      p.pid()
    }.orElse {
      System.err.println("[fault] no executor processes found — kill skipped")
      None
    }
  }

  /** Hard-kill one executor process (lowest executor id observed task-side)
    * by halting its JVM from inside a task — skipping shutdown hooks, so
    * nothing gets flushed or committed on the way down. Tasks running on
    * the victim die with it and are retried elsewhere; the standalone
    * master relaunches the executor. A no-op (with a stderr note) in
    * single-JVM `local[N]` masters, where the only "executor" is the
    * driver itself. Returns the victim id, if any.
    *
    * TEST HARNESS ONLY: invoked by `graft.Verify` when
    * SPARK_GRAFT_KILL_AFTER is set — never from any operator or query.
    */
  def killOneExecutor(spark: SparkSession): Option[String] = {
    val sc = spark.sparkContext
    val ids = sc.parallelize(1 to 64, 16)
      .map(_ => org.apache.spark.SparkEnv.get.executorId)
      .distinct().collect().filterNot(_ == "driver").sorted
    ids.headOption.map { victim =>
      System.err.println(s"[fault] halting executor $victim " +
        s"(of ${ids.mkString(",")})")
      try {
        sc.parallelize(1 to 64, 16).foreach { _ =>
          if (org.apache.spark.SparkEnv.get.executorId == victim)
            java.lang.Runtime.getRuntime.halt(137)
        }
      } catch {
        // the kill job itself may surface the executor loss as task
        // failures beyond maxFailures if every retry lands back on the
        // dying victim; the KILL succeeded either way — swallow and let
        // the next query prove recovery
        case e: org.apache.spark.SparkException =>
          System.err.println(s"[fault] kill job reported: ${e.getMessage}")
      }
      victim
    }.orElse {
      System.err.println("[fault] no separate executor processes " +
        "(single-JVM master) — kill skipped")
      None
    }
  }
}
