package org.apache.spark.sql.graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Deterministic first-attempt task failure, as an expression (the fault
  * gate's injection kernel — round 11, VERDICT r10 #1): evaluates to
  * `true`, except that ON ATTEMPT 0 of every task it throws
  * [[InjectedTaskFailure]] at the first row it sees. With
  * `spark.task.maxFailures` > 1 the scheduler retries the task (attempt 1
  * passes), so every covered stage executes under real task re-execution —
  * the failure class round 10's ParallelRank bug proved live (correctness
  * silently resting on re-execution consistency Spark does not contract).
  *
  * Marked nondeterministic so it can never constant-fold driver-side or be
  * pushed into a parquet scan's PushedFilters (it must run inside the task
  * body), and CodegenFallback because the fault gate is the only consumer —
  * the expression is only ever INSERTED when `spark.graft.fault.scopes`
  * enables its scope at plan-build time (see graft.fault.FaultInjection);
  * production plans never contain it.
  */
case class FaultOnce(scope: String)
    extends LeafExpression with Nondeterministic with CodegenFallback {

  override def nullable: Boolean = false
  override def dataType: DataType = BooleanType

  @transient private var pid: Int = -1

  override protected def initializeInternal(partitionIndex: Int): Unit =
    pid = partitionIndex

  override protected def evalInternal(input: InternalRow): Any = {
    val tc = TaskContext.get()
    if (tc != null && tc.attemptNumber() == 0)
      throw new FaultOnce.InjectedTaskFailure(scope, pid, tc.stageId())
    true
  }

  override def prettyName: String = "fault_once"
}

object FaultOnce {
  /** Loud, attributable, and distinguishable from any real failure. */
  final class InjectedTaskFailure(scope: String, partition: Int, stage: Int)
      extends RuntimeException(
        s"graft fault injection: scope=$scope stage=$stage " +
          s"partition=$partition attempt=0 (expected to be retried)")

  /** Driver-side injected failure (the `sink` scope): thrown between a
    * sink's side-effect write and its commit record — the dangerous half of
    * an exactly-once protocol, where a crash leaves visible-but-uncommitted
    * output that a replay must discard, not duplicate.
    */
  final class InjectedCommitFailure(scope: String, key: String)
      extends RuntimeException(
        s"graft fault injection: scope=$scope key=$key " +
          "(crash after write, before commit — replay must not duplicate)")

  /** Task-side scope check for imperative call sites that cannot host an
    * expression — specifically a TypedImperativeAggregate's MERGE path,
    * where re-execution flows through deserialized PARTIAL buffers rather
    * than a rescanned input (round 12, VERDICT r11 #5). Throws once per
    * task on attempt 0 when `spark.graft.fault.scopes` (read from the
    * executor's SparkConf — Verify sets it at session build, so it reaches
    * every executor) names the scope; the retried attempt passes. A no-op
    * outside tasks and in production (conf absent).
    */
  def maybeFail(scope: String): Unit = {
    val tc = TaskContext.get()
    if (tc != null && tc.attemptNumber() == 0) {
      val env = org.apache.spark.SparkEnv.get
      if (env != null && env.conf.get("spark.graft.fault.scopes", "")
            .split(",").map(_.trim).contains(scope))
        throw new InjectedTaskFailure(scope, tc.partitionId(), tc.stageId())
    }
  }
}
