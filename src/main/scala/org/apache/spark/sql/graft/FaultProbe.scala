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
}
