package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed the public `Column(Expression)` constructor; the blessed
  * internal route is `classic.ExpressionUtils` (private[sql], hence this
  * bridge living under org.apache.spark.sql).
  */
object Bridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Unpersist the RDD behind a `localCheckpoint()`ed Dataset. Checkpointing
    * persists the internal RDD directly (NOT through the CacheManager), so
    * `Dataset.unpersist()` can't release it; iterative algorithms that
    * checkpoint per round would otherwise accumulate one cached label RDD
    * per iteration in executor storage for the life of the session. The
    * checkpointed plan is a `LogicalRDD` leaf (private[sql], hence this
    * helper living under org.apache.spark.sql).
    */
  def unpersistCheckpointed(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** Apply a SparkSessionExtensions' injected functions to a live session's
    * registry (`registerFunctions` is private[sql]) — lets tests exercise
    * the spark.sql.extensions path without booting a second SparkContext.
    */
  def applyInjectedFunctions(ext: org.apache.spark.sql.SparkSessionExtensions,
      spark: org.apache.spark.sql.SparkSession): Unit =
    ext.registerFunctions(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry)
}
