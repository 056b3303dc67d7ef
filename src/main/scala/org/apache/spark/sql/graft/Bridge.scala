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
