package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{Bridge, CosineSimilarity, DotProduct}

/** Column-level entry points for the native float-vector expressions
  * (org.apache.spark.sql.graft.VectorExpressions).
  */
object VectorFunctions {

  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
