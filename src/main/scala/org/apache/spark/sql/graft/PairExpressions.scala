package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** All i<j combinations of a long-id array as an array<struct<da,db>> — the
  * pair-generation kernel of every candidate-join dedup operator (documents
  * sharing a shingle / LSH band / SimHash chunk).
  *
  * Semantically identical to the nested higher-order form
  * `flatten(transform(sequence(...), i -> transform(sequence(...), j ->
  * struct(ids[i], ids[j]))))`, but runs as one compiled loop: higher-order
  * lambdas are interpreted per element, which dominates the runtime when a
  * corpus generates millions of candidate pairs.
  */
case class PairCombinations(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("da", LongType, nullable = false),
      StructField("db", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "pair_combinations"

  override def nullSafeEval(input: Any): Any =
    PairCombinations.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.PairCombinations.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PairCombinations {
  def compute(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = ids.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = InternalRow(a, ids.getLong(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
