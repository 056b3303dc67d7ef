package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expressions for dense float-vector math (SURVEY.md §7.9:
  * embedding similarity). A codegen'd expression keeps the inner loop inside
  * whole-stage codegen — no UDF boxing, no per-row closure dispatch — which is
  * what makes brute-force scoring of billions of candidate pairs viable.
  *
  * Inputs are `array<float>` (the storage type of the embeddings table);
  * accumulation is in double, sequential order, matching the obvious
  * single-pass C loop (and DuckDB's list_cosine_similarity on DOUBLE[]).
  * Null elements are not expected (dense embeddings) and read as 0.0.
  *
  * Lives under org.apache.spark.sql because `AbstractDataType` is
  * private[sql]; the public facade is graft.functions.VectorFunctions.
  */
abstract class FloatVectorBinaryOp extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  /** Combine (dot, normLeft, normRight) into the final value. */
  protected def finish(dot: Double, na: Double, nb: Double): Double
  /** Java call combining accumulators `dot`, `na`, `nb` into the target. */
  protected def finishCode(args: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      // promote BEFORE multiplying: float*float would round the product
      val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    finish(dot, na, nb)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ${finishCode(s"$dot, $na, $nb")};
       """.stripMargin
    })
}

/** cos(a, b) = dot / sqrt(|a|^2 * |b|^2); 0.0 when either norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends FloatVectorBinaryOp {
  override def prettyName: String = "cosine_sim"
  protected def finish(dot: Double, na: Double, nb: Double): Double =
    CosineSimilarity.finishJava(dot, na, nb)
  protected def finishCode(args: String): String =
    s"org.apache.spark.sql.graft.CosineSimilarity.finishJava($args)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Called from generated code. */
  def finishJava(dot: Double, na: Double, nb: Double): Double =
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
}

/** Plain dot product (used for LSH hyperplane projections). */
case class DotProduct(left: Expression, right: Expression)
    extends FloatVectorBinaryOp {
  override def prettyName: String = "dot_product"
  protected def finish(dot: Double, na: Double, nb: Double): Double = dot
  protected def finishCode(args: String): String = {
    val dot = args.split(",")(0)
    s"($dot)"
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ALL sign-LSH plane projections of one embedding fused into a single
  * pass: bit p of the long result is 1 iff the dot product with plane p is
  * >= 0. Replaces `numPlanes` separate DotProductFD evaluations plus a
  * when/sum chain (q31/q35 evaluated 48 per row) with one plane-major loop
  * over a plan-embedded double[][] — same memory traffic as ONE dot per
  * plane, no per-plane expression dispatch.
  *
  * Each per-plane accumulation is sequential ascending-index double — bit-
  * identical to DotProductFD, so portable-plane sign decisions still replay
  * exactly in the SQL oracle. Band buckets slice the packed long with
  * shiftright/&, so multi-band LSH costs one evaluation total.
  */
case class SignProjectionBits(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {
  require(planes.nonEmpty && planes.length <= 63,
    s"sign_projection_bits supports 1..63 planes, got ${planes.length}")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_projection_bits"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var bits = 0L
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      val n = math.min(x.numElements(), w.length)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += x.getFloat(j).toDouble * w(j); j += 1 }
      if (dot >= 0.0) bits |= 1L << p
      p += 1
    }
    bits
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("planes", planes, "double[][]")
      val bits = ctx.freshName("bits")
      val p = ctx.freshName("p")
      val w = ctx.freshName("w")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val j = ctx.freshName("j")
      s"""
         |long $bits = 0L;
         |for (int $p = 0; $p < ${planes.length}; $p++) {
         |  double[] $w = $ref[$p];
         |  int $n = java.lang.Math.min($a.numElements(), $w.length);
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $dot += ((double) $a.getFloat($j)) * $w[$j];
         |  }
         |  if ($dot >= 0.0) $bits |= 1L << $p;
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Dot product of a float vector with a DOUBLE vector — the portable-LSH
  * projection: double plane components are exactly reproducible in SQL
  * (the sign decision must be bit-identical across engines, so the plane
  * weights can't round-trip through float32). Ascending-index sequential
  * double accumulation, matching `list_sum(list_transform(...))`.
  */
case class DotProductFD(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_fd"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getDouble(i)
      i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.getFloat($i)) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
