package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** One-buffer MinHash signature aggregate: `numPerm` universal-hash minima
  * computed in a single long-array buffer per group, replacing `numPerm`
  * independent `min((a_i * h + b_i) % p)` aggregate expressions. The wide
  * form evaluates `numPerm` expression trees per input row through the
  * aggregate codepath; this is one child eval + a tight primitive loop, and
  * the aggregation buffer is a single array instead of `numPerm` columns.
  * Identical output by construction: same (a, b) parameters, same modulus,
  * same min semantics (merge = elementwise min — fully partial-aggregable).
  *
  * `child` must be the pre-reduced token hash in [0, p) — hashing once in a
  * projection, NOT here, keeps the md5 out of the per-permutation loop.
  */
case class MinHashSigAgg(
    child: Expression,
    params: Seq[(Long, Long)],
    p: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  private val numPerm = params.length
  @transient private lazy val as: Array[Long] = params.map(_._1).toArray
  @transient private lazy val bs: Array[Long] = params.map(_._2).toArray

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerm)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numPerm) {
        val x = (as(i) * h + bs(i)) % p
        if (x < buffer(i)) buffer(i) = x
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], input: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerm) {
      if (input(i) < buffer(i)) buffer(i) = input(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.map(java.lang.Long.valueOf(_): Any))

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerm)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerm)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** One-buffer SimHash aggregate: the 60 occurrence-weighted bit sums in a
  * single long-array buffer (replacing 60 conditional-sum aggregate
  * columns), folded to the signature long at eval. Merge is elementwise
  * addition — fully partial-aggregable. `child` is the 60-bit token hash.
  */
case class SimHashSigAgg(
    child: Expression,
    bits: Int = 60,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        buffer(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], input: Array[Long]): Array[Long] = {
    var b = 0
    while (b < bits) { buffer(b) += input(b); b += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (buffer(b) > 0L) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bits)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
