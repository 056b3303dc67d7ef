package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact value histogram of a bounded-domain numeric column as a MERGEABLE
  * aggregate: the buffer is a (value -> count) map capped at `capacity`
  * distinct values. Map-side partials collapse every repeat before the
  * exchange, so a 100 TB column with an enum/integer/currency-grain domain
  * shuffles at most `capacity` (double, long) entries per partition — the
  * one-job alternative to melting N columns into rows and hash-aggregating
  * (group, value) pairs (N aggregate buffers ride ONE scan; no generator,
  * no per-value row exchange).
  *
  * Exactness is a hard contract, not a sketch: exceeding `capacity`
  * distinct values throws (the caller declared a bounded grid — an
  * unbounded column belongs on the range-shuffle order-statistics path,
  * graft.operators.DistributedQuantiles.run). Output: array<struct<v,
  * cnt>> sorted ascending by value — deterministic under any partitioning.
  */
final class ValueHistogram(val capacity: Int) {
  val counts = new mutable.HashMap[Double, Long]()

  def add(v: Double, c: Long = 1L): Unit = {
    val n = counts.getOrElse(v, 0L)
    if (n == 0L && counts.size >= capacity)
      throw new IllegalStateException(
        s"value_histogram: more than $capacity distinct values — the column " +
          "is not on the declared bounded grid; use the range-shuffle " +
          "quantile path instead")
    counts.put(v, n + c)
  }

  def merge(other: ValueHistogram): Unit =
    other.counts.foreach { case (v, c) => add(v, c) }
}

case class ValueHistogramAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ValueHistogram]
  with ImplicitCastInputTypes {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("v", DoubleType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "value_histogram"

  override def createAggregationBuffer(): ValueHistogram =
    new ValueHistogram(capacity)

  override def update(buffer: ValueHistogram, input: InternalRow): ValueHistogram = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: ValueHistogram, other: ValueHistogram): ValueHistogram = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: ValueHistogram): Any = {
    val rows = buffer.counts.toSeq.sortBy(_._1)
      .map { case (v, c) => InternalRow(v, c) }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buffer: ValueHistogram): Array[Byte] = {
    val items = buffer.counts.toSeq
    val bb = ByteBuffer.allocate(8 + 16 * items.size)
    bb.putInt(buffer.capacity).putInt(items.size)
    items.foreach { case (v, c) => bb.putDouble(v); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ValueHistogram = {
    val bb = ByteBuffer.wrap(bytes)
    val h = new ValueHistogram(bb.getInt)
    val n = bb.getInt
    (0 until n).foreach(_ => h.counts.put(bb.getDouble, bb.getLong))
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ValueHistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ValueHistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
