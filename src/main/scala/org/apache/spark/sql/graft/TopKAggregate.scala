package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k heap buffer: the k best (ord, id) pairs under the total
  * order "larger ord wins, ties to the smaller id" — exactly
  * `row_number() OVER (ORDER BY ord DESC, id) <= k`.
  */
final class TopKBuffer(val k: Int) {
  // worst-first heap so the cutoff element is O(1) to inspect/replace
  private val worstFirst: Ordering[(Double, Long)] = Ordering.fromLessThan {
    case ((v1, i1), (v2, i2)) => v1 < v2 || (v1 == v2 && i1 > i2)
  }
  val heap = new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
    worstFirst.reverse) // PriorityQueue dequeues the MAX of its ordering —
                        // reverse makes that the WORST element

  def add(v: Double, id: Long): Unit =
    if (heap.size < k) heap.enqueue((v, id))
    else {
      val (wv, wi) = heap.head
      if (v > wv || (v == wv && id < wi)) { heap.dequeue(); heap.enqueue((v, id)) }
    }

  def mergeFrom(other: TopKBuffer): Unit =
    other.heap.foreach { case (v, id) => add(v, id) }

  /** Best-first (rank order: ord desc, id asc). */
  def sortedBest: Seq[(Double, Long)] =
    heap.toSeq.sortBy { case (v, id) => (-v, id) }
}

/** Top-k-per-group as a bounded-heap aggregate — the scale replacement for
  * `row_number() OVER (PARTITION BY g ORDER BY ord DESC, id) <= k`: the
  * window form SORTS every row of every group; this keeps exactly k pairs
  * per group through map-side partial aggregation, so a billion-row group
  * shuffles k tuples. Output: array<struct<ord, id>> in rank order —
  * bit-identical to the window result for distinct (ord, id) pairs (ties
  * on ord break to the smaller id, mirroring ORDER BY ord DESC, id) —
  * PROVIDED rows with a null ord or id are excluded on both sides: this
  * aggregate drops them (update() skips nulls), while a bare window rank
  * would place null ords last (NULLS LAST). Window-equivalence oracles
  * must therefore filter `ord IS NOT NULL AND id IS NOT NULL`, or a group
  * with fewer than k non-null rows plus a null row diverges.
  */
case class TopKByAgg(
    ord: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(ord, id)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_by"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = ord.eval(input)
    val i = id.eval(input)
    if (v != null && i != null)
      buffer.add(v.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sortedBest.map { case (v, i) =>
      InternalRow(v, i)
    }.toArray[Any])

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val items = buffer.heap.toSeq
    val bb = ByteBuffer.allocate(8 + 16 * items.size)
    bb.putInt(buffer.k).putInt(items.size)
    items.foreach { case (v, i) => bb.putDouble(v); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(bb.getInt)
    val n = bb.getInt
    (0 until n).foreach(_ => b.add(bb.getDouble, bb.getLong))
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ord = newChildren(0), id = newChildren(1))
}
