package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable streaming histogram (Ben-Haim & Tom-Hayes, "A Streaming
  * Parallel Decision Tree Algorithm", JMLR 2010): at most `maxBins`
  * (centroid, count) bins; inserting collapses the closest centroid pair by
  * weighted mean. Supports the single-pass sketch path for drift statistics
  * at 100 TB (SURVEY.md §4.3: "v2: single-pass TypedImperativeAggregate
  * over sketches") — the exact distinct-value KS (graft.drift.KsTest) stays
  * the small-scale oracle.
  */
final class HistogramBuffer(val maxBins: Int) {
  // kept sorted by centroid
  val centroids: ArrayBuffer[Double] = ArrayBuffer.empty
  val counts: ArrayBuffer[Long] = ArrayBuffer.empty

  def insert(v: Double, n: Long = 1L): Unit = {
    // binary search in place — copying to an array per row would allocate
    // O(maxBins) on the hottest path of the aggregate
    var lo = 0
    var hi = centroids.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val c = centroids(mid)
      if (c < v) lo = mid + 1
      else if (c > v) hi = mid
      else { counts(mid) += n; return }
    }
    centroids.insert(lo, v)
    counts.insert(lo, n)
    if (centroids.length > maxBins) collapseClosest()
  }

  def mergeWith(other: HistogramBuffer): Unit = {
    var i = 0
    while (i < other.centroids.length) {
      insert(other.centroids(i), other.counts(i))
      i += 1
    }
  }

  private def collapseClosest(): Unit = {
    var best = 0
    var bestGap = Double.MaxValue
    var i = 0
    while (i < centroids.length - 1) {
      val gap = centroids(i + 1) - centroids(i)
      if (gap < bestGap) { bestGap = gap; best = i }
      i += 1
    }
    val n = counts(best) + counts(best + 1)
    val c = (centroids(best) * counts(best) +
      centroids(best + 1) * counts(best + 1)) / n
    centroids(best) = c
    counts(best) = n
    centroids.remove(best + 1)
    counts.remove(best + 1)
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(maxBins)
    out.writeInt(centroids.length)
    var i = 0
    while (i < centroids.length) {
      out.writeDouble(centroids(i)); out.writeLong(counts(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }
}

object HistogramBuffer {
  def deserialize(bytes: Array[Byte]): HistogramBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new HistogramBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      buf.centroids += in.readDouble()
      buf.counts += in.readLong()
      i += 1
    }
    buf
  }
}

/** Aggregate function: histogram_sketch(value, maxBins) →
  * array<struct<centroid double, n bigint>> sorted by centroid. Nulls are
  * skipped. Partial aggregation is native: buffers merge exactly like any
  * built-in aggregate, so the plan is map-side sketch + one tiny shuffle of
  * maxBins bins per partition.
  */
case class HistogramSketchAgg(
    child: Expression,
    maxBins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HistogramBuffer] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("centroid", DoubleType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "histogram_sketch"

  override def createAggregationBuffer(): HistogramBuffer =
    new HistogramBuffer(maxBins)

  override def update(buffer: HistogramBuffer, input: InternalRow): HistogramBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: HistogramBuffer, input: HistogramBuffer): HistogramBuffer = {
    buffer.mergeWith(input)
    buffer
  }

  override def eval(buffer: HistogramBuffer): Any =
    new GenericArrayData(
      buffer.centroids.indices.map { i =>
        InternalRow(buffer.centroids(i), buffer.counts(i))
      }.toArray[Any])

  override def serialize(buffer: HistogramBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): HistogramBuffer =
    HistogramBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
