package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KLL-style mergeable quantile sketch buffer: levels of capacity `k`, a
  * full level sorts and keeps alternate elements (deterministic alternating
  * offset instead of KLL's random coin — replayable across runs), pushing
  * survivors one level up with implicit weight doubling. Memory is
  * O(k log(n/k)); rank error ~O(n/k) with the uniform-capacity variant.
  * While total input fits level 0 (n <= k) nothing compacts and rank
  * queries are EXACT.
  */
final class KllBuffer(val k: Int) {
  val levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(ArrayBuffer.empty[Double])
  val parities: ArrayBuffer[Boolean] = ArrayBuffer(false)
  var count: Long = 0L

  def add(v: Double): Unit = {
    levels(0) += v
    count += 1L
    cascade()
  }

  private def ensureLevel(l: Int): Unit =
    while (levels.size <= l) { levels += ArrayBuffer.empty[Double]; parities += false }

  /** Compact every overfull level bottom-up (a compaction can overfill the
    * next level).
    */
  def cascade(): Unit = {
    var l = 0
    while (l < levels.size) {
      if (levels(l).size > k) {
        val sorted = levels(l).sorted
        val off = if (parities(l)) 1 else 0
        parities(l) = !parities(l)
        ensureLevel(l + 1)
        var i = off
        while (i < sorted.size) { levels(l + 1) += sorted(i); i += 2 }
        levels(l).clear()
      }
      l += 1
    }
  }

  def merge(other: KllBuffer): Unit = {
    count += other.count
    var l = 0
    while (l < other.levels.size) {
      ensureLevel(l)
      levels(l) ++= other.levels(l)
      l += 1
    }
    cascade()
  }

  /** Value at (1-based) weighted rank max(ceil(q*count), 1) — the
    * first sorted value whose cumulative weight reaches the target. Exact
    * rank semantics while uncompacted.
    */
  def quantiles(qs: Seq[Double]): Seq[Double] = {
    val items = ArrayBuffer.empty[(Double, Long)]
    var l = 0
    while (l < levels.size) {
      val w = 1L << l
      levels(l).foreach(v => items += ((v, w)))
      l += 1
    }
    val sorted = items.sortBy(_._1)
    val w = sorted.map(_._2).sum
    qs.map { q =>
      val target = math.max(math.ceil(q * count).toLong, 1L)
      // scale target from count-space to retained-weight space (equal
      // while uncompacted; proportional after)
      val t = if (w == count) target
        else math.max(math.ceil(q * w).toLong, 1L)
      var cum = 0L
      var i = 0
      var out = sorted.last._1
      var found = false
      while (i < sorted.size && !found) {
        cum += sorted(i)._2
        if (cum >= t) { out = sorted(i)._1; found = true }
        i += 1
      }
      out
    }
  }
}

/** Single-pass mergeable quantile sketch aggregate (SURVEY §7.9's
  * "TypedImperativeAggregate over KLL"): per-partition sketches of
  * O(k log n) doubles merge instead of range-shuffling the column — the
  * approximate companion of the exact DistributedQuantiles/ParallelRank
  * paths when one pass over 100 TB is the budget. With k >= n the sketch
  * holds every value and the ranks are exact — the oracle-gate regime
  * (portable-exactness pattern, as with q43/q56). Deterministic alternating
  * compaction offsets replace KLL's random coin so results replay across
  * runs.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] with ImplicitCastInputTypes {

  require(k >= 8, s"sketch capacity must be >= 8, got $k")
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    s"quantiles must be in [0,1]: $qs")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "kll_quantiles"

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buffer: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllBuffer, other: KllBuffer): KllBuffer = {
    // fault gate, `agg` scope (round 12, VERDICT r11 #5): a retried FINAL
    // aggregation task re-deserializes and re-merges the shuffled PARTIAL
    // buffers — a re-execution path no scan/window probe crosses
    FaultOnce.maybeFail("agg")
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllBuffer): Any =
    if (buffer.count == 0L) null
    else new GenericArrayData(
      buffer.quantiles(qs).map(java.lang.Double.valueOf(_): Any).toArray)

  override def serialize(buffer: KllBuffer): Array[Byte] = {
    val n = buffer.levels.map(_.size).sum
    val bb = ByteBuffer.allocate(4 + 8 + 4 + buffer.levels.size * (4 + 1) + 8 * n)
    bb.putInt(buffer.k).putLong(buffer.count).putInt(buffer.levels.size)
    buffer.levels.zip(buffer.parities).foreach { case (lvl, par) =>
      bb.put(if (par) 1.toByte else 0.toByte)
      bb.putInt(lvl.size)
      lvl.foreach(bb.putDouble)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new KllBuffer(bb.getInt)
    b.count = bb.getLong
    val nLevels = bb.getInt
    b.levels.clear(); b.parities.clear()
    (0 until nLevels).foreach { _ =>
      b.parities += (bb.get() == 1.toByte)
      val sz = bb.getInt
      val lvl = ArrayBuffer.empty[Double]
      (0 until sz).foreach(_ => lvl += bb.getDouble)
      b.levels += lvl
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Same sketch, raw output: the merged KllBuffer in its wire format
  * (BinaryType). Lets a driver-side consumer query the one-scan sketch at
  * arbitrary ranks (bracketing, iterative refinement) without re-scanning
  * per probe set — the SketchExact.quantiles pattern. Decode with
  * [[KllSketchRawAgg.decode]].
  */
case class KllSketchRawAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] with ImplicitCastInputTypes {

  require(k >= 8, s"sketch capacity must be >= 8, got $k")

  private val proto = KllSketchAgg(child, k, Seq(0.5))

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch_raw"

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)
  override def update(buffer: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }
  override def merge(buffer: KllBuffer, other: KllBuffer): KllBuffer = {
    buffer.merge(other)
    buffer
  }
  override def eval(buffer: KllBuffer): Any = serialize(buffer)
  override def serialize(buffer: KllBuffer): Array[Byte] = proto.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): KllBuffer = proto.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchRawAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchRawAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KllSketchRawAgg {
  def decode(bytes: Array[Byte]): KllBuffer =
    KllSketchAgg(org.apache.spark.sql.catalyst.expressions.Literal(0.0),
      8, Seq(0.5)).deserialize(bytes)
}
