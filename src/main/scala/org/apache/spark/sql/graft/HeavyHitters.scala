package org.apache.spark.sql.graft

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-memory heavy-hitters summary (Metwally et al.'s Space-Saving /
  * stream-summary): at most `capacity` (item, count, err) entries; a miss
  * on a full summary evicts the current minimum m and books the newcomer at
  * m+1 with err=m. Estimates are one-sided: est >= true >= est - err.
  */
final class SpaceSavingSummary(val capacity: Int) {
  val counts = new mutable.HashMap[String, Array[Long]]() // item -> [cnt, err]

  def add(item: String, inc: Long = 1L, err: Long = 0L): Unit =
    counts.get(item) match {
      case Some(ce) => ce(0) += inc; ce(1) += err
      case None if counts.size < capacity =>
        counts.put(item, Array(inc, err))
      case None =>
        // evict the minimum-count entry (deterministic: smallest item wins
        // ties so parallel runs agree); newcomer inherits its count bound
        var minK: String = null; var minC = Long.MaxValue
        counts.foreach { case (k, ce) =>
          if (ce(0) < minC || (ce(0) == minC && (minK == null || k < minK))) {
            minC = ce(0); minK = k
          }
        }
        counts.remove(minK)
        counts.put(item, Array(minC + inc, minC + err))
    }

  /** Minimum tracked count — the upper bound on any UNtracked item's true
    * count in this summary's stream (0 while under capacity: nothing was
    * ever evicted, so untracked means never seen).
    */
  def minIfFull: Long =
    if (counts.size < capacity || counts.isEmpty) 0L
    else counts.valuesIterator.map(_(0)).min

  /** Merge `other` in (Cafaro/Agarwal merged-summary rule): an item absent
    * from one side could have occurred up to that side's minimum tracked
    * count there, so its combined estimate adds that minimum to BOTH cnt
    * and err; shared items add counts and error bounds directly. Then trim
    * back to capacity keeping the largest counts (bounds hold for every
    * reported item). Exact — err stays 0 — while both sides are under
    * capacity.
    */
  def merge(other: SpaceSavingSummary): Unit = {
    val myMin = minIfFull
    val otherMin = other.minIfFull
    if (otherMin > 0) counts.foreach { case (k, ce) =>
      if (!other.counts.contains(k)) { ce(0) += otherMin; ce(1) += otherMin }
    }
    other.counts.foreach { case (k, ce) =>
      counts.get(k) match {
        case Some(mine) => mine(0) += ce(0); mine(1) += ce(1)
        case None => counts.put(k, Array(ce(0) + myMin, ce(1) + myMin))
      }
    }
    if (counts.size > capacity) {
      val keep = counts.toSeq
        .sortBy { case (k, ce) => (-ce(0), k) }
        .take(capacity)
      counts.clear()
      keep.foreach { case (k, ce) => counts.put(k, ce) }
    }
  }
}

/** Heavy-hitters aggregate over a string column: the mergeable sketch path
  * for corpus token statistics at 100 TB — per-partition summaries of
  * `capacity` entries shuffle and merge instead of the full distinct-token
  * frame (an exact groupBy of a web-scale token stream shuffles billions of
  * keys; this shuffles `capacity` rows per partition, one-sided error
  * bounded by the evicted minima). With `capacity` >= the true distinct
  * count nothing ever evicts and every count is exact — the oracle-gate
  * regime (same portable-exactness pattern as the q43 IVF probe).
  *
  * Output: array<struct<item, cnt, err>> sorted by (cnt desc, item) —
  * deterministic for exact summaries.
  */
case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingSummary]
  with ImplicitCastInputTypes {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): SpaceSavingSummary =
    new SpaceSavingSummary(capacity)

  override def update(buffer: SpaceSavingSummary,
      input: InternalRow): SpaceSavingSummary = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: SpaceSavingSummary,
      other: SpaceSavingSummary): SpaceSavingSummary = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: SpaceSavingSummary): Any = {
    val rows = buffer.counts.toSeq
      .sortBy { case (k, ce) => (-ce(0), k) }
      .map { case (k, ce) =>
        InternalRow(UTF8String.fromString(k), ce(0), ce(1))
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buffer: SpaceSavingSummary): Array[Byte] = {
    val items = buffer.counts.toSeq
    val bytes = items.map { case (k, _) => k.getBytes(StandardCharsets.UTF_8) }
    val size = 8 + items.map(_ => 20).sum + bytes.map(_.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buffer.capacity).putInt(items.size)
    items.zip(bytes).foreach { case ((_, ce), b) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(ce(0)); bb.putLong(ce(1))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingSummary = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new SpaceSavingSummary(bb.getInt)
    val n = bb.getInt
    (0 until n).foreach { _ =>
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      s.counts.put(new String(b, StandardCharsets.UTF_8),
        Array(bb.getLong, bb.getLong))
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Space-Saving over every character n-gram of a text column, updating the
  * summary INLINE per document row instead of exploding one row per n-gram:
  * the generator (`transform(sequence(...), substring)` + explode) costs an
  * array allocation and a full operator-pipeline row transition per n-gram —
  * for corpus-scale text that is billions of row transitions whose only
  * purpose is feeding an aggregate that immediately re-compresses them to
  * `capacity` entries. Here the n-gram walk happens inside update(), so the
  * per-row cost is the substring loop alone and the plan stays a single
  * scan + single aggregate.
  *
  * N-gram semantics match the SQL generator the oracle replays
  * (`substr(text, i, n)` for i in 1..greatest(len-(n-1), 1), SQL
  * character — not byte — positions): a text shorter than n contributes
  * its whole self (the empty string for empty text), exactly like
  * substring's clamped-window behavior.
  */
case class SpaceSavingNgramsAgg(
    child: Expression,
    n: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingSummary]
  with ImplicitCastInputTypes {

  require(n >= 1, s"n must be >= 1, got $n")
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "heavy_hitter_ngrams"

  override def createAggregationBuffer(): SpaceSavingSummary =
    new SpaceSavingSummary(capacity)

  override def update(buffer: SpaceSavingSummary,
      input: InternalRow): SpaceSavingSummary = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String]
      val last = math.max(t.numChars() - (n - 1), 1)
      var i = 1
      while (i <= last) {
        buffer.add(t.substringSQL(i, n).toString)
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: SpaceSavingSummary,
      other: SpaceSavingSummary): SpaceSavingSummary = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: SpaceSavingSummary): Any = {
    val rows = buffer.counts.toSeq
      .sortBy { case (k, ce) => (-ce(0), k) }
      .map { case (k, ce) =>
        InternalRow(UTF8String.fromString(k), ce(0), ce(1))
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buffer: SpaceSavingSummary): Array[Byte] =
    SpaceSavingAgg(child, capacity).serialize(buffer)
  override def deserialize(bytes: Array[Byte]): SpaceSavingSummary =
    SpaceSavingAgg(child, capacity).deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingNgramsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingNgramsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Exact counts of a FIXED candidate n-gram set over a text column, one
  * long per candidate, walked inline per row (same n-gram semantics as
  * SpaceSavingNgramsAgg). This is the verify pass of sketch-then-recount
  * top-k: the aggregate state is exactly |candidates| longs regardless of
  * the corpus' n-gram cardinality, and the exchange carries one such
  * vector per partition. Output: array<long> in candidate order.
  */
case class NgramCandidateCountsAgg(
    child: Expression,
    n: Int,
    candidates: Seq[String],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes {

  require(n >= 1, s"n must be >= 1, got $n")
  require(candidates.nonEmpty, "empty candidate set")

  @transient private lazy val index: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](candidates.size * 2)
    candidates.zipWithIndex.foreach { case (c, i) =>
      m.put(UTF8String.fromString(c), i)
    }
    m
  }

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_candidate_counts"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](candidates.size)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String]
      val last = math.max(t.numChars() - (n - 1), 1)
      var i = 1
      while (i <= last) {
        val idx = index.get(t.substringSQL(i, n))
        if (idx != null) buffer(idx) += 1L
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): NgramCandidateCountsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NgramCandidateCountsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
