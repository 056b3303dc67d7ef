package org.apache.spark.sql.graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-n-gram shingles (the MinHash/Jaccard unit).
  *
  * Semantically identical to the composed higher-order form
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ', ...)))` over
  * `split(text, ' ')`, but ~15× faster: higher-order lambdas are interpreted
  * per element in Spark, while this runs one compiled pass per row inside
  * whole-stage codegen. Shingling sits under every dedup operator, so it is
  * the hottest text kernel in the engine.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Number of whitespace tokens of `child` contained in `words` (duplicates
  * counted) — the kernel under stopword ratios and marker-lexicon language
  * ID. One compiled pass with a hash-set probe per token; the composed
  * higher-order form (`filter(split(...), t -> array_contains(...))`) is
  * interpreted per token and dominates text-feature scans.
  */
case class TextHitCount(child: Expression, words: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "text_hit_count"

  @transient private lazy val wordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    words.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    TextHitCount.compute(input.asInstanceOf[UTF8String], wordSet)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet,
      "java.util.HashSet<String>")
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextHitCount.compute($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextHitCount {
  def compute(text: UTF8String, words: java.util.HashSet[String]): Int = {
    val toks = text.toString.split(" ", -1)
    var hits = 0
    var i = 0
    while (i < toks.length) {
      if (words.contains(toks(i))) hits += 1
      i += 1
    }
    hits
  }
}

/** 16-bucket high-nibble byte histogram of a binary column — the
  * deterministic "feature extraction" kernel of the multimodal stub
  * pipeline. One compiled pass over the raw bytes; the composed form
  * (hex → regexp_replace → 16 translate scans) re-reads the payload 17
  * times.
  */
case class ByteHistogram(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.BinaryType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "byte_histogram"

  override def nullSafeEval(input: Any): Any =
    ByteHistogram.compute(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.ByteHistogram.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteHistogram {
  def compute(bytes: Array[Byte]): ArrayData = {
    val counts = new Array[Int](16)
    var i = 0
    while (i < bytes.length) {
      counts((bytes(i) & 0xF0) >>> 4) += 1
      i += 1
    }
    new GenericArrayData(counts.map(Int.box(_): Any))
  }
}

object WordShingles {
  /** One pass: split on single spaces (regex-equivalent to Spark's
    * split(text, " ") with limit -1), emit first-occurrence-ordered distinct
    * n-grams; fewer than n tokens → empty array.
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n)
      return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** Maximum whitespace-token frequency in `child` — the kernel of the
  * Gopher-style repetition quality filters (share of the document taken by
  * its most-common word). One compiled pass with an open hash count; the
  * composed higher-order form (`array_max(transform(array_distinct(t), x ->
  * size(filter(t, y -> y = x))))`) is interpreted AND quadratic in tokens.
  */
case class MaxTokenFreq(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "max_token_freq"

  override def nullSafeEval(input: Any): Any =
    MaxTokenFreq.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.MaxTokenFreq.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MaxTokenFreq {
  def compute(text: UTF8String): Int = {
    val toks = text.toString.split(" ", -1)
    val counts = new java.util.HashMap[String, Int](toks.length * 2)
    var max = 0
    var i = 0
    while (i < toks.length) {
      val c = counts.merge(toks(i), 1, (a, b) => a + b)
      if (c > max) max = c
      i += 1
    }
    max
  }
}

/** Overlapping token-window chunks of `child`: windows of `size` tokens
  * starting every `stride` tokens (the last chunk may be shorter; a start
  * past the end emits nothing) — the document chunker that feeds sequence
  * packing in an LLM training pipeline. One compiled pass per row; the
  * composed higher-order form (`transform(sequence(...), i ->
  * concat_ws(' ', slice(...)))`) is interpreted per chunk.
  */
case class WordChunks(child: Expression, size: Int, stride: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(size >= 1, s"chunk size must be >= 1, got $size")
  require(stride >= 1, s"stride must be >= 1, got $stride")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_chunks"

  override def nullSafeEval(input: Any): Any =
    WordChunks.compute(input.asInstanceOf[UTF8String], size, stride)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.WordChunks.compute($c, $size, $stride)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordChunks {
  def compute(text: UTF8String, size: Int, stride: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val out = ArrayBuffer.empty[Any]
    var start = 0
    while (start < toks.length) {
      val end = math.min(start + size, toks.length)
      val sb = new java.lang.StringBuilder
      var i = start
      while (i < end) {
        if (i > start) sb.append(' ')
        sb.append(toks(i))
        i += 1
      }
      out += UTF8String.fromString(sb.toString)
      start += stride
    }
    new GenericArrayData(out.toArray)
  }
}

/** Per-document adjacent character-pair counts within whitespace tokens —
  * the counting kernel of a BPE-style merge-candidate scan (Sennrich et al.
  * 2016: the first merge is the corpus's most frequent symbol pair). The
  * per-row pre-aggregation is the classic combiner trick: the downstream
  * explode emits one row per DISTINCT pair per document (bounded by
  * alphabet², typically a few hundred) instead of one per character, so
  * the global aggregate's exchange shrinks by the average pair
  * multiplicity. Pairs are Java char (UTF-16 unit) pairs — identical to
  * codepoint pairs for BMP text.
  */
case class CharPairCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("p", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("c",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "char_pair_counts"

  override def nullSafeEval(input: Any): Any =
    CharPairCounts.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.CharPairCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharPairCounts {
  def compute(text: UTF8String): ArrayData = {
    val counts = new java.util.LinkedHashMap[String, Long]()
    val toks = text.toString.split(" ", -1)
    var t = 0
    while (t < toks.length) {
      val w = toks(t)
      var i = 0
      while (i + 2 <= w.length) {
        val p = w.substring(i, i + 2)
        counts.merge(p, 1L, (a, b) => a + b)
        i += 1
      }
      t += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(e.getKey), e.getValue)
      k += 1
    }
    new GenericArrayData(out)
  }
}
