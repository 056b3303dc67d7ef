package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout helpers: range-clustered and Z-ordered writes. Parquet scans
  * prune with per-file and per-row-group min/max statistics, but statistics
  * only cut anything when values are CLUSTERED — a randomly-laid-out
  * 100 TB table answers `WHERE ts BETWEEN ...` by reading everything.
  * Writing range-partitioned AND sorted by the filter columns gives every
  * file a tight, near-disjoint min/max envelope, so selective scans touch
  * only the overlapping files. Linear layout is optimal for ONE leading
  * filter column; when two independent columns both filter, clustering by
  * the interleaved-bit Morton (Z-order) key keeps BOTH columns' min/max
  * envelopes tight in every file.
  */
object Layout {

  /** Write `df` range-clustered by `cols`: `files` output files, each
    * covering a contiguous, sorted slice of the key space.
    */
  def writeClustered(df: DataFrame, path: String, cols: Seq[String],
      files: Int): Unit = {
    val keys = cols.map(col)
    df.repartitionByRange(files, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Morton (Z-order) key of two columns: the low `bits` bits of each input
    * interleaved (x at even positions, y at odd). Pure shift/mask built-ins
    * folded into one codegen'd expression — portable integer math, so SQL
    * engines replay it exactly. Inputs are masked to `bits` (callers
    * quantize wider domains first — rank or bucket them into 2^bits).
    */
  def zOrderKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    val xl = x.cast("long"); val yl = y.cast("long")
    (0 until bits).map { b =>
      (shiftright(xl, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b))) +
        (shiftright(yl, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1)))
    }.reduce(_ + _)
  }

  /** Proportionally bucket a non-negative integer column into [0, 2^bits):
    * `(v * 2^bits) div (vmax + 1)` — the quantization step `zOrderKey`'s
    * contract requires for domains wider than 2^bits (raw masking would
    * alias the high bits and silently collapse distinct keys into one
    * z-bucket). Exact BIGINT arithmetic only, so any SQL engine replays it
    * bit-for-bit; `vmax` is the column max (attach it via a broadcast
    * single-row stats join). Values above vmax alias into the top bucket.
    */
  def quantize(v: Column, vmax: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    call_function("div",
      v.cast("long") * lit(1L << bits), vmax.cast("long") + lit(1L))
  }

  /** Write `df` Z-order-clustered on two dimensions: files cover contiguous
    * Morton-curve slices, keeping min/max tight on BOTH inputs. Each
    * column is quantized into 2^bits buckets over its actual domain (one
    * cheap min/max pre-pass at write time), so arbitrarily wide key
    * domains never alias in the interleave.
    */
  def writeZOrdered(df: DataFrame, path: String, x: String, y: String,
      files: Int, bits: Int = 16): Unit = {
    val mx = df.agg(max(col(x)).as("__xmax"), max(col(y)).as("__ymax"))
    val z = zOrderKey(
      quantize(col(x), col("__xmax"), bits),
      quantize(col(y), col("__ymax"), bits), bits).as("__z")
    df.crossJoin(broadcast(mx))
      .withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__xmax", "__ymax")
      .write.mode("overwrite").parquet(path)
  }

  /** Hive-style partitioned write: each distinct `partCol` value becomes a
    * directory (`event_date=2024-01-07/…`), the lake layout that lets a
    * date-filtered scan at 100 TB LIST its way past everything else —
    * Catalyst prunes the non-matching directories at planning time for
    * literal filters (PartitionFilters on the scan) and at runtime via
    * dynamic partition pruning when the filter arrives through a join.
    * Distinct from [[writeClustered]]: min/max envelopes prune row groups
    * INSIDE files the scan already opened; directory partitions prune
    * whole subtrees before any footer is read.
    */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.partitionBy(partCol).mode("overwrite").parquet(path)
}
