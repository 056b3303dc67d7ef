package graft.operators

import org.apache.spark.sql.DataFrame

/** Data-layout helper: range-clustered writes. Parquet scans prune with
  * per-file and per-row-group min/max statistics, but statistics only cut
  * anything when values are CLUSTERED — a randomly-laid-out 100 TB table
  * answers `WHERE ts BETWEEN ...` by reading everything. Writing
  * range-partitioned AND sorted by the filter columns gives every file a
  * tight, near-disjoint min/max envelope, so selective scans touch only
  * the overlapping files (linear layout — the 1-D special case of
  * Z-ordering, optimal for one leading filter column).
  */
object Layout {

  /** Write `df` range-clustered by `cols`: `files` output files, each
    * covering a contiguous, sorted slice of the key space.
    */
  def writeClustered(df: DataFrame, path: String, cols: Seq[String],
      files: Int): Unit = {
    import org.apache.spark.sql.functions.col
    val keys = cols.map(col)
    df.repartitionByRange(files, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(path)
  }
}
