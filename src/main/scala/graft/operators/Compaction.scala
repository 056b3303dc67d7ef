package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction (training-data-pipeline surface): streaming and
  * per-batch ingestion leave datasets as thousands of KB-sized parquet
  * files; every downstream scan then pays one task + one footer read per
  * file. Compaction rewrites a dataset directory into ~targetBytes files
  * and atomically swaps it in (write to sibling temp dir, rename-replace) —
  * readers never observe a partial dataset.
  *
  * File count = ceil(totalBytes / targetBytes) via repartition: at 100 TB
  * the rewrite is one round-robin shuffle, fully parallel, and idempotent
  * (re-running compaction on compacted data is a cheap no-op-shaped pass).
  */
object Compaction {

  final case class CompactionResult(filesBefore: Int, filesAfter: Int,
      bytes: Long)

  def compactParquet(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024,
      conf: Configuration = new Configuration()): CompactionResult = {
    val path = new Path(dir)
    val fs = path.getFileSystem(
      spark.sessionState.newHadoopConf())
    val dataFiles = fs.listStatus(path).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val filesBefore = dataFiles.size
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val tmp = new Path(path.getParent, s".${path.getName}.compacting")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)

    atomicReplace(fs, path, tmp)

    val after = fs.listStatus(path).toSeq
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    CompactionResult(filesBefore, after, totalBytes)
  }

  /** Swap `tmp` in as `path` atomically-from-a-reader's-view: old dir out,
    * new dir in; the .old dir is removed last so a crash mid-swap leaves a
    * recoverable copy. Shared by dataset compaction (above) and the
    * substring-index store compaction (`SubstringDedup.compactStore`).
    */
  def atomicReplace(fs: org.apache.hadoop.fs.FileSystem, path: Path,
      tmp: Path): Unit = {
    val old = new Path(path.getParent, s".${path.getName}.old")
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(path, old))
      throw new java.io.IOException(s"compaction swap-out of $path failed")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // restore
      throw new java.io.IOException(s"compaction swap-in to $path failed")
    }
    fs.delete(old, true)
  }
}
