package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact repeated-substring detection — the substring-level dedup audit
  * (the published ExactSubstr formulation: Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL 2022, uses suffix
  * arrays; the equivalent fixed-minimum-length form used here is the
  * windowed-hash MapReduce shape): a token span is REPEATED iff some
  * length-`minLen` window inside it occurs at least twice anywhere in the
  * corpus, and maximal repeated spans are the merge of overlapping
  * repeated windows. Downstream curation either drops the spans or drops
  * documents whose covered fraction is too high (templated/boilerplate
  * docs); the audit here reports the spans.
  *
  * Scale shape: one corpus scan explodes (hash, doc, pos) rows — 8+8+4
  * bytes per token position, never text; repeated positions come from
  * ONE count-over-window pass by hash (round 15 — the former
  * aggregate + join-back planned the explode twice and becomes a second
  * full shuffle once repeated hashes outgrow a broadcast); span
  * assembly is one exchange by document. Both shuffles carry
  * fixed-width rows. minLen windows overlap, so a shared passage
  * of length S >= minLen yields S - minLen + 1 hits that merge into one
  * span — coverage is exact, not approximate.
  *
  * Window hashes use [[Dedup.tokenHash60]] (md5-derived) for engine
  * portability; see the hash-cost note at [[Winnowing]].
  */
object SubstringDedup {

  /** Incremental cross-run passage matching against a persistent
    * window-hash index — the batch counterpart of
    * `streaming.SubstrStreams` (same first-sighting contract) for the
    * periodic-compaction pipeline `Dedup.incrementalExact` anchors: each
    * run's windows probe the store (one row per distinct hash: its first
    * sighting), matches stream out as (id, i, first_id, first_i), and the
    * batch's genuinely-new hashes append to the store with their in-batch
    * (id, i)-minimal sighting. Within-batch repeats match the in-batch
    * first sighting, exactly like the streaming operator's micro-batch
    * rule. The store snapshot is pinned by file list (same re-execution
    * guard as `Dedup.incrementalExact`); shuffles carry (long, long, int)
    * rows only.
    */
  def incrementalMatches(batch: DataFrame, idCol: String, textCol: String,
      indexStorePath: String, minLen: Int = 10): DataFrame = {
    val spark = batch.sparkSession
    val grams = windowHashes(batch, idCol, textCol, minLen)
    val p = new org.apache.hadoop.fs.Path(indexStorePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val snapshot =
      if (fs.exists(p))
        fs.listStatus(p).toSeq.map(_.getPath.toString)
          .filter(_.endsWith(".parquet"))
      else Seq.empty
    val seen: DataFrame =
      if (snapshot.nonEmpty)
        spark.read.parquet(snapshot: _*)
          .select(col("h"), col("id").as("first_id"), col("i").as("first_i"))
      else grams.select(col("h"), col("id").as("first_id"),
        col("i").as("first_i")).limit(0)
    // in-batch first sighting per hash: (id, i)-minimal, as one struct-min
    // aggregate; the batch's own repeats match it
    val batchFirst = grams
      .groupBy(col("h"))
      .agg(min(struct(col("id"), col("i"))).as("__f"))
      .select(col("h"), col("__f.id").as("bf_id"), col("__f.i").as("bf_i"))
    // persist the probe frame: the eager store append below materializes
    // it once, and the returned lazy `matches` plan reads the cache
    // instead of re-running the window-hash explode and both joins (the
    // operator's dominant cost) a second time
    val withRefs = grams
      .join(batchFirst, "h")
      .join(seen, Seq("h"), "left")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val matches = withRefs
      .select(col("id"), col("i"),
        coalesce(col("first_id"), col("bf_id")).as("first_id"),
        coalesce(col("first_i"), col("bf_i")).as("first_i"))
      .filter(!(col("id") === col("first_id") && col("i") === col("first_i")))
    // append only hashes the store has never seen, with their in-batch
    // first sighting — the store stays one row per distinct hash
    val additions = withRefs
      .filter(col("first_id").isNull)
      .select(col("h"), col("bf_id").as("id"), col("bf_i").as("i"))
      .distinct()
    additions.write.mode("append").parquet(indexStorePath)
    matches
  }

  /** Compaction + optional age-out for the incremental window-hash store.
    * `incrementalMatches` appends one parquet directory-full of small
    * files per run; at daily-ingest scale the store becomes the scan
    * bottleneck (one task + footer read per file) and, should two runs
    * ever race the snapshot, can carry duplicate hash rows. Compaction
    * rewrites the store as ~`targetBytes` files with EXACTLY one row per
    * hash — the (id, i)-minimal sighting, the same rule
    * `incrementalMatches` applies in-batch, so racey duplicates converge
    * to the contract instead of being frozen in. `retain` optionally
    * age-outs hashes by their first sighting (e.g. `col("id") >= cutoff`
    * when ingest ids are time-ordered): a dropped hash's next appearance
    * re-seeds the store as a fresh first sighting. The swap is the same
    * write-sibling-then-rename dance as dataset compaction — a reader
    * never observes a partial store.
    *
    * CONCURRENCY CONTRACT: compaction requires WRITER exclusion — no
    * `incrementalMatches` may be appending while it runs. An append that
    * lands after the read snapshot would be renamed away with the old
    * store and its first-sighting hashes silently lost (not merely
    * duplicated). Readers stay safe throughout; writers must be fenced by
    * the caller's scheduler. As a best-effort guard the swap re-lists the
    * store immediately before replacing it and ABORTS (tmp deleted, store
    * untouched, `ConcurrentModificationException`) if any data file
    * appeared since the snapshot — that detects a racing append that
    * lands before the final listing, but a write landing inside the
    * rename window itself is fundamentally undetectable without a lock,
    * hence the exclusion requirement above.
    *
    * Scale shape: one groupBy on the 20-byte (h, id, i) rows — the store
    * never carries text — then a round-robin repartition to the target
    * file count. Idempotent: re-compacting a compacted store is a cheap
    * no-op-shaped pass.
    */
  def compactStore(spark: org.apache.spark.sql.SparkSession,
      indexStorePath: String, targetBytes: Long = 128L * 1024 * 1024,
      retain: Option[org.apache.spark.sql.Column] = None,
      beforeSwap: () => Unit = () => ()): Compaction.CompactionResult = {
    val path = new org.apache.hadoop.fs.Path(indexStorePath)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) return Compaction.CompactionResult(0, 0, 0L)
    val dataFiles = fs.listStatus(path).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    // read EXACTLY the snapshot's files (not the directory): a file
    // appearing mid-plan must trip the pre-swap abort below, never be
    // half-included depending on when Spark listed the directory
    val snapshotNames = dataFiles.map(_.getPath.getName).toSet
    val deduped = spark.read.parquet(dataFiles.map(_.getPath.toString): _*)
      .groupBy(col("h"))
      .agg(min(struct(col("id"), col("i"))).as("__f"))
      .select(col("h"), col("__f.id").as("id"), col("__f.i").as("i"))
    val kept = retain.fold(deduped)(deduped.filter)
    val tmp = new org.apache.hadoop.fs.Path(path.getParent,
      s".${path.getName}.compacting")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    kept.repartition(nOut).write.mode("overwrite").parquet(tmp.toString)
    beforeSwap() // test seam: the race-guard spec plants an append here
    // best-effort race guard (see scaladoc): abort rather than silently
    // rename a concurrent append away with the old store
    val nowNames = fs.listStatus(path).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).toSet
    if ((nowNames -- snapshotNames).nonEmpty) {
      fs.delete(tmp, true)
      throw new java.util.ConcurrentModificationException(
        s"compactStore aborted: ${(nowNames -- snapshotNames).size} data " +
          s"file(s) appeared in $indexStorePath since the compaction " +
          "snapshot (concurrent incrementalMatches append?); store left " +
          "untouched — retry under writer exclusion")
    }
    Compaction.atomicReplace(fs, path, tmp)
    val after = fs.listStatus(path).toSeq
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    Compaction.CompactionResult(dataFiles.size, after, totalBytes)
  }

  /** Maximal repeated token spans per document: (id, start, end) in
    * 1-based token positions, end = start of the LAST repeated window in
    * the span (the span covers tokens [start, end + minLen - 1]).
    * Documents shorter than `minLen` tokens cannot contain a window and
    * are absent.
    */
  /** (id, i, h): the length-`minLen` window hash at every 1-based token
    * position of every document. Hashing happens INSIDE the document row
    * (one array of longs per doc), then only (id, pos, hash) explodes:
    * exploding positions first and slicing per row would duplicate the
    * full token array into every position row — measured 94 s vs ~4 s for
    * the same 6M windows on the pressure corpus. sequence() descends when
    * stop < start, so short docs get an explicit empty hash list. Shared
    * by the batch span assembly below and the streaming match index
    * (`streaming.SubstrStreams`).
    */
  def windowHashes(docs: DataFrame, idCol: String, textCol: String,
      minLen: Int = 10): DataFrame = {
    val ws = split(col(textCol), " ")
    val hashes = when(size(ws) >= minLen,
      transform(sequence(lit(1), size(ws) - lit(minLen - 1)),
        i => Dedup.tokenHash60(concat_ws(" ", slice(ws, i, lit(minLen))))))
      .otherwise(array().cast("array<bigint>"))
    docs
      .select(col(idCol).as("id"), posexplode(hashes).as(Seq("__p", "h")))
      .select(col("id"), (col("__p") + 1).as("i"), col("h"))
  }

  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      minLen: Int = 10): DataFrame = {
    val grams = windowHashes(docs, idCol, textCol, minLen)
    // corpus-repeated positions (window count >= 2 across ALL positions,
    // including repeats within one document) in ONE pass: count() OVER
    // (PARTITION BY h) replaces the old groupBy(h) + join-back, which
    // planned the window-hash explode TWICE — once under the aggregate,
    // once under the join's probe side (round 15 profile: two ~3.6-taskSec
    // explode stages for one 1.3 s query; guide §1.2 "don't compute things
    // twice"). At lake scale the join-back is strictly worse: repeated
    // hashes are too many to broadcast, so it becomes a second full
    // shuffle of the (id, i, h) rows ON TOP of the aggregate's. The
    // explicit kernel-width repartition replaces the window's implicit
    // ENSURE_REQUIREMENTS exchange (hash-by-h either way — the q122
    // prefix-window pattern); groups per h are tiny, so the window buffer
    // is bounded.
    val byHash = Window.partitionBy(col("h"))
    val pos = grams
      .repartition(graft.core.Tables.kernelWidth(docs.sparkSession), col("h"))
      .withColumn("__c", count(lit(1)).over(byHash))
      .filter(col("__c") >= 2)
      .select(col("id"), col("i"))
    // gaps-and-islands: positions whose windows overlap or touch
    // (i' - i <= minLen) merge into one span
    val byDoc = Window.partitionBy(col("id")).orderBy(col("i"))
    pos
      .withColumn("__prev", lag(col("i"), 1).over(byDoc))
      .withColumn("__new",
        when(col("__prev").isNull || col("i") - col("__prev") > minLen, 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("id"), col("__isl"))
      .agg(min(col("i")).as("start"), max(col("i")).as("end"))
      .select(col("id"), col("start"), col("end"))
  }
}
