package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Incremental-store compaction pressure test over the 12×-amplified
  * corpus (same corpus as [[PressureSubstr]]): ingest the corpus as three
  * id-ordered batches through `SubstringDedup.incrementalMatches` with
  * `compactStore` between the runs, and require the UNION of the three
  * match sets to exactly equal a single fresh-store run over the whole
  * corpus — compaction must be invisible to match semantics while
  * collapsing the store's accumulated per-run files to the target layout.
  * Prints per-phase timings, store file counts before/after each
  * compaction, and the final store cardinality (== distinct window
  * hashes).
  */
object PressureSubstrCompact {
  private val MinLen = 10

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(cores = 32,
      appName = "pressure-substr-compact")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PRESSURE $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val amplified = PressureSubstr
      .amplify(graft.core.Tables(spark, sfDir).documents)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nDocs = timed("amplify")(amplified.count())
    val maxId = amplified.agg(max($"doc_id")).head().getLong(0)
    val (c1, c2) = (maxId / 3, 2 * maxId / 3)
    println(s"PRESSURE docs: $nDocs, batch cuts at $c1 / $c2")

    val base = java.nio.file.Files
      .createTempDirectory("graft-substr-compact-").toString
    val incStore = s"$base/inc"
    val oneStore = s"$base/one"

    def matches(store: String, df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Int)] =
      graft.operators.SubstringDedup
        .incrementalMatches(df, "doc_id", "text", store, MinLen)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
        .toSet

    def storeFiles(store: String): Int =
      new java.io.File(store).listFiles()
        .count(f => f.isFile && f.getName.endsWith(".parquet"))

    val batches = Seq(
      amplified.filter($"doc_id" < c1),
      amplified.filter($"doc_id" >= c1 && $"doc_id" < c2),
      amplified.filter($"doc_id" >= c2))
    var incMatches = Set.empty[(Long, Int, Long, Int)]
    batches.zipWithIndex.foreach { case (b, i) =>
      incMatches ++= timed(s"incremental batch $i")(matches(incStore, b))
      val r = timed(s"compact after batch $i")(
        graft.operators.SubstringDedup.compactStore(spark, incStore,
          targetBytes = 64L * 1024 * 1024))
      println(s"PRESSURE compact $i: files ${r.filesBefore} -> " +
        s"${r.filesAfter}, ${r.bytes} bytes in")
      require(r.filesAfter <= r.filesBefore)
    }
    println(s"PRESSURE incremental matches: ${incMatches.size}")

    val oneShot = timed("one-shot run")(matches(oneStore, amplified))
    println(s"PRESSURE one-shot matches: ${oneShot.size}")
    require(incMatches == oneShot, {
      val miss = oneShot -- incMatches
      val extra = incMatches -- oneShot
      s"match divergence: ${miss.size} missing (e.g. ${miss.take(3)}), " +
        s"${extra.size} extra (e.g. ${extra.take(3)})"
    })

    // compacted store == one-shot store: one row per distinct hash, the
    // global (id, i)-minimal first sighting
    val incRows = spark.read.parquet(incStore)
    val oneRows = spark.read.parquet(oneStore)
    val incN = incRows.count()
    require(incN == incRows.select("h").distinct().count(),
      "duplicate hash rows after compaction")
    require(incRows.unionAll(oneRows).distinct().count() == incN,
      "compacted store diverges from the one-shot store")
    println(s"PRESSURE store rows: $incN across ${storeFiles(incStore)} files " +
      s"(one-shot wrote ${storeFiles(oneStore)})")
    spark.stop()
  }
}
