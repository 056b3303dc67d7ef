package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Compaction/TTL contract for the incremental substring-index store:
  * K id-ordered incremental runs WITH compaction between them must emit
  * exactly the matches of one fresh-store run over the whole corpus, the
  * compacted store must hold the global (id, i)-minimal sighting per hash,
  * and age-out must re-seed dropped hashes as fresh first sightings.
  */
class SubstrCompactionSpec extends SparkSpec {

  private val minLen = 10

  private def docsDf(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private val passage = (1 to 12).map(i => s"p$i").mkString(" ")
  private def noise(tag: String) = (1 to 15).map(i => s"$tag$i").mkString(" ")

  // id-ascending batches: the first batch containing a hash holds its
  // global (id, i)-minimal sighting, so incremental == one-shot
  private val batch1 = Seq(1L -> (passage + " " + noise("a")),
    2L -> noise("b"))
  private val batch2 = Seq(3L -> (noise("c") + " " + passage),
    4L -> noise("d"))
  private val batch3 = Seq(5L -> (noise("e") + " " + passage))
  private val corpus = batch1 ++ batch2 ++ batch3

  private def runMatches(store: String, batch: Seq[(Long, String)]) =
    SubstringDedup.incrementalMatches(docsDf(batch: _*), "doc_id", "text",
        store, minLen)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
      .toSet

  test("K incremental runs + compaction between them == one batch run") {
    val s = spark
    import s.implicits._
    val incStore = Files.createTempDirectory("substr_cmp_inc").toString + "/idx"
    val oneStore = Files.createTempDirectory("substr_cmp_one").toString + "/idx"

    val m1 = runMatches(incStore, batch1)
    val r1 = SubstringDedup.compactStore(s, incStore, targetBytes = 1L << 20)
    assert(r1.filesAfter == 1 && r1.filesBefore >= 1)
    val m2 = runMatches(incStore, batch2)
    SubstringDedup.compactStore(s, incStore, targetBytes = 1L << 20)
    val m3 = runMatches(incStore, batch3)

    val oneShot = runMatches(oneStore, corpus)
    assert((m1 ++ m2 ++ m3) == oneShot)
    assert(oneShot.nonEmpty)
    // doc 3 and doc 5 both match doc 1's passage windows
    assert(oneShot.exists(_._1 == 3L) && oneShot.exists(_._1 == 5L))

    // compacted store: one row per hash, each the global minimal sighting
    SubstringDedup.compactStore(s, incStore, targetBytes = 1L << 20)
    val inc = s.read.parquet(incStore).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val one = s.read.parquet(oneStore).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(inc == one)
    assert(inc.map(_._1).size == inc.size, "one row per hash")
  }

  test("compaction is idempotent") {
    val s = spark
    val store = Files.createTempDirectory("substr_cmp_idem").toString + "/idx"
    runMatches(store, batch1)
    runMatches(store, batch2)
    SubstringDedup.compactStore(s, store, targetBytes = 1L << 20)
    val first = s.read.parquet(store).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val r2 = SubstringDedup.compactStore(s, store, targetBytes = 1L << 20)
    val second = s.read.parquet(store).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(first == second && r2.filesAfter == 1)
  }

  test("age-out drops old first sightings; dropped hashes re-seed fresh") {
    val s = spark
    val store = Files.createTempDirectory("substr_cmp_ttl").toString + "/idx"
    runMatches(store, batch1) // seeds the passage under doc 1
    // TTL: retain only hashes first seen at doc_id >= 3 — drops everything
    SubstringDedup.compactStore(s, store, targetBytes = 1L << 20,
      retain = Some(col("id") >= 3L))
    assert(s.read.parquet(store).count() == 0)
    // the passage reappears: no match against the aged-out doc 1; doc 6
    // becomes the fresh first sighting for the next run
    val m = runMatches(store, Seq(6L -> (noise("f") + " " + passage)))
    assert(m.isEmpty)
    val m2 = runMatches(store, Seq(7L -> (noise("g") + " " + passage)))
    assert(m2.nonEmpty && m2.forall(_._3 == 6L))
  }

  test("an append landing after the snapshot aborts the swap, store intact") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("substr_cmp_race").toString + "/idx"
    runMatches(store, batch1)
    val before = s.read.parquet(store).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // a racing incrementalMatches append lands between the compaction
    // snapshot and the swap (injected through the beforeSwap test seam):
    // the guard must abort with the store directory untouched — the old
    // behavior renamed the append away with the old store and lost it
    val ex = intercept[java.util.ConcurrentModificationException] {
      SubstringDedup.compactStore(s, store, targetBytes = 1L << 20,
        beforeSwap = () =>
          Seq((99L, 999L, 1)).toDF("h", "id", "i")
            .write.mode("append").parquet(store))
    }
    assert(ex.getMessage.contains("compactStore aborted"))
    val after = s.read.parquet(store).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(after == before + ((99L, 999L, 1)), "append and store both intact")
    // no leftover .compacting temp dir
    assert(!new java.io.File(
      new java.io.File(store).getParent, ".idx.compacting").exists)
    // with the writer quiesced, a retry compacts cleanly
    val r = SubstringDedup.compactStore(s, store, targetBytes = 1L << 20)
    assert(r.filesAfter == 1)
  }

  test("compacting a missing store is a safe no-op") {
    val r = SubstringDedup.compactStore(spark,
      Files.createTempDirectory("substr_cmp_none").toString + "/never")
    assert(r == Compaction.CompactionResult(0, 0, 0L))
  }
}
