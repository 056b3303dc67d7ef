package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SubstrIncrementalSpec extends SparkSpec {

  private def docsDf(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("two sequential runs reproduce the streaming first-sighting " +
    "contract; the store keeps one row per distinct hash") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("substr_store").toString + "/idx"
    val passage = (1 to 12).map(i => s"s$i").mkString(" ")
    def noise(tag: String) = (1 to 15).map(i => s"$tag$i").mkString(" ")

    // run 1: doc 1 carries the passage, doc 2 repeats it in-batch
    val m1 = SubstringDedup.incrementalMatches(
        docsDf(1L -> (passage + " " + noise("a")), 2L -> (noise("b") + " " + passage)),
        "doc_id", "text", store, minLen = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    // doc 2's passage windows (positions 16..18) match doc 1's (1..3)
    assert(m1.toSet == Set((2L, 16, 1L, 1), (2L, 17, 1L, 2), (2L, 18, 1L, 3)))

    // run 2: a NEW doc repeating the passage matches run 1's first
    // sighting from the store, not anything in its own batch
    val m2 = SubstringDedup.incrementalMatches(
        docsDf(5L -> (noise("c") + " " + passage)),
        "doc_id", "text", store, minLen = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(m2.toSet == Set((5L, 16, 1L, 1), (5L, 17, 1L, 2), (5L, 18, 1L, 3)))

    // store: one row per distinct hash; the passage windows stay owned by
    // their run-1 first sighting (doc 5 may only add its own noise and
    // noise->passage boundary windows, which all start before position 16)
    val idx = s.read.parquet(store)
    assert(idx.count() == idx.select("h").distinct().count())
    assert(idx.filter($"id" === 5L && $"i" >= 16).count() == 0)
  }

  test("a fresh store run emits no matches on unique content and seeds " +
    "the index") {
    val s = spark
    val store = Files.createTempDirectory("substr_store2").toString + "/idx"
    val m = SubstringDedup.incrementalMatches(
      docsDf(1L -> (1 to 20).map(i => s"u$i").mkString(" ")),
      "doc_id", "text", store, minLen = 10)
    assert(m.count() == 0)
    assert(s.read.parquet(store).count() == 11)
  }
}
