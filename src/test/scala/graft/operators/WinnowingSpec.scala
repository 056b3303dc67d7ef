package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WinnowingSpec extends SparkSpec {
  import Winnowing._

  private def docsDf(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("winnowing guarantee: a shared run of >= w+n-1 tokens yields a " +
    "shared fingerprint between otherwise-unrelated documents") {
    // n=3, w=8: any shared run of >= 10 tokens must share a fingerprint.
    // Build two documents that are random noise except for one lifted
    // 12-token passage — global Jaccard is far below any near-dup
    // threshold, but the passage must still connect them.
    val rnd = new scala.util.Random(7)
    def noise(k: Int, tag: String) =
      Seq.fill(k)(s"$tag${rnd.nextInt(1000)}").mkString(" ")
    val passage = (1 to 12).map(i => s"lifted$i").mkString(" ")
    val d = docsDf(
      1L -> (noise(40, "a") + " " + passage + " " + noise(40, "b")),
      2L -> (noise(40, "c") + " " + passage + " " + noise(40, "d")))
    val fp = fingerprints(d, "doc_id", "text", n = 3, w = 8)
    val shared = fp.filter(col("id") === 1L).select("f")
      .intersect(fp.filter(col("id") === 2L).select("f"))
    assert(shared.count() >= 1)
  }

  test("fingerprint density: ~2/(w+1) of gram positions selected, never " +
    "more than the gram count") {
    val text = (1 to 500).map(i => s"t${i % 97}").mkString(" ")
    val d = docsDf(1L -> text)
    val nFps = fingerprints(d, "doc_id", "text", n = 3, w = 8).count()
    val nGrams = 500 - 2
    // distinct window minima of 498 grams with w=8: expectation ~2/9; the
    // wide band just rejects degenerate all-grams or single-fp outcomes
    assert(nFps > nGrams / 20 && nFps < nGrams / 2,
      s"$nFps fingerprints from $nGrams grams")
  }

  test("short-document degenerations: < n tokens hashes the whole text, " +
    "< w grams yields exactly the global minimum") {
    val d = docsDf(1L -> "just two", 2L -> "a b c d e")
    val fp = fingerprints(d, "doc_id", "text", n = 3, w = 8)
      .collect().groupBy(_.getLong(0))
    // doc 1: one gram ("just two"), one fingerprint
    assert(fp(1L).length == 1)
    // doc 2: three grams, window clamps to all of them -> ONE global min
    assert(fp(2L).length == 1)
  }

  test("sharedFingerprintPairs finds the planted copy pair and respects " +
    "minShared") {
    val rnd = new scala.util.Random(11)
    def noise(k: Int, tag: String) =
      Seq.fill(k)(s"$tag${rnd.nextInt(1000)}").mkString(" ")
    val passage = (1 to 40).map(i => s"p$i").mkString(" ")
    val d = docsDf(
      1L -> (noise(30, "a") + " " + passage),
      2L -> (passage + " " + noise(30, "b")),
      3L -> noise(60, "c"))
    val pairs = sharedFingerprintPairs(d, "doc_id", "text",
        n = 3, w = 8, minShared = 3L, maxFpFreq = 50L)
      .collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(pairs.head.getLong(2) >= 3L)
  }

  test("boilerplate cut: a fingerprint shared by more than maxFpFreq docs " +
    "generates no pairs") {
    // every doc is the same short text -> all share the same fingerprints;
    // with maxFpFreq below the doc count the pair step must emit nothing
    val same = (1 to 12).map(i => i.toLong -> "x y z w v u t s r q p o")
    val d = docsDf(same: _*)
    val cut = sharedFingerprintPairs(d, "doc_id", "text",
      n = 3, w = 8, minShared = 1L, maxFpFreq = 11L)
    assert(cut.count() == 0)
    val kept = sharedFingerprintPairs(d, "doc_id", "text",
      n = 3, w = 8, minShared = 1L, maxFpFreq = 12L)
    assert(kept.count() == 12L * 11 / 2)
  }
}
