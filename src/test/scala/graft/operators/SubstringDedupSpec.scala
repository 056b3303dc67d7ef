package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SubstringDedupSpec extends SparkSpec {
  import SubstringDedup._

  private def docsDf(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("a passage shared by two documents becomes ONE maximal span with " +
    "exact boundaries in each") {
    // 15-token passage at token 21..35 of doc 1 and 1..15 of doc 2:
    // windows 21..26 (doc 1) and 1..6 (doc 2) repeat -> spans cover
    // exactly the 15 passage tokens, nothing more
    val noise1 = (1 to 20).map(i => s"a$i").mkString(" ")
    val noise2 = (1 to 20).map(i => s"b$i").mkString(" ")
    val passage = (1 to 15).map(i => s"p$i").mkString(" ")
    val d = docsDf(1L -> (noise1 + " " + passage + " " + noise2),
      2L -> (passage + " " + (1 to 20).map(i => s"c$i").mkString(" ")))
    val spans = repeatedSpans(d, "doc_id", "text", minLen = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    assert(spans.toSeq == Seq((1L, 21, 26), (2L, 1, 6)))
    // covered tokens = end - start + minLen = 15 in both docs
    assert(spans.forall { case (_, s0, e0) => e0 - s0 + 10 == 15 })
  }

  test("repetition WITHIN one document is found (count >= 2 is corpus-wide " +
    "including self)") {
    val phrase = (1 to 10).map(i => s"r$i").mkString(" ")
    val mid = (1 to 15).map(i => s"m$i").mkString(" ")
    val d = docsDf(1L -> (phrase + " " + mid + " " + phrase))
    val spans = repeatedSpans(d, "doc_id", "text", minLen = 10)
      .collect().map(r => (r.getInt(1), r.getInt(2))).sorted
    assert(spans.toSeq == Seq((1, 1), (26, 26)))
  }

  test("documents shorter than minLen and corpora with no repeats yield " +
    "nothing") {
    val d = docsDf(1L -> "too short",
      2L -> (1 to 30).map(i => s"u$i").mkString(" "),
      3L -> (1 to 30).map(i => s"v$i").mkString(" "))
    assert(repeatedSpans(d, "doc_id", "text", minLen = 10).count() == 0)
  }

  test("overlapping repeated windows merge; a gap > minLen splits spans") {
    // two separate shared passages in the same doc pair, separated by
    // > minLen unique tokens -> exactly two spans per doc
    val p1 = (1 to 12).map(i => s"x$i").mkString(" ")
    val p2 = (1 to 12).map(i => s"y$i").mkString(" ")
    def gap(tag: String) = (1 to 25).map(i => s"$tag$i").mkString(" ")
    val d = docsDf(1L -> (p1 + " " + gap("g") + " " + p2),
      2L -> (p1 + " " + gap("h") + " " + p2))
    val byDoc = repeatedSpans(d, "doc_id", "text", minLen = 10)
      .collect().groupBy(_.getLong(0))
    assert(byDoc(1L).length == 2 && byDoc(2L).length == 2)
  }
}
