package graft.operators

import graft.SparkSpec

/** NgramLm unit coverage beyond the q172 oracle gate (which pins the
  * self-trained path bit-for-bit at 3 SFs): hand-checked bigram math on a
  * tiny corpus, degenerate documents, and the held-out-model path where
  * unseen contexts must hit the add-one floor instead of dividing by null.
  */
class NgramLmSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("bigram extraction: pure projection, correct pairs, degenerate docs") {
    import spark.implicits._
    val bg = NgramLm.bigrams(
      docs(0L -> "a b c", 1L -> "x", 2L -> "", 3L -> "a a"),
      "doc_id", "text")
      .as[(Long, String, String)].collect().toSet
    // single-token and empty docs contribute nothing; repeats kept
    assert(bg == Set((0L, "a", "b"), (0L, "b", "c"), (3L, "a", "a")))
  }

  test("self-trained score matches the hand computation") {
    import spark.implicits._
    // corpus: "a b" x2, "a c" -> contexts c(a.)=3; c12: (a,b)=2, (a,c)=1
    // V = 3 (a, b, c). P(b|a) = (2+1)/(3+3) = 1/2; P(c|a) = (1+1)/6 = 1/3
    val got = NgramLm.bigramScore(
      docs(0L -> "a b", 1L -> "a b", 2L -> "a c"), "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, Long, Float)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 1L, 1L))
    assert(math.abs(got(0)._3 - math.log(0.5)) < 1e-6)
    assert(math.abs(got(2)._3 - math.log(1.0 / 3.0)) < 1e-6)
  }

  test("held-out model: unseen bigrams and contexts hit the add-one floor") {
    import spark.implicits._
    val train = docs(0L -> "a b", 1L -> "a b", 2L -> "a c")
    // "a b": seen (P=1/2). "z q": context z unseen -> (0+1)/(0+V) = 1/3.
    // "a z": seen context, unseen bigram -> (0+1)/(3+3) = 1/6.
    val got = NgramLm.bigramScore(
      docs(10L -> "a b", 11L -> "z q", 12L -> "a z"), "doc_id", "text",
      train = Some(train))
      .orderBy($"doc_id")
      .as[(Long, Long, Float)].collect().toSeq
    assert(math.abs(got(0)._3 - math.log(0.5)) < 1e-6)
    assert(math.abs(got(1)._3 - math.log(1.0 / 3.0)) < 1e-6)
    assert(math.abs(got(2)._3 - math.log(1.0 / 6.0)) < 1e-6)
  }

  test("DSIR weights: target-domain docs weigh above off-domain docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // two disjoint dialects, uniform within each (rare one-off bigrams
    // would hit add-one's unseen floor, which with a tiny target vocab
    // is HIGHER than a rare raw probability — a real smoothing artifact,
    // not a separation failure); target = even ids (the a/b dialect)
    val corpus = docs(
      0L -> "a b a b a b", 2L -> "a b a b a b", 4L -> "b a b a b a",
      1L -> "x y x y x y", 3L -> "x y x y x y", 5L -> "y x y x y x")
    val w = graft.operators.NgramLm.dsirWeights(corpus, "doc_id", "text",
        id => pmod(id, lit(2L)) === 0)
      .as[(Long, Long, Float)].collect().map(r => r._1 -> r._3).toMap
    val target = Seq(0L, 2L, 4L).map(w); val off = Seq(1L, 3L, 5L).map(w)
    assert(target.min > off.max,
      s"importance weights do not separate domains: $w")
    // resampling by exp(log_w) must upweight the target dialect
    assert(target.forall(_ > 0f) && off.forall(_ < 0f), w.toString)
  }

  test("trigram extraction: aligned slices, degenerate docs") {
    import spark.implicits._
    val tg = NgramLm.trigrams(
      docs(0L -> "a b c d", 1L -> "x y", 2L -> ""), "doc_id", "text")
      .as[(Long, String, String, String)].collect().toSet
    assert(tg == Set((0L, "a", "b", "c"), (0L, "b", "c", "d")))
  }

  test("stupid backoff: all three levels match the hand computation") {
    import spark.implicits._
    // train: "a b c" x2, "a b d" -> c(abc)=2, c(abd)=1, c(ab·)=3
    //   bigrams: (a,b)=3, (b,c)=2, (b,d)=1; contexts c(a·)=3, c(b·)=3
    //   unigrams: a=3, b=3, c=2, d=1 -> N=9, V=4
    val train = docs(0L -> "a b c", 1L -> "a b c", 2L -> "a b d")
    // 10: seen trigram        -> ln(c(abc)/c(ab·))        = ln(2/3)
    // 11: unseen trigram "c b d" but seen bigram (b,d)
    //                         -> ln(0.4 · c(bd)/c(b·))    = ln(0.4·1/3)
    // 12: unseen trigram+bigram, seen unigram d
    //                         -> ln(0.16 · (1+1)/(9+4))   = ln(0.32/13)
    // 13: wholly unseen word z -> ln(0.16 · (0+1)/13)
    val got = NgramLm.trigramBackoffScore(
      docs(10L -> "a b c", 11L -> "c b d", 12L -> "d a d", 13L -> "z z z"),
      "doc_id", "text", train = Some(train))
      .orderBy($"doc_id")
      .as[(Long, Long, Float)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 1L, 1L, 1L))
    assert(math.abs(got(0)._3 - math.log(2.0 / 3.0)) < 1e-6)
    assert(math.abs(got(1)._3 - math.log(0.4 * 1.0 / 3.0)) < 1e-6)
    assert(math.abs(got(2)._3 - math.log(0.4 * 0.4 * 2.0 / 13.0)) < 1e-6)
    assert(math.abs(got(3)._3 - math.log(0.4 * 0.4 * 1.0 / 13.0)) < 1e-6)
  }

  test("plan: bigram extraction carries no window and no per-doc sort") {
    val p = NgramLm.bigramScore(
      graft.core.Tables(spark, sf()).documents, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "bigram extraction regressed to a window")
  }
}
