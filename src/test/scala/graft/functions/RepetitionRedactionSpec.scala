package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Repetition quality kernels (MaxTokenFreq + ratio builders) and the PII
  * redaction builders.
  */
class RepetitionRedactionSpec extends SparkSpec {

  private def one(text: String, c: org.apache.spark.sql.Column): Any = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("text").select(c.as("v")).head.get(0)
  }

  test("maxTokenFreq counts the most-common token") {
    assert(one("a b a c a b", TextAnalysis.maxTokenFreq(col("text"))) == 3)
    assert(one("x", TextAnalysis.maxTokenFreq(col("text"))) == 1)
    assert(one("x y z", TextAnalysis.maxTokenFreq(col("text"))) == 1)
  }

  test("distinctWordRatio and topWordRatio are exact rationals") {
    // 6 tokens, 3 distinct, top freq 3
    assert(one("a b a c a b", TextAnalysis.distinctWordRatio(col("text"))) == 0.5)
    assert(one("a b a c a b", TextAnalysis.topWordRatio(col("text"))) == 0.5)
  }

  test("dupBigramFraction: repeated bigrams counted, short docs guarded") {
    // "a b a b a" -> 4 bigrams, 2 distinct ("a b", "b a") -> 1 - 2/4 = 0.5
    assert(one("a b a b a", TextAnalysis.dupBigramFraction(col("text"))) == 0.5)
    // 5 distinct tokens -> 4 distinct bigrams -> 0.0
    assert(one("v w x y z", TextAnalysis.dupBigramFraction(col("text"))) == 0.0)
    // <= 1 bigram cannot repeat
    assert(one("a b", TextAnalysis.dupBigramFraction(col("text"))) == 0.0)
    assert(one("a", TextAnalysis.dupBigramFraction(col("text"))) == 0.0)
  }

  test("wordChunks: size/stride windows, short tail kept, tiny doc = one chunk") {
    val s = spark
    import s.implicits._
    def chunks(text: String, size: Int, stride: Int): Seq[String] =
      Seq(text).toDF("text")
        .select(TextAnalysis.wordChunks(col("text"), size, stride).as("c"))
        .head.getSeq[String](0)
    assert(chunks("a b c d e f g", 3, 2) ==
      Seq("a b c", "c d e", "e f g", "g"))
    assert(chunks("a b", 5, 5) == Seq("a b"))
    assert(chunks("a b c d", 2, 2) == Seq("a b", "c d"))
  }

  test("scrub applies rules left to right; emails before digit runs") {
    val got = one("mail bob123@x.com or call 555 0199 now",
      Redaction.scrub(col("text")))
    assert(got.toString == "mail <EMAIL> or call <NUM> <NUM> now")
  }

  test("redactionCount counts actual replacements, rule order respected") {
    val got = one("a@b.io and c@d.net plus 42",
      Redaction.redactionCount(col("text"),
        Seq(Redaction.EmailPattern -> "<EMAIL>")))
    assert(got == 2L)
    val nums = one("1 22 333", Redaction.redactionCount(col("text"),
      Seq(Redaction.NumberPattern -> "<NUM>")))
    assert(nums == 3L)
    // overlapping patterns: the email rule consumes bob123's digits, so the
    // digit-run rule sees only the standalone 555 — 1 email + 1 number,
    // exactly the replacements scrub performs (not 3)
    val overlap = one("mail bob123@x.com or call 555",
      Redaction.redactionCount(col("text")))
    assert(overlap == 2L)
  }
}
