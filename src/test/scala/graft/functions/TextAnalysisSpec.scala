package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import TextAnalysis._

  private def one(c: org.apache.spark.sql.Column, text: String): Any = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("text").select(c.as("v")).first().get(0)
  }

  test("tokenCount counts whitespace tokens") {
    assert(one(tokenCount(col("text")), "a bb ccc") == 3)
    assert(one(tokenCount(col("text")), "solo") == 1)
  }

  test("subwordCount splits letter runs, digit runs and marks") {
    // "hello" "world" "42" "!" -> 4
    assert(one(subwordCount(col("text")), "hello world42!") == 4)
  }

  test("stopwordRatio is hits/tokens") {
    assert(one(stopwordRatio(col("text")), "the cat") == 0.5)
    assert(one(stopwordRatio(col("text")), "cat dog") == 0.0)
  }

  test("meanTokenLength derives from char count") {
    assert(one(meanTokenLength(col("text")), "ab cd") == 2.0)
    assert(one(meanTokenLength(col("text")), "abc d") == 2.0)
  }

  private def shingleList(text: String, n: Int): List[String] =
    one(wordShingles(col("text"), n), text)
      .asInstanceOf[scala.collection.Seq[String]].toList

  test("punctRatio is symbol chars over length") {
    assert(one(punctRatio(col("text")), "ab!?") == 0.5)
    assert(one(punctRatio(col("text")), "ab cd") == 0.0)
  }

  test("qualityScore ranks prose above symbol soup and run-on tokens") {
    def q(t: String): Double =
      one(qualityScore(col("text")), t).asInstanceOf[Double]
    val prose = q("the quick brown fox jumped over a lazy dog in the garden")
    val soup = q("!!! ??? ### $$$ %%%")
    val runOn = q("aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")
    assert(prose > 0.8, s"prose=$prose")
    assert(soup < 0.4, s"soup=$soup")
    assert(runOn < 0.4, s"runOn=$runOn")
    assert(prose > soup && prose > runOn)
  }

  test("wordShingles builds distinct n-grams, empty below n tokens") {
    assert(shingleList("a b c d", 2) == List("a b", "b c", "c d"))
    assert(shingleList("a b", 3).isEmpty)
    // duplicates collapse
    assert(shingleList("a b a b", 2) == List("a b", "b a"))
  }

  test("predictLang picks argmax with declaration-order ties") {
    assert(one(predictLang(col("text")), "the cat sat") == "en")
    assert(one(predictLang(col("text")), "der hund und die katze") == "de")
    assert(one(predictLang(col("text")), "el perro la casa los gatos") == "es")
    // no markers at all: every score 0, first language wins the >= tie
    assert(one(predictLang(col("text")), "zzz qqq") == "en")
  }

  test("fingerprint is md5 hex") {
    assert(one(fingerprint(col("text")), "abc") ==
      "900150983cd24fb0d6963f7d28e17f72")
  }

  test("rollingHash matches the base-31 polynomial") {
    // 'a'=97, 'b'=98: (97*31 + 98) mod 1e9+7
    assert(one(rollingHash(col("text")), "ab") == (97L * 31 + 98))
  }
}
