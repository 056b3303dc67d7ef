package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeTrainSpec extends SparkSpec {

  private def docs(texts: String*) = {
    val s = spark
    import s.implicits._
    texts.toDF("text")
  }

  test("learns the most frequent pair with lexicographic tie-break") {
    // "ab" x3, "cd" x3: pairs (a,b) and (c,d) tie at 3 -> (a,b) wins
    val m = BpeTrain.learnMerges(docs("ab ab cd", "ab cd cd"), "text", 2)
    assert(m.map(x => (x.step, x.l, x.r, x.merged, x.pair_count)) ==
      Seq((1, "a", "b", "ab", 3L), (2, "c", "d", "cd", 3L)))
  }

  test("merge application is canonical greedy left-to-right") {
    val s = spark
    import s.implicits._
    // same-symbol run: aaa -> [aa, a]; adjacent occurrences: abab -> [ab, ab]
    val words = Seq(" a  a  a ", " a  b  a  b ").toDF("w")
    val runs = BpeTrain.applyMerges(words, "w",
        Seq(BpeTrain.Merge(1, "a", "a", "aa", 0L)))
      .collect().map(_.getString(0))
    assert(runs(0) == " aa  a ", s"same-symbol run, got '${runs(0)}'")
    val pairs = BpeTrain.applyMerges(words, "w",
        Seq(BpeTrain.Merge(1, "a", "b", "ab", 0L)))
      .collect().map(_.getString(0))
    assert(pairs(1) == " ab  ab ", s"adjacent occurrences, got '${pairs(1)}'")
  }

  test("hierarchical merges: a learned symbol participates in later pairs") {
    // corpus dominated by "xyz": step 1 merges (x,y), step 2 merges (xy,z)
    val m = BpeTrain.learnMerges(docs("xyz xyz xyz xyz", "xyz xw"), "text", 2)
    assert(m(0).merged == "xy" && m(0).pair_count == 5L)
    assert(m(1).l == "xy" && m(1).r == "z" && m(1).merged == "xyz" &&
      m(1).pair_count == 5L)
  }

  test("exhausts cleanly when no pairs remain") {
    val m = BpeTrain.learnMerges(docs("ab ab"), "text", 5)
    // ab -> single symbol after 1 merge; no pairs remain, loop stops
    assert(m.map(_.merged) == Seq("ab"))
  }

  test("applyMerges(learnMerges) segments exactly like the learner") {
    val s = spark
    val corpus = docs("lower lowest newer newest", "low new lower")
    val merges = BpeTrain.learnMerges(corpus, "text", 6)
    val segmented = BpeTrain.applyMerges(
        BpeTrain.wordFrequencies(corpus, "text"), "w", merges)
      .select(split(trim(col("w")), "  ").as("ts"))
      .collect().map(_.getSeq[String](0))
    // every learned merged symbol must appear as an atomic segment somewhere
    val allSegs = segmented.flatten.toSet
    val lastMerge = merges.last.merged
    assert(allSegs.contains(lastMerge),
      s"last merge $lastMerge not an atomic segment in $allSegs")
    // and no segment still contains a mergeable learned pair
    merges.foreach { mg =>
      segmented.foreach { ts =>
        ts.sliding(2).foreach { p =>
          if (p.length == 2)
            assert(!(p(0) == mg.l && p(1) == mg.r),
              s"unapplied merge ${mg.l}+${mg.r} in ${ts.mkString("|")}")
        }
      }
    }
  }
}
