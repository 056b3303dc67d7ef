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

  test("matches an independent in-memory BPE on random corpora") {
    // independent single-threaded reference: symbol LISTS, explicit greedy
    // left-to-right merge — no strings, no replace, no Spark
    def naiveBpe(texts: Seq[String], k: Int): Seq[(String, String, Long)] = {
      var words: Map[Vector[String], Long] = texts
        .flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
        .map { case (w, f) => w.map(_.toString).toVector -> f }
      val out = Seq.newBuilder[(String, String, Long)]
      var step = 0
      var done = false
      while (step < k && !done) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        words.foreach { case (syms, f) =>
          syms.sliding(2).foreach {
            case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
            case _ => ()
          }
        }
        if (counts.isEmpty) done = true
        else {
          val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
          out += ((l, r, c))
          words = words.groupBy { case (syms, _) =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                b += (l + r); i += 2
              } else { b += syms(i); i += 1 }
            }
            b.result()
          }.view.mapValues(_.values.sum).toMap
          step += 1
        }
      }
      out.result()
    }
    val alphabet = "abcde"
    (0 until 5).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      val texts = Seq.fill(6)(
        Seq.fill(30)(Seq.fill(1 + rnd.nextInt(5))(
          alphabet(rnd.nextInt(alphabet.length))).mkString).mkString(" "))
      val expect = naiveBpe(texts, 5)
      val got = BpeTrain.learnMerges(docs(texts: _*), "text", 5)
        .map(m => (m.l, m.r, m.pair_count))
      assert(got == expect, s"seed=$seed\n got=$got\n exp=$expect")
    }
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
