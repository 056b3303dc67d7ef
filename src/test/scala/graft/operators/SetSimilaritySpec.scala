package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SetSimilaritySpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(s"${sf()}/documents.parquet")

  test("prefix-filtered pairs equal the full-index pairs at the threshold") {
    // ground truth: the full inverted-index jaccard join, thresholded with
    // the same integer cross-multiplication
    val full = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3)
      .filter(lit(10L) * col("inter") >= lit(7L) * (col("na") + col("nb") - col("inter")))
      .select("da", "db", "inter", "na", "nb")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val pref = SetSimilarity.prefixJaccardPairs(docs, "doc_id", "text",
        n = 3, tauNum = 7, tauDen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(pref == full)
    assert(pref.nonEmpty, "sf0.001 corpus should contain near-dup pairs")
  }

  test("higher threshold is a subset of lower threshold") {
    val lo = SetSimilarity.prefixJaccardPairs(docs, "doc_id", "text",
        n = 3, tauNum = 7, tauDen = 10)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hi = SetSimilarity.prefixJaccardPairs(docs, "doc_id", "text",
        n = 3, tauNum = 9, tauDen = 10)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hi.subsetOf(lo))
  }

  test("synthetic sets: exact jaccard thresholding with zero false negatives") {
    val s = spark
    import s.implicits._
    // doc 1 and 2 share 8 of 10 tokens (J = 8/12 = 0.667); doc 3 disjoint
    val t1 = (1 to 10).map(i => s"w$i").mkString(" ")
    val t2 = ((1 to 8).map(i => s"w$i") ++ Seq("x1", "x2")).mkString(" ")
    val t3 = (1 to 10).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, t1), (2L, t2), (3L, t3)).toDF("id", "text")
    // unigram sets (n = 1): pair (1,2) passes τ = 0.6, fails τ = 0.7
    val at06 = SetSimilarity.prefixJaccardPairs(df, "id", "text", 1, 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(at06 == Set((1L, 2L, 8L)))
    val at07 = SetSimilarity.prefixJaccardPairs(df, "id", "text", 1, 7, 10)
    assert(at07.count() == 0)
  }

  test("containmentPairs: a pasted doc is caught where jaccard misses it") {
    val s = spark
    import s.implicits._
    // doc 1 (8 tokens) pasted verbatim inside doc 2 (40 tokens):
    // containment(1→2) = 1.0, but J = 6/37 ≈ 0.16 (3-gram shingles)
    val small = (1 to 8).map(i => s"w$i").mkString(" ")
    val big = ((1 to 8).map(i => s"w$i") ++ (1 to 32).map(i => s"f$i")).mkString(" ")
    val other = (1 to 20).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, small), (2L, big), (3L, other)).toDF("id", "text")
    val got = SetSimilarity.containmentPairs(df, "id", "text", 3, 8, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 6L))) // 6 shingles of doc 1, all in doc 2
    val jac = SetSimilarity.prefixJaccardPairs(df, "id", "text", 3, 8, 10)
    assert(jac.count() == 0, "jaccard at the same threshold must miss the paste")
  }

  test("exact-duplicate groups expand to every member pair (contraction path)") {
    val s = spark
    import s.implicits._
    // 3 copies of a 10-token doc, 2 copies of a 60%-similar doc, and 2
    // copies of a <3-token doc (empty 3-shingle set: identical copies must
    // NOT pair — the committed semantics the expansion has to preserve)
    val a = (1 to 10).map(i => s"w$i").mkString(" ")
    val b = ((1 to 8).map(i => s"w$i") ++ Seq("x1", "x2")).mkString(" ")
    val df = Seq((1L, a), (2L, a), (3L, a), (4L, b), (5L, b),
      (6L, "just two"), (7L, "just two")).toDF("id", "text")
    // ground truth: a genuinely UNCONTRACTED brute-force crossJoin +
    // array_intersect inline here (Dedup.jaccardPairs was itself rebuilt
    // onto the contraction path in round 12, so comparing against it would
    // be contracted-vs-contracted, not contracted-vs-direct)
    val shingled = df.select(col("id"),
        graft.functions.TextAnalysis.wordShingles(col("text"), 3).as("shs"))
      .withColumn("n", size(col("shs")))
    val truth = shingled.as("x").crossJoin(shingled.as("y"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("da"), col("y.id").as("db"),
        size(array_intersect(col("x.shs"), col("y.shs"))).cast("long").as("inter"),
        col("x.n").cast("long").as("na"), col("y.n").cast("long").as("nb"))
      .filter(col("inter") > 0 &&
        lit(2L) * col("inter") >= col("na") + col("nb") - col("inter"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val got = SetSimilarity.prefixJaccardPairs(df, "id", "text", 3, 5, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == truth)
    // the expansion really fired: all 3+1 within-group pairs and all 6
    // cross pairs, nothing from the shingle-less duplicates
    assert(got.size == 10)
    assert(got.contains((1L, 2L, 8L, 8L, 8L)) && got.contains((1L, 4L, 6L, 8L, 8L)))
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L || p._1 == 7L || p._2 == 7L))
    // containment: ordered within pairs both ways + both cross directions
    val cont = SetSimilarity.containmentPairs(df, "id", "text", 3, 7, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cont.contains((2L, 1L, 8L)) && cont.contains((1L, 2L, 8L)))
    assert(cont.contains((4L, 1L, 6L)) && cont.contains((1L, 4L, 6L)))
    assert(cont.size == 6 + 2 + 12)
    assert(!cont.exists(p => p._1 >= 6L || p._2 >= 6L))
  }

  test("containmentPairs: prefix-filtered result equals the brute-force set") {
    // ground truth from the unthresholded full-index pair join: every
    // co-shingle pair, thresholded per direction
    val all = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val brute = (all.collect { case (da, db, i, na, nb) if 10 * i >= 8 * na =>
        (da, db, i, na, nb) } ++
      all.collect { case (da, db, i, na, nb) if 10 * i >= 8 * nb =>
        (db, da, i, nb, na) }).toSet
    val got = SetSimilarity.containmentPairs(docs, "doc_id", "text",
        n = 3, tauNum = 8, tauDen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == brute)
    assert(got.nonEmpty, "sf0.001 corpus should contain containment pairs")
  }
}
