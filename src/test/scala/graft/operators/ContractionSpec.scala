package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.functions.{TextAnalysis, VectorFunctions}

/** Property test for the exact-duplicate contraction theorem
  * (`operators.Contraction` scaladoc): every pair operator rebuilt onto the
  * contraction path in round 12 must return EXACTLY what a direct
  * (uncontracted) reference computes, on random corpora with duplicate
  * multiplicities 1–100, empty/singleton shingle sets, zero vectors, NULL
  * signatures, and interleaved (adversarially scattered) ids — the edge
  * cases the prose theorem waves at. Covered operators (the six rebuilt in
  * r12): Dedup.jaccardPairs (with and without the member-weighted
  * frequency cap), Dedup.minHashNearDups, Dedup.simHashNearDups,
  * SetSimilarity.prefixJaccardPairs, SetSimilarity.containmentPairs,
  * Ann.cosineNearDupPairs.
  *
  * Reference strategies, strongest available per operator:
  *  - brute force in plain Scala collections from the collected corpus
  *    (jaccardPairs, prefix/containment — lossless-filter operators whose
  *    spec is a pure pair predicate; simHashNearDups — a closed-form
  *    chunk/hamming predicate);
  *  - the uncontracted building-block pipeline (minHashNearDups: shingle →
  *    sign → band → verify over the FULL member corpus — the pre-r12
  *    algorithm, which contraction must reproduce at any threshold,
  *    including thresholds where LSH recall < 1);
  *  - dedup→operate→expand (cosineNearDupPairs: with all-distinct payloads
  *    contraction is the identity, so running the operator on the distinct
  *    corpus and expanding rep pairs to member pairs in independent spec
  *    code IS the direct path — the banding internals stay private).
  */
class ContractionSpec extends SparkSpec {

  import scala.util.Random

  // ---- corpus generation ------------------------------------------------

  /** Random (id, text) corpus: short texts over a small token pool (so
    * empty / sub-n shingle sets and accidental payload collisions occur),
    * per-text duplicate multiplicities, ids shuffled so duplicate groups
    * are scattered across the id space (min-id rep selection crosses the
    * insertion order).
    */
  private def textCorpus(seed: Int, maxMult: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val pool = (0 until 14).map(i => s"t$i")
    val nBase = 6 + rnd.nextInt(7)
    val texts = (0 until nBase).map { _ =>
      val len = rnd.nextInt(11) // 0..10 tokens: < 3 means an empty 3-shingle set
      (0 until len).map(_ => pool(rnd.nextInt(pool.size))).mkString(" ")
    }.distinct
    val rows = texts.flatMap(t => Seq.fill(1 + rnd.nextInt(maxMult))(t))
    rnd.shuffle(rows.indices.toList).map(_.toLong).zip(rows)
  }

  /** Shingle sets per distinct text via the engine's own kernel (shingling
    * itself is not under test; the pair math downstream of it is).
    */
  private def shingleSetsByText(texts: Seq[String]): Map[String, Set[String]] = {
    val s = spark
    import s.implicits._
    texts.toDF("text")
      .select(col("text"), TextAnalysis.wordShingles(col("text"), 3).as("shs"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
  }

  private def collectRows(df: DataFrame, cols: String*): Set[Seq[Any]] =
    df.select(cols.map(col): _*).collect().toSet[Row].map(_.toSeq)

  // ---- jaccardPairs ------------------------------------------------------

  test("jaccardPairs (uncapped) equals brute force on duplicate-heavy random corpora") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(1, 2, 3, 4); maxMult <- Seq(8)) {
      val corpus = textCorpus(seed, maxMult)
      val sets = shingleSetsByText(corpus.map(_._2).distinct)
      val byId = corpus.map { case (id, t) => id -> sets(t) }.toMap
      val expected: Set[Seq[Any]] = (for {
        (a, sa) <- byId.toSeq; (b, sb) <- byId.toSeq if a < b
        inter = (sa intersect sb).size.toLong if inter >= 1
        na = sa.size.toLong; nb = sb.size.toLong
      } yield Seq[Any](a, b, inter, na, nb,
        inter.toDouble / (na + nb - inter))).toSet
      val got = collectRows(
        Dedup.jaccardPairs(corpus.toDF("id", "text"), "id", "text", n = 3),
        "da", "db", "inter", "na", "nb", "jaccard")
      assert(got == expected, s"seed=$seed")
    }
  }

  test("jaccardPairs member-weighted frequency cap equals brute force") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(5, 6, 7); m <- Seq(3, 10)) {
      val corpus = textCorpus(seed, 8)
      val sets = shingleSetsByText(corpus.map(_._2).distinct)
      val byId = corpus.map { case (id, t) => id -> sets(t) }.toMap
      // the cap's spec: a shingle is hot when its MEMBER document count
      // exceeds m (each duplicate counts), hot shingles never feed pair
      // generation, but na/nb stay the ORIGINAL set sizes
      val freq = byId.values.toSeq.flatten.groupBy(identity).map {
        case (sh, occ) => sh -> occ.size
      }
      val kept = freq.collect { case (sh, c) if c <= m => sh }.toSet
      val expected: Set[Seq[Any]] = (for {
        (a, sa) <- byId.toSeq; (b, sb) <- byId.toSeq if a < b
        inter = (sa intersect sb intersect kept).size.toLong if inter >= 1
        na = sa.size.toLong; nb = sb.size.toLong
      } yield Seq[Any](a, b, inter, na, nb,
        inter.toDouble / (na + nb - inter))).toSet
      val got = collectRows(
        Dedup.jaccardPairs(corpus.toDF("id", "text"), "id", "text", n = 3,
          maxShingleFreq = Some(m)),
        "da", "db", "inter", "na", "nb", "jaccard")
      assert(got == expected, s"seed=$seed m=$m")
    }
  }

  test("jaccardPairs survives a multiplicity-100 group exactly") {
    val s = spark
    import s.implicits._
    val rnd = new Random(99)
    val hot = "t1 t2 t3 t4 t5"
    val others = Seq("t1 t2 t3 t4 t9", "t7 t8 t9 t10", "", "t1")
    val rows = (Seq.fill(100)(hot) ++ others.flatMap(t => Seq.fill(1 + rnd.nextInt(3))(t)))
    val corpus = rnd.shuffle(rows.indices.toList).map(_.toLong).zip(rows)
    val sets = shingleSetsByText(corpus.map(_._2).distinct)
    val byId = corpus.map { case (id, t) => id -> sets(t) }.toMap
    val expected: Set[Seq[Any]] = (for {
      (a, sa) <- byId.toSeq; (b, sb) <- byId.toSeq if a < b
      inter = (sa intersect sb).size.toLong if inter >= 1
      na = sa.size.toLong; nb = sb.size.toLong
    } yield Seq[Any](a, b, inter, na, nb,
      inter.toDouble / (na + nb - inter))).toSet
    assert(expected.size >= 100 * 99 / 2) // the within-group clique is present
    val got = collectRows(
      Dedup.jaccardPairs(corpus.toDF("id", "text"), "id", "text", n = 3),
      "da", "db", "inter", "na", "nb", "jaccard")
    assert(got == expected)
  }

  // ---- prefix-filter set similarity ---------------------------------------

  test("prefixJaccardPairs equals brute force at several thresholds") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(11, 12, 13); (tn, td) <- Seq((1, 2), (3, 10), (9, 10))) {
      val corpus = textCorpus(seed, 8)
      val sets = shingleSetsByText(corpus.map(_._2).distinct)
      val byId = corpus.map { case (id, t) => id -> sets(t) }.toMap
      val expected: Set[Seq[Any]] = (for {
        (a, sa) <- byId.toSeq; (b, sb) <- byId.toSeq if a < b
        inter = (sa intersect sb).size.toLong if inter >= 1
        na = sa.size.toLong; nb = sb.size.toLong
        if td.toLong * inter >= tn.toLong * (na + nb - inter)
      } yield Seq[Any](a, b, inter, na, nb)).toSet
      val got = collectRows(
        SetSimilarity.prefixJaccardPairs(corpus.toDF("id", "text"),
          "id", "text", n = 3, tauNum = tn, tauDen = td),
        "da", "db", "inter", "na", "nb")
      assert(got == expected, s"seed=$seed tau=$tn/$td")
    }
  }

  test("containmentPairs equals brute force at several thresholds") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(21, 22, 23); (tn, td) <- Seq((1, 2), (8, 10))) {
      val corpus = textCorpus(seed, 8)
      val sets = shingleSetsByText(corpus.map(_._2).distinct)
      val byId = corpus.map { case (id, t) => id -> sets(t) }.toMap
      val expected: Set[Seq[Any]] = (for {
        (a, sa) <- byId.toSeq; (b, sb) <- byId.toSeq if a != b
        na = sa.size.toLong if na >= 1
        inter = (sa intersect sb).size.toLong
        nb = sb.size.toLong
        if td.toLong * inter >= tn.toLong * na
      } yield Seq[Any](a, b, inter, na, nb)).toSet
      val got = collectRows(
        SetSimilarity.containmentPairs(corpus.toDF("id", "text"),
          "id", "text", n = 3, tauNum = tn, tauDen = td),
        "da", "db", "inter", "na", "nb")
      assert(got == expected, s"seed=$seed tau=$tn/$td")
    }
  }

  // ---- minHash LSH ---------------------------------------------------------

  test("minHashNearDups equals the uncontracted band pipeline on the full corpus") {
    val s = spark
    import s.implicits._
    // thresholds well below the 0.9 design point: LSH misses are LEGAL down
    // here, and the contracted path must reproduce them too (identical
    // texts share every band key, so candidacy is payload-pure)
    for (seed <- Seq(31, 32); tau <- Seq(0.3, 0.8)) {
      val corpus = textCorpus(seed, 8)
      val df = corpus.toDF("id", "text")
      val fullSets = Dedup.shingleSets(df, "id", "text", n = 3)
      val sh = fullSets.select(col("id"), explode(col("shs")).as("s"))
      val expected = collectRows(
        Dedup.verifyPairs(
          Dedup.lshCandidates(Dedup.minHashSignatures(sh)), fullSets)
          .filter(col("jaccard") >= tau),
        "da", "db", "inter", "na", "nb", "jaccard")
      val got = collectRows(
        Dedup.minHashNearDups(df, "id", "text", n = 3, minJaccard = tau),
        "da", "db", "inter", "na", "nb", "jaccard")
      assert(got == expected, s"seed=$seed tau=$tau")
    }
  }

  test("crossNearDups equals the uncontracted cross-band pipeline (r14 contraction)") {
    val s = spark
    import s.implicits._
    // the round-14 rebuild (found by the sf100 probe: uncontracted, the
    // even x odd candidate join exploded quadratically in the duplicate
    // multiplicity). Reference = the pre-r14 pipeline over the FULL member
    // sides; thresholds below the design point make LSH misses legal, and
    // cross-side identical texts must still pair at jaccard 1.0 through
    // the rep-level candidate (no within-group special case exists here).
    for (seed <- Seq(41, 42); tau <- Seq(0.3, 0.8)) {
      val corpus = textCorpus(seed, 8)
      val df = corpus.toDF("id", "text")
      val ref = df.filter(col("id") % 2 === 0)
      val batch = df.filter(col("id") % 2 === 1)
      val refSets = Dedup.shingleSets(ref, "id", "text", n = 3)
      val batchSets = Dedup.shingleSets(batch, "id", "text", n = 3)
      def keys(sets: DataFrame) = Dedup.bandKeys(Dedup.minHashSignatures(
        sets.select(col("id"), explode(col("shs")).as("s"))))
      val cand = keys(refSets).as("a")
        .join(keys(batchSets).as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key"))
        .select(col("a.id").as("da"), col("b.id").as("db"))
        .distinct()
      val expected = collectRows(
        Dedup.verifyPairsAcross(cand, refSets, batchSets)
          .filter(col("jaccard") >= tau),
        "da", "db", "inter", "na", "nb", "jaccard")
      val got = collectRows(
        Dedup.crossNearDups(ref, batch, "id", "text", n = 3, minJaccard = tau),
        "da", "db", "inter", "na", "nb", "jaccard")
      assert(got == expected, s"seed=$seed tau=$tau")
    }
  }

  test("nearDupComponents equals CC over the expanded member pair list (r14)") {
    val s = spark
    import s.implicits._
    // the round-14 rebuild of the cluster family (found by the sf100
    // probe: CC over member pairs shuffles O(multiplicity²) edges).
    // Reference = the pre-r14 path: expand ALL member pairs, run the CC
    // operator on them. Must match label-for-label, including edge-free
    // short docs (absent), singleton groups (absent), and duplicate
    // groups with no cross-text edges (own clique, labelled by min id).
    for (seed <- Seq(51, 52, 53); tau <- Seq(0.3, 0.9)) {
      val corpus = textCorpus(seed, 8)
      val df = corpus.toDF("id", "text")
      val pairs = Dedup.minHashNearDups(df, "id", "text", n = 3,
          minJaccard = tau)
        .select(col("da"), col("db"))
      val expected = collectRows(
        ConnectedComponents.assign(pairs)
          .select(col("id"), col("comp").as("component")),
        "id", "component")
      val got = collectRows(
        Dedup.nearDupComponents(df, "id", "text", n = 3, minJaccard = tau),
        "id", "component")
      assert(got == expected, s"seed=$seed tau=$tau")
    }
  }

  test("cosineNearDupComponents equals CC over the expanded member pair list (r14)") {
    val s = spark
    import s.implicits._
    // the q64 face of the same rebuild, in embedding space: zero vectors
    // (never pair), scaled copies (cosine 1.0 across distinct payloads)
    // and exact-duplicate groups, against CC over the operator's own
    // expanded pair output
    for (seed <- Seq(61, 62)) {
      val rnd = new Random(seed)
      val base = (0 until 8).map(_ =>
        Array.fill(8)((rnd.nextInt(9) - 4).toFloat))
      val vecs = base.flatMap { v =>
        val copies = 1 + rnd.nextInt(6)
        Seq.fill(copies)(v) ++
          (if (rnd.nextBoolean()) Seq(v.map(_ * 2.0f)) else Nil)
      } ++ Seq(Array.fill(8)(0.0f), Array.fill(8)(0.0f))
      val rows = rnd.shuffle(vecs.indices.toList).map(_.toLong).zip(vecs)
      val df = rows.toDF("id", "emb")
      val pairs = Ann.cosineNearDupPairs(df, "id", "emb", minSim = 0.35,
          bands = 4, planesPerBand = 6, dim = 8, portable = true)
        .select(col("da"), col("db"))
      val expected = collectRows(
        ConnectedComponents.assign(pairs)
          .select(col("id"), col("comp").as("component")),
        "id", "component")
      val got = collectRows(
        Ann.cosineNearDupComponents(df, "id", "emb", minSim = 0.35,
          bands = 4, planesPerBand = 6, dim = 8, portable = true),
        "id", "component")
      assert(got == expected, s"seed=$seed")
    }
  }

  // ---- simHash ---------------------------------------------------------------

  test("simHashNearDups equals brute force; NULL signatures never pair") {
    val rnd = new Random(41)
    val bases = Seq.fill(5)(rnd.nextLong())
    val sigs: Seq[java.lang.Long] =
      bases.flatMap(b => Seq.fill(1 + rnd.nextInt(6))( // exact dups
        java.lang.Long.valueOf(b))) ++
        bases.map(b => java.lang.Long.valueOf(b ^ (1L << rnd.nextInt(60)))) ++
        bases.map(b => java.lang.Long.valueOf(b ^ 7L)) ++ // hamming-3, one chunk
        Seq.fill(4)(null.asInstanceOf[java.lang.Long]) // must vanish
    val rows = rnd.shuffle(sigs.indices.toList).map(_.toLong).zip(sigs)
    val schema = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("simhash", LongType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) => Row(i, v) }, 4),
      schema)
    val present = rows.collect { case (i, v) if v != null => i -> v.longValue }
    def chunks(v: Long): Set[(Int, Long)] =
      (0 until 4).map(ci => ci -> ((v >> (ci * 15)) & 0x7FFFL)).toSet
    val expected: Set[Seq[Any]] = (for {
      (a, va) <- present; (b, vb) <- present if a < b
      if (chunks(va) intersect chunks(vb)).nonEmpty
      h = java.lang.Long.bitCount(va ^ vb) if h <= 3
    } yield Seq[Any](a, b, h)).toSet
    val got = collectRows(Dedup.simHashNearDups(df, maxHamming = 3),
      "da", "db", "hamming")
    assert(got == expected)
    assert(expected.nonEmpty)
    val nullIds = rows.collect { case (i, v) if v == null => i }.toSet
    assert(!got.exists(r => nullIds(r(0).asInstanceOf[Long]) ||
      nullIds(r(1).asInstanceOf[Long])))
  }

  // ---- embedding cosine ----------------------------------------------------

  test("cosineNearDupPairs equals dedup→operate→expand (zero vectors, scaled copies)") {
    val s = spark
    import s.implicits._
    val rnd = new Random(51)
    val dim = 8
    def vec(): Array[Float] = Array.fill(dim)((rnd.nextInt(9) - 4).toFloat)
    val bases = Seq.fill(6)(vec()) :+ Array.fill(dim)(0.0f)
    val scaled = bases.take(2).map(_.map(_ * 2.0f)) // same direction, distinct payload
    val all = bases ++ scaled
    val rows = all.flatMap(v => Seq.fill(1 + rnd.nextInt(5))(v))
    val corpus = rnd.shuffle(rows.indices.toList).map(_.toLong).zip(rows)
    val df = corpus.toDF("id", "emb")
    val minSim = 0.5
    // distinct corpus: one min-id rep per exact payload (float equality)
    val groups = corpus.groupBy(_._2.toSeq).map { case (_, g) =>
      val ids = g.map(_._1).sorted; (ids.head, ids, g.head._2)
    }.toSeq
    val repDf = groups.map { case (rid, _, v) => (rid, v) }.toDF("id", "emb")
    // with all-distinct payloads the contraction is the identity, so this
    // IS the direct path; expansion below is independent spec code
    val repPairs = Ann.cosineNearDupPairs(repDf, "id", "emb", minSim,
        bands = 3, planesPerBand = 6, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // self-sim through the engine's own kernel so doubles are bit-identical
    val selfSim = repDf.select(col("id"),
        VectorFunctions.cosineSim(col("emb"), col("emb")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val members = groups.map { case (rid, ids, _) => rid -> ids }.toMap
    val cross: Set[Seq[Any]] = (for {
      (ra, rb, sim) <- repPairs.toSeq
      ma <- members(ra); mb <- members(rb)
    } yield Seq[Any](math.min(ma, mb), math.max(ma, mb), sim)).toSet
    val within: Set[Seq[Any]] = (for {
      (rid, ids) <- members.toSeq if ids.size >= 2 && selfSim(rid) >= minSim
      a <- ids; b <- ids if a < b
    } yield Seq[Any](a, b, selfSim(rid))).toSet
    assert(within.nonEmpty) // the duplicate groups actually exercise expansion
    val got = collectRows(
      Ann.cosineNearDupPairs(df, "id", "emb", minSim,
        bands = 3, planesPerBand = 6, dim = dim),
      "da", "db", "sim")
    assert(got == (cross ++ within))
  }

  // ---- loud guard -----------------------------------------------------------

  test("byKey rejects non-integral id columns loudly instead of null-casting") {
    val s = spark
    import s.implicits._
    val df = Seq(("doc-a", "x y z"), ("doc-b", "x y z")).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Contraction.byKey(df, "id", md5(col("text").cast("binary")))
    }
    assert(e.getMessage.contains("integral id column"))
  }
}
