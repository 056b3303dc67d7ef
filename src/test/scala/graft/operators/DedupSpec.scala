package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  private lazy val docs: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy cat"), // near dup of 1/2
      (4L, "completely different text about spark engines here now"),
      (5L, "short text")
    ).toDF("doc_id", "text")
  }

  test("exact dedup keeps lowest id as survivor") {
    val r = Dedup.exact(docs, "doc_id", "text")
      .select("doc_id", "is_survivor").collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r == Map(1L -> 1, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 1))
  }

  test("exact dedup: no exchange carries the text column") {
    // mirror of the q18 plan audit (PlanSpec): the winner-per-fingerprint
    // aggregate and the non-survivor derivation must shuffle slim
    // (fp, id) / id rows only; the full-row side attaches the flag via a
    // join AQE turns into a broadcast. Materialize first so the assertion
    // reads the FINAL adaptive plan, then check every Exchange node's
    // input column list.
    val r = Dedup.exact(docs, "doc_id", "text")
    r.collect()
    val p = r.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val lines = p.linesIterator.toVector
    val exchangeInputs = lines.zipWithIndex.collect {
      case (l, i) if l.matches("""\(\d+\) Exchange.*""") =>
        lines.drop(i + 1).take(2).mkString(" ")
    }
    assert(exchangeInputs.nonEmpty, "expected at least the fp aggregate exchange")
    val bad = exchangeInputs.filter(_.contains("text#"))
    assert(bad.isEmpty, s"exchange carries the text column: ${bad.mkString("; ")}")
  }

  test("jaccardPairs computes exact shingle jaccard") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3)
      .collect().map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")) ->
        r.getAs[Double]("jaccard")).toMap
    // docs 1,2 identical: 7 shingles each, jaccard 1.0
    assert(pairs((1L, 2L)) == 1.0)
    // docs 1,3 differ in last token: shingles 7 each, 6 shared -> 6/8
    assert(pairs((1L, 3L)) == 0.75)
    assert(pairs((2L, 3L)) == 0.75)
    // unrelated docs share no shingle -> absent
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((4L, 5L)))
  }

  test("minHash near-dups at 0.7 finds exactly the near-dup cluster") {
    val got = Dedup.minHashNearDups(docs, "doc_id", "text", n = 3, minJaccard = 0.7)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("dedupByCluster drops transitive near-dups, keeps min id per cluster") {
    // docs 1,2,3 form one near-dup cluster at j >= 0.7 (1~2 exact, 1~3/2~3
    // at 0.75); 4 and 5 are unrelated singletons
    val kept = Dedup.dedupByCluster(docs, "doc_id", "text", minJaccard = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L))
  }

  test("minHash non-default numPerm/bands: same near-dup set, sig length follows") {
    val sig = Dedup.minHashSignatures(
      Dedup.shingles(docs, "doc_id", "text", 3), numPerm = 32)
    assert(sig.select("sig").collect()
      .forall(_.getAs[scala.collection.Seq[Long]](0).length == 32))
    val got = Dedup.minHashNearDups(docs, "doc_id", "text", n = 3,
      minJaccard = 0.7, numPerm = 32, bands = 8)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // bands must divide numPerm — fail fast, not silent empty band keys
    intercept[IllegalArgumentException](
      Dedup.lshCandidates(sig, bands = 10, numPerm = 32))
  }

  test("verifyPairs matches exact jaccardPairs on its candidates") {
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    val s = spark
    import s.implicits._
    val cand = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("da", "db")
    val got = Dedup.verifyPairs(cand, sets)
      .collect().map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")) ->
        r.getAs[Double]("jaccard")).toMap
    // pair (1,4) shares nothing: jaccard 0, still verified (present)
    assert(got == Map((1L, 2L) -> 1.0, (1L, 3L) -> 0.75, (1L, 4L) -> 0.0))
  }

  test("incrementalExact dedups within and across batches via the fp store") {
    val s = spark
    import s.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft-fpstore").toString + "/fps"
    val batch1 = Seq(
      (1L, "alpha"), (2L, "alpha"), (3L, "beta")).toDF("doc_id", "text")
    val out1 = Dedup.incrementalExact(batch1, "doc_id", "text", store)
    assert(out1.select("doc_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 3L)) // in-batch dup 2 dropped
    // re-executing the RETURNED plan after the append must not change it
    assert(out1.count() == 2)

    val batch2 = Seq(
      (10L, "alpha"),  // seen in batch 1 -> dropped
      (11L, "gamma"), (12L, "gamma"), // new; in-batch dup dropped
      (13L, "beta")    // seen -> dropped
    ).toDF("doc_id", "text")
    val out2 = Dedup.incrementalExact(batch2, "doc_id", "text", store)
    assert(out2.select("doc_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(11L))
    // store now holds exactly the three distinct fingerprints
    assert(spark.read.parquet(store).distinct().count() == 3)
  }

  test("crossNearDups matches ref x batch only, never within a side") {
    val s = spark
    import s.implicits._
    val ref = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy dog"), // dup WITHIN ref
      (5L, "completely different text about spark engines here now")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (2L, "the quick brown fox jumps over the lazy dog"), // dup of ref 1,3
      (4L, "totally unrelated content in this brand new batch document"),
      (6L, "totally unrelated content in this brand new batch document")
    ).toDF("doc_id", "text") // 4,6 dup WITHIN batch only
    val got = Dedup.crossNearDups(ref, batch, "doc_id", "text",
        n = 3, minJaccard = 0.9)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only cross pairs: batch doc 2 matches both ref copies; the in-ref
    // (1,3) and in-batch (4,6) dup pairs must NOT appear
    assert(got == Set((1L, 2L), (3L, 2L)))
  }

  test("crossNearDups agrees with the self-join operator on cross pairs") {
    val s = spark
    import s.implicits._
    val all = docs
    val ref = all.filter($"doc_id" % 2 === 1)
    val batch = all.filter($"doc_id" % 2 === 0)
    val cross = Dedup.crossNearDups(ref, batch, "doc_id", "text",
        n = 3, minJaccard = 0.5)
      .select("da", "db", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val self = Dedup.minHashNearDups(all, "doc_id", "text",
        n = 3, minJaccard = 0.5)
      .select("da", "db", "jaccard").collect()
      .collect { case r if (r.getLong(0) % 2 == 1) != (r.getLong(1) % 2 == 1) =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        (if (a % 2 == 1) (a, b) else (b, a)) -> r.getDouble(2)
      }.toMap
    assert(cross == self)
  }

  test("duplicatePassageShare: exact dups share 1, uniques share 0") {
    val r = Dedup.duplicatePassageShare(docs, "doc_id", "text", n = 3)
      .collect().map(x => x.getAs[Long]("id") ->
        (x.getAs[Long]("n_dup"), x.getAs[Double]("dup_share"))).toMap
    // docs 1,2 identical -> every passage duplicated; doc 3 shares 6 of 7
    // 3-shingles with them; doc 4 unique; doc 5 too short for 3-shingles
    assert(r(1L)._2 == 1.0 && r(2L)._2 == 1.0)
    assert(r(3L) == (6L, 6.0 / 7))
    assert(r(4L) == (0L, 0.0))
    assert(!r.contains(5L))
  }

  test("simHash is deterministic and identical for identical text") {
    val h = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    assert(h(1L) != h(4L))
    assert(h.values.forall(v => v >= 0 && v < (1L << 60)))
  }

  test("simHashNearDups finds hamming-0 pairs via chunk banding") {
    val sims = Dedup.simHash(docs, "doc_id", "text")
    val got = Dedup.simHashNearDups(sims, maxHamming = 3)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)))
    assert(!got.contains((1L, 4L)))
  }
}
