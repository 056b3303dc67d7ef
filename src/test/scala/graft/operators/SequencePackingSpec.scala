package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SequencePackingSpec extends SparkSpec {
  import spark.implicits._

  test("bins respect the budget, cover every doc once, and pack tightly") {
    val docs = (1L to 1000L).map(i => (i, (i * 37 % 900) + 50)).toDF("doc_id", "n_tokens")
    val bins = SequencePacking.pack(docs, "doc_id", "n_tokens", maxTokens = 2048L)
      .cache()
    val rows = bins.collect()
    // no non-oversize bin exceeds the budget (and none here is oversize)
    assert(rows.forall(r => r.getAs[Long]("total_tokens") <= 2048L))
    assert(rows.forall(r => !r.getAs[Boolean]("oversize")))
    // every doc packed exactly once
    val packedIds = rows.flatMap(_.getAs[scala.collection.Seq[Long]]("doc_ids")).sorted
    assert(packedIds.toSeq == (1L to 1000L))
    // bin ids unique
    assert(rows.map(_.getAs[Long]("bin_id")).distinct.length == rows.length)
    // FFD on ~500-token-average docs into 2048 budgets: efficiency well
    // above naive one-doc-per-bin
    val eff = SequencePacking.efficiency(bins, 2048L)
    assert(eff > 0.8, s"packing efficiency $eff")
    bins.unpersist()
  }

  test("oversize documents get flagged singleton bins, never dropped") {
    val docs = Seq((1L, 5000L), (2L, 100L), (3L, 120L)).toDF("doc_id", "n_tokens")
    val rows = SequencePacking.pack(docs, "doc_id", "n_tokens", maxTokens = 1024L)
      .collect()
    val over = rows.filter(_.getAs[Boolean]("oversize"))
    assert(over.length == 1 && over.head.getAs[scala.collection.Seq[Long]]("doc_ids").toSeq == Seq(1L))
    val packedIds = rows.flatMap(_.getAs[scala.collection.Seq[Long]]("doc_ids")).sorted
    assert(packedIds.toSeq == Seq(1L, 2L, 3L))
  }

  test("property: invariants hold for arbitrary corpora and budgets") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.zip(
      Gen.chooseNum(64L, 4096L),
      Gen.listOfN(60, Gen.chooseNum(1L, 6000L)))
    (0 until 12).foreach { i =>
      val (budget, toks) = gen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val docs = toks.zipWithIndex.map { case (t, id) => (id.toLong, t) }
        .toDF("doc_id", "n_tokens").repartition(1 + i % 5)
      val rows = SequencePacking.pack(docs, "doc_id", "n_tokens", budget).collect()
      // every doc exactly once
      val packed = rows.flatMap(_.getAs[scala.collection.Seq[Long]]("doc_ids"))
      assert(packed.sorted.toSeq == toks.indices.map(_.toLong),
        s"seed $i: coverage broken")
      // every non-oversize bin respects the budget; oversize = singleton
      rows.foreach { r =>
        if (r.getAs[Boolean]("oversize"))
          assert(r.getAs[Long]("n_docs") == 1L, s"seed $i: oversize not singleton")
        else assert(r.getAs[Long]("total_tokens") <= budget, s"seed $i: over budget")
      }
      // totals conserve
      assert(rows.map(_.getAs[Long]("total_tokens")).sum == toks.sum,
        s"seed $i: token mass lost")
      // bin ids unique
      assert(rows.map(_.getAs[Long]("bin_id")).distinct.length == rows.length)
    }
  }

  test("chunk -> pack pipeline: every chunk binned once, budget respected") {
    // the production composition: WordChunks splits long docs into stride
    // windows, SequencePacking bins the chunks under a token budget
    val chunks = graft.core.Tables(spark, sf("sf0.01")).documents
      .select($"doc_id",
        posexplode(graft.functions.TextAnalysis.wordChunks($"text", 32, 24))
          .as(Seq("ci", "c")))
      // synthetic global chunk id for the packer
      .select(($"doc_id" * 1000 + $"ci").as("chunk_id"),
        graft.functions.TextAnalysis.tokenCount($"c").cast("long").as("n_tokens"))
    val nChunks = chunks.count()
    val maxChunkTokens = chunks.agg(max($"n_tokens")).first().getLong(0)
    assert(maxChunkTokens <= 32L, "chunker emitted an over-size window")
    val bins = SequencePacking.pack(chunks, "chunk_id", "n_tokens",
      maxTokens = 128L)
    assert(bins.agg(sum($"n_docs")).first().getLong(0) == nChunks)
    // 32-token chunks under a 128 budget: nothing can be oversize
    assert(bins.filter($"oversize").count() == 0L)
    assert(bins.filter($"total_tokens" > 128L).count() == 0L)
  }

  test("packs the documents table by its token counts") {
    val docs = graft.core.Tables(spark, sf("sf0.01")).documents
      .select($"doc_id", graft.functions.TextAnalysis.tokenCount($"text")
        .cast("long").as("n_tokens"))
    val bins = SequencePacking.pack(docs, "doc_id", "n_tokens", maxTokens = 512L)
    val n = docs.count()
    assert(bins.agg(sum($"n_docs")).first().getLong(0) == n)
    assert(bins.filter($"total_tokens" > 512L && !$"oversize").count() == 0L)
  }

  test("packGroupsSequential: next-fit semantics, oversize, determinism") {
    val s2 = spark
    import s2.implicits._
    // group a: 900+900 fit one bin; 900 opens bin 1; 2500 oversize owns
    // bin 2; trailing 100 goes to bin 3 (next-fit never looks back)
    val rows = Seq(
      ("a", 1L, 900L), ("a", 2L, 900L), ("a", 3L, 900L), ("a", 4L, 2500L),
      ("a", 5L, 100L), ("b", 1L, 2000L), ("b", 2L, 1L))
    val df = rows.toDF("src", "id", "w").repartition(4)
    val got = SequencePacking.packGroupsSequential(df, "src", "id", "w", 2000L)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(3))).toMap
    assert(got == Map(("a", 1L) -> 0L, ("a", 2L) -> 0L, ("a", 3L) -> 1L,
      ("a", 4L) -> 2L, ("a", 5L) -> 3L, ("b", 1L) -> 0L, ("b", 2L) -> 1L))
    // layout is a pure function of the data: any input partitioning agrees
    val again = SequencePacking.packGroupsSequential(
        df.repartition(1).sortWithinPartitions($"w".desc), "src", "id", "w", 2000L)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(3))).toMap
    assert(again == got)
  }

  test("packGroupsSequential: one giant group streams, matches driver fold") {
    val s2 = spark
    import s2.implicits._
    // a single hot key holding every row — the skewed-source case the
    // streaming fold exists for; weights vary so bins close irregularly
    val n = 200000
    val df = (0 until n).map(i => ("hot", i.toLong, (i * 131 % 977 + 1).toLong))
      .toDF("src", "id", "w").repartition(16)
    val got = SequencePacking.packGroupsSequential(df, "src", "id", "w", 5000L)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toMap
    // driver reimplementation of the next-fit fold in id order
    var bin = 0L; var used = 0L
    val want = (0 until n).map { i =>
      val w = (i * 131 % 977 + 1).toLong
      if (used + w > 5000L && used > 0) { bin += 1; used = 0L }
      used += w
      i.toLong -> bin
    }.toMap
    assert(got.size == n)
    assert(got == want)
  }
}
