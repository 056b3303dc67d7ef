package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tie-determinism sweep (round 13, VERDICT r12 #8 — the sf10 asof
  * tie-break fix generalized): every order-dependent operator must return
  * the SAME result regardless of partition count and input row order, on
  * corpora built to be maximally tie-heavy — duplicate (key, ts) rows,
  * duplicate payloads, duplicate scores, duplicate weights. Partition
  * sweep: 1 / 4 / 16 partitions plus a shuffled-row-order variant; any
  * divergence means an operator is leaking physical layout into results
  * (the class of bug DuckDB's unspecified ASOF tie pick exposed at sf10).
  *
  * Operators swept: AsOfJoin.latestPrior / earliestAfter, TopKByAgg,
  * Sampling.qualityQuota, SequencePacking.packGroupsSequential, and the
  * rank family (ParallelRank.rowNumber, both dispatches). For rowNumber
  * under TIED order keys the assignment within a tie is contractually
  * caller-packed (q101/q120 build strict total orders), so the sweep
  * asserts the partition-invariant part — every tied value owns the same
  * contiguous rank block at every layout — and full invariance for strict
  * keys.
  */
class TieDeterminismSpec extends SparkSpec {

  import scala.util.Random

  private val layouts = Seq(1, 4, 16)

  /** Canonical multiset rendering of a result, independent of row order. */
  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Run `op` over every layout of `rows` (partition counts × one shuffled
    * row order) and assert all results identical.
    */
  private def sweep(rows: Seq[org.apache.spark.sql.Row],
      schema: org.apache.spark.sql.types.StructType,
      tag: String)(op: DataFrame => DataFrame): Unit = {
    val rnd = new Random(7)
    val orders = Seq(rows, rnd.shuffle(rows))
    val results = for (o <- orders; n <- layouts) yield {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(o, n), schema)
      canon(op(df))
    }
    assert(results.distinct.size == 1,
      s"$tag: result depends on physical layout")
    assert(results.head.nonEmpty, s"$tag: sweep corpus produced no rows")
  }

  private def longSchema(names: String*): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(names.map(n =>
      org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.LongType, nullable = false)))

  // ---- as-of joins ---------------------------------------------------------

  private def tieEvents(seed: Int, n: Int): Seq[(Long, Long, Long, Long)] = {
    val rnd = new Random(seed)
    // 4 keys × 4 timestamps × tiny payload domain: duplicate (key, ts)
    // rows are the NORM, and many of them also tie on the payload
    (0 until n).map { i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(4).toLong * 10L,
        rnd.nextInt(6).toLong, rnd.nextInt(3).toLong)
    }
  }

  test("AsOfJoin.latestPrior is layout-invariant under heavy (key, ts) ties") {
    val s = spark
    import s.implicits._
    val left = tieEvents(1, 60).zipWithIndex
      .map { case ((k, ts, _, _), i) => (k, ts, i.toLong) }
      .toDF("k", "ts", "lid")
    val rightRows = tieEvents(2, 80)
      .map { case (k, ts, rid, rv) => org.apache.spark.sql.Row(k, ts, rid, rv) }
    sweep(rightRows, longSchema("k", "ts", "rid", "rv"), "latestPrior") { right =>
      AsOfJoin.latestPrior(left, right, Seq("k"), "ts",
        rightPayload = Seq("rid", "rv"))
    }
  }

  test("AsOfJoin.earliestAfter is layout-invariant under heavy (key, ts) ties") {
    val s = spark
    import s.implicits._
    val left = tieEvents(3, 60).zipWithIndex
      .map { case ((k, ts, _, _), i) => (k, ts, i.toLong) }
      .toDF("k", "ts", "lid")
    val rightRows = tieEvents(4, 80)
      .map { case (k, ts, rid, rv) => org.apache.spark.sql.Row(k, ts, rid, rv) }
    sweep(rightRows, longSchema("k", "ts", "rid", "rv"), "earliestAfter") { right =>
      AsOfJoin.earliestAfter(left, right, Seq("k"), "ts",
        rightPayload = Seq("rid", "rv"))
    }
  }

  // ---- bounded-heap top-k ---------------------------------------------------

  test("TopKByAgg matches the window rank under score ties at every layout") {
    import org.apache.spark.sql.graft.{Bridge, TopKByAgg}
    val rnd = new Random(5)
    val rows = (0 until 120).map { i =>
      org.apache.spark.sql.Row(rnd.nextInt(3).toLong, i.toLong,
        rnd.nextInt(4).toLong) // value ties everywhere
    }
    val schema = longSchema("g", "id", "v")
    // window reference (the semantics TopKByAgg documents): ord desc, id asc
    val refDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v").cast("double").desc, col("id"))
    val ref = canon(refDf.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("g", "id", "v"))
    sweep(rows, schema, "TopKByAgg") { df =>
      df.groupBy("g")
        .agg(Bridge.column(TopKByAgg(
            Bridge.expression(col("v").cast("double")),
            Bridge.expression(col("id")), 3)
          .toAggregateExpression()).as("top"))
        .select(col("g"), explode(col("top")).as("t"))
        .select(col("g"), col("t.id").as("id"),
          col("t.ord").cast("long").as("v"))
    }
    // and the agg's pick equals the window pick (not merely layout-stable)
    val got = canon {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 16), schema)
      df.groupBy("g")
        .agg(Bridge.column(TopKByAgg(
            Bridge.expression(col("v").cast("double")),
            Bridge.expression(col("id")), 3)
          .toAggregateExpression()).as("top"))
        .select(col("g"), explode(col("top")).as("t"))
        .select(col("g"), col("t.id").as("id"),
          col("t.ord").cast("long").as("v"))
    }
    assert(got == ref)
  }

  // ---- quality quota -----------------------------------------------------------

  test("qualityQuota is layout-invariant under heavy score ties") {
    val rnd = new Random(6)
    val rows = (0 until 100).map { i =>
      org.apache.spark.sql.Row(rnd.nextInt(2).toLong, i.toLong,
        rnd.nextInt(3).toLong)
    }
    sweep(rows, longSchema("source", "id", "score"), "qualityQuota") { df =>
      Sampling.qualityQuota(df, Seq("source"), "score", "id", quota = 7)
    }
  }

  // ---- sequential packing ---------------------------------------------------

  test("packGroupsSequential is layout-invariant under duplicate weights") {
    val rnd = new Random(8)
    val rows = (0 until 150).map { i =>
      org.apache.spark.sql.Row(rnd.nextInt(3).toLong, i.toLong,
        (1L + rnd.nextInt(3)) * 10L) // weights tie constantly
    }
    sweep(rows, longSchema("key", "id", "w"), "packGroupsSequential") { df =>
      SequencePacking.packGroupsSequential(df, "key", "id", "w", budget = 45L)
    }
  }

  test("pack (partition-local FFD) keeps its validity invariants at every layout") {
    // pack's bin IDS are partitioning-dependent BY DESIGN (the scaladoc
    // names packGroupsSequential as the replayable form) — what must hold
    // at every layout: every doc lands in exactly one bin, no non-oversize
    // bin exceeds the budget, oversize bins are singletons
    val rnd = new Random(9)
    val budget = 100L
    val rows = (0 until 80).map { i =>
      org.apache.spark.sql.Row(i.toLong,
        if (rnd.nextInt(10) == 0) 150L else (1L + rnd.nextInt(5)) * 20L)
    }
    for (n <- layouts) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n), longSchema("id", "tok"))
      val bins = SequencePacking.pack(df, "id", "tok", budget).collect()
      val all = bins.flatMap(_.getSeq[Long](1))
      assert(all.sorted.toSeq == (0L until 80L), s"n=$n: docs lost or duplicated")
      bins.foreach { b =>
        val total = b.getLong(2); val docs = b.getLong(3)
        val oversize = b.getBoolean(4)
        assert(oversize == (total > budget), s"n=$n: oversize flag wrong")
        if (oversize) assert(docs == 1L, s"n=$n: oversize bin not a singleton")
      }
    }
  }

  // ---- rank family ---------------------------------------------------------------

  test("ParallelRank.rowNumber: strict keys are layout-invariant on both dispatches") {
    val rnd = new Random(10)
    val keys = rnd.shuffle((0 until 200).toList)
    val rows = keys.zipWithIndex.map { case (k, i) =>
      org.apache.spark.sql.Row(i.toLong % 4L, k.toLong)
    }
    for (hint <- Seq(true, false)) {
      sweep(rows, longSchema("g", "k"), s"rowNumber(hint=$hint)") { df =>
        ParallelRank.rowNumber(df, Seq("g"), "k", rankCol = "rn",
          smallGroupsHint = hint)
      }
    }
  }

  test("ParallelRank.rowNumber: tied keys own the same contiguous rank block everywhere") {
    val rnd = new Random(11)
    val rows = (0 until 200).map { _ =>
      org.apache.spark.sql.Row(rnd.nextInt(5).toLong) // 5 values, ~40 ties each
    }
    // at every layout: the ranks of value v must be exactly the contiguous
    // block (|smaller| + 1) .. (|smaller| + |v|) — any lost or duplicated
    // rank under ties is a layout leak even though intra-tie assignment is
    // contractually unspecified (callers pack strict orders; q101/q120)
    val byVal = rows.groupBy(_.getLong(0)).view.mapValues(_.size).toMap
    for (n <- layouts; hint <- Seq(true, false)) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n), longSchema("k"))
      val got = ParallelRank.rowNumber(df, Seq.empty, "k", rankCol = "rn",
          smallGroupsHint = hint)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      got.groupBy(_._1).foreach { case (v, g) =>
        val smaller = byVal.filter(_._1 < v).values.sum
        val ranks = g.map(_._2).sorted.toSeq
        assert(ranks == ((smaller + 1L) to (smaller + byVal(v))).toSeq,
          s"n=$n hint=$hint value=$v: rank block broken")
      }
    }
  }
}
