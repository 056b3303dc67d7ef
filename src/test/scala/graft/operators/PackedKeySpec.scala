package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Systematic boundary audit of EVERY packed-long key site (round 13,
  * VERDICT r12 #7 — q101/q120 were found one at a time by the sf10 gate;
  * this spec closes the class). Grep audit of `shiftleft|<< *42|<< *31`
  * over src/main — every packed-key site and how this spec drives it:
  *
  *  1. `queries/Stats.scala` q101 gini sort key `r·2^31 + c`
  *     — via SparkEntry q101 on a custkey-shifted sf0.001 corpus: max
  *       custkey pinned to 2^31−1 (must equal the unshifted result —
  *       a uniform key shift preserves the (r, c) order) and to 2^31
  *       (must raise); revenue inflated ×10^5 pushes r past 2^32 (raise).
  *  2. `queries/Features.scala` q120 decile key `(cents+2^24)·2^31 + c`
  *     — via SparkEntry q120, same shift protocol on customer; one
  *       acctbal row pinned to ±(2^24−1)/100 cents (pass) and 2^24/100
  *       (raise).
  *  3. `operators/GraphOps.scala` triangleCounts pack `deg·2^42 | id`,
  *     BOTH dispatch paths (driver collect via default budget,
  *     distributed via driverEdgeBudget=0): triangle at ids 2^42−3..−1
  *     counts exactly; id = 2^42 raises on both paths; a 2^21-edge star
  *     drives the degree bound on the driver path (raise).
  *  4. `operators/Dedup.scala` jaccardPairs id encode `id·2^20 + n`
  *     — ids at 2^43−1 pair exactly (stats equal the small-id corpus);
  *       id = 2^43 and negative ids raise. (The n < 2^20 arm needs a
  *       million-shingle document — out of unit-test reach; it shares
  *       the same guard expression the id arms prove fires.)
  *  5. `operators/Layout.scala` zOrderKey/quantize bit interleave —
  *     exact vs an independent Scala reference at the 2^16 domain edges;
  *     quantize's top bucket stays < 2^bits at v = vmax.
  *
  * `operators/ParallelRank` itself carries no packed key — its composite
  * keys are exactly the q101/q120 sort keys driven above.
  */
class PackedKeySpec extends SparkSpec {

  private def assertRaises(frag: String)(body: => Unit): Unit = {
    val e = intercept[Throwable](body)
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).take(10)
      .flatMap(t => Option(t.getMessage)).toSeq
    assert(msgs.exists(_.contains(frag)),
      s"expected an error mentioning '$frag', got: $msgs")
  }

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_pk_$tag").toString

  /** Copy the sf0.001 tables `names` into a fresh dir, applying `f` to the
    * named table — the synthetic-corpus harness for the query-level sites.
    */
  private def corpusWith(names: Seq[String], mod: String)(
      f: DataFrame => DataFrame): String = {
    val out = tmpDir(mod)
    names.foreach { n =>
      val df = spark.read.parquet(s"${sf()}/$n.parquet")
      (if (n == mod) f(df) else df)
        .write.mode("overwrite").parquet(s"$out/$n.parquet")
    }
    out
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  // ---- q101: gini sort key r<<31 + c ------------------------------------

  test("q101 gini key: custkey at 2^31-1 exact, 2^31 raises, r over 2^32 raises") {
    val q = SparkEntry.queries("q101_gini_index")
    val maxCust = spark.read.parquet(s"${sf()}/orders.parquet")
      .agg(max("o_custkey")).first().getLong(0)
    val pass = corpusWith(Seq("orders", "lineitem"), "orders")(
      _.withColumn("o_custkey", col("o_custkey") + lit((1L << 31) - 1 - maxCust)))
    // uniform custkey shift preserves the (r, c) total order exactly
    assert(rows(q(spark, pass)) == rows(q(spark, sf())))
    val over = corpusWith(Seq("orders", "lineitem"), "orders")(
      _.withColumn("o_custkey", col("o_custkey") + lit((1L << 31) - maxCust)))
    assertRaises("gini: key out of packing range")(q(spark, over).collect())
    val bigR = corpusWith(Seq("orders", "lineitem"), "lineitem")(
      _.withColumn("l_extendedprice", col("l_extendedprice") * lit(100000.0)))
    assertRaises("gini: key out of packing range")(q(spark, bigR).collect())
  }

  // ---- q120: decile key (cents+2^24)<<31 + c ------------------------------

  test("q120 decile key: custkey at 2^31-1 exact, 2^31 raises, cents at ±2^24 raise") {
    val q = SparkEntry.queries("q120_decile_binning")
    val cust = spark.read.parquet(s"${sf()}/customer.parquet")
    val maxCust = cust.agg(max("c_custkey")).first().getLong(0)
    val nCust = cust.count()
    val pass = corpusWith(Seq("customer"), "customer")(
      _.withColumn("c_custkey", col("c_custkey") + lit((1L << 31) - 1 - maxCust)))
    assert(rows(q(spark, pass)) == rows(q(spark, sf())))
    val over = corpusWith(Seq("customer"), "customer")(
      _.withColumn("c_custkey", col("c_custkey") + lit((1L << 31) - maxCust)))
    assertRaises("decile key out of packing range")(q(spark, over).collect())
    // cents boundary: (2^24-1) cents passes (bins still partition all rows)
    val centsOk = corpusWith(Seq("customer"), "customer")(
      _.withColumn("c_acctbal",
        when(col("c_custkey") === maxCust, lit(((1L << 24) - 1) / 100.0))
          .otherwise(col("c_acctbal"))))
    assert(q(spark, centsOk).agg(sum("cnt")).first().getLong(0) == nCust)
    val centsOver = corpusWith(Seq("customer"), "customer")(
      _.withColumn("c_acctbal",
        when(col("c_custkey") === maxCust, lit((1L << 24) / 100.0))
          .otherwise(col("c_acctbal"))))
    assertRaises("decile key out of packing range")(q(spark, centsOver).collect())
  }

  // ---- triangleCounts: deg<<42 | id, both dispatch paths -------------------

  test("triangle pack: ids at 2^42-1 count exactly on both paths; 2^42 raises") {
    val s = spark
    import s.implicits._
    val hi = 1L << 42
    val tri = Seq((hi - 3, hi - 2), (hi - 2, hi - 1), (hi - 3, hi - 1))
    val expected = Set((hi - 3, 1L), (hi - 2, 1L), (hi - 1, 1L))
    for (budget <- Seq(2000000L /* driver */, 0L /* distributed */)) {
      val got = GraphOps.triangleCounts(tri.toDF("src", "dst"),
          driverEdgeBudget = budget)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"budget=$budget")
      assertRaises("packing range")(
        GraphOps.triangleCounts(
          (tri :+ (hi, hi - 3)).toDF("src", "dst"),
          driverEdgeBudget = budget).collect())
    }
  }

  test("triangle pack: degree at 2^21 raises loudly (driver path)") {
    val s = spark
    import s.implicits._
    // star graph: center degree 2^21 — one past the 21-bit degree field
    val star = s.range(1L << 21).select(lit(0L).as("src"),
      (col("id") + 1L).as("dst"))
    assertRaises("packing range")(
      GraphOps.triangleCounts(star, driverEdgeBudget = 1L << 22).collect())
  }

  // ---- jaccardPairs: id<<20 + n -------------------------------------------

  test("jaccardPairs id encode: 2^43-1 pairs exactly; 2^43 and negative raise") {
    val s = spark
    import s.implicits._
    val idCap = 1L << 43
    val texts = Seq("a b c d e", "a b c d f", "x y z w v")
    def corpus(ids: Seq[Long]): DataFrame = ids.zip(texts).toDF("id", "text")
    val small = Dedup.jaccardPairs(corpus(Seq(0L, 1L, 2L)), "id", "text")
      .select("inter", "na", "nb").collect().map(_.toString).sorted
    val big = Dedup.jaccardPairs(
        corpus(Seq(idCap - 3, idCap - 2, idCap - 1)), "id", "text")
      .select("inter", "na", "nb").collect().map(_.toString).sorted
    assert(big.sameElements(small) && big.nonEmpty)
    assertRaises("id out of 2^43 range")(
      Dedup.jaccardPairs(corpus(Seq(idCap - 2, idCap, 2L)), "id", "text")
        .collect())
    assertRaises("id out of 2^43 range")(
      Dedup.jaccardPairs(corpus(Seq(-1L, 1L, 2L)), "id", "text").collect())
  }

  // ---- zOrderKey / quantize --------------------------------------------------

  test("zOrderKey matches an independent interleave reference at domain edges") {
    val s = spark
    import s.implicits._
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { b =>
        (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
      }.sum
    val edge = (1L << 16) - 1
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (edge, edge), (edge, 0L),
      (12345L, 54321L), (edge, 1L))
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zOrderKey(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z == ref(x, y, 16), s"($x,$y)") }
    // quantize contract: the top of the domain lands in the LAST bucket,
    // never at 2^bits (which would alias into the next key's low bit)
    val q = Seq((edge, edge), (0L, edge), (edge / 2, edge)).toDF("v", "vmax")
      .select(Layout.quantize(col("v"), col("vmax")).as("b"))
      .collect().map(_.getLong(0))
    assert(q(0) == (1L << 16) - 1 && q(1) == 0L && q(2) < (1L << 16))
  }
}
