package graft.core

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  test("native expressions are callable from spark.sql") {
    GraftFunctions.registerAll(spark)

    val cos = spark.sql(
      """SELECT cosine_sim(array(cast(1 as float), cast(0 as float)),
        |                  array(cast(1 as float), cast(0 as float))) AS c""".stripMargin)
      .first().getDouble(0)
    assert(cos == 1.0)

    val sh = spark.sql("SELECT word_shingles('a b c', 2) AS s")
      .first().getSeq[String](0)
    assert(sh.toList == List("a b", "b c"))

    val hits = spark.sql("SELECT text_hit_count('the cat the dog', 'the,a') AS h")
      .first().getInt(0)
    assert(hits == 2)

    val pairs = spark.sql(
      "SELECT pair_combinations(array(1L, 2L, 3L)) AS p")
      .first().getSeq[org.apache.spark.sql.Row](0)
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toList ==
      List((1L, 2L), (1L, 3L), (2L, 3L)))

    val sketch = spark.sql(
      """SELECT histogram_sketch(cast(v as double), 4) AS h
        |FROM VALUES (1),(2),(3),(10),(11),(12) AS t(v)""".stripMargin)
      .first().getSeq[org.apache.spark.sql.Row](0)
    assert(sketch.length <= 4)
    assert(sketch.map(_.getLong(1)).sum == 6L)

    val bh = spark.sql("SELECT byte_histogram(cast('aA' as binary)) AS h")
      .first().getSeq[Int](0)
    assert(bh.length == 16 && bh(6) == 1 && bh(4) == 1)

    val dfd = spark.sql(
      """SELECT dot_product_fd(array(cast(2 as float), cast(3 as float)),
        |                      array(cast(0.5 as double), cast(1 as double))) AS d""".stripMargin)
      .first().getDouble(0)
    assert(dfd == 4.0)

    // minhash_signature/simhash agree with the operator-level aggregates
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("gf_docs")
    // token hash = pmod(xxhash64, P), mirroring minHashSignatures' family
    val sqlSig = spark.sql(
      """SELECT minhash_signature(
        |  pmod(xxhash64(s), 2147483647), 64, 42) AS sig
        |FROM (SELECT explode(word_shingles(text, 3)) AS s FROM gf_docs)""".stripMargin)
      .first().getSeq[Long](0)
    val opSig = graft.operators.Dedup.minHashSignatures(
      graft.operators.Dedup.shingles(docs, "doc_id", "text", 3))
      .first().getSeq[Long](1)
    assert(sqlSig == opSig)

    val sqlSim = spark.sql(
      """SELECT simhash(
        |  cast(conv(substring(md5(cast(t as binary)), 1, 15), 16, 10) as bigint)) AS h
        |FROM (SELECT explode(split(text, ' ')) AS t FROM gf_docs)""".stripMargin)
      .first().getLong(0)
    val opSim = graft.operators.Dedup.simHash(docs, "doc_id", "text")
      .first().getLong(1)
    assert(sqlSim == opSim)

    // portable_sign_bits agrees with the operator-level fused projection
    val emb = Seq((0L, Array.tabulate(8)(i => (i - 3).toFloat)))
      .toDF("vec_id", "embedding")
    emb.createOrReplaceTempView("gf_emb")
    val sqlBits = spark.sql(
      "SELECT portable_sign_bits(embedding, 5, 8) AS b FROM gf_emb")
      .first().getLong(0)
    val opBits = emb.select(graft.operators.Ann.bucketIdPortable(
      org.apache.spark.sql.functions.col("embedding"),
      graft.operators.Ann.portableHyperplanes(8, 5)).as("b"))
      .first().getLong(0)
    assert(sqlBits == opBits)

    val mtf = spark.sql("SELECT max_token_freq('a b a c a b') AS m")
      .first().getInt(0)
    assert(mtf == 3)

    val hh = spark.sql(
      """SELECT heavy_hitters(t, 16) AS h
        |FROM VALUES ('a'),('a'),('b'),('a') AS t(t)""".stripMargin)
      .first().getSeq[org.apache.spark.sql.Row](0)
    assert(hh.map(r => (r.getString(0), r.getLong(1))).toList ==
      List(("a", 3L), ("b", 1L)))

    val kq = spark.sql(
      """SELECT kll_quantiles(cast(v as double), 64, '0.5') AS q
        |FROM VALUES (1),(2),(3),(4),(5) AS t(v)""".stripMargin)
      .first().getSeq[Double](0)
    assert(kq == Seq(3.0))

    val tk = spark.sql(
      """SELECT topk_by(cast(v as double), cast(i as bigint), 2) AS t
        |FROM VALUES (1.0, 1), (9.0, 2), (9.0, 3), (5.0, 4) AS t(v, i)""".stripMargin)
      .first().getSeq[org.apache.spark.sql.Row](0)
    assert(tk.map(r => (r.getDouble(0), r.getLong(1))).toList ==
      List((9.0, 2L), (9.0, 3L)))
  }
}
