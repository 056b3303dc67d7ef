package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class Bm25Spec extends SparkSpec {

  private lazy val docs: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "spark spark spark engine"),
      (2L, "spark engine fast"),
      (3L, "engine room below deck"),
      (4L, "vector search with spark vectors")
    ).toDF("doc_id", "text")
  }

  /** Reference BM25 (rational idf) computed straight from the definition. */
  private def expected(term: String, tf: Map[Long, Long]): Map[Long, Double] = {
    val dls = Map(1L -> 4L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    val n = 4.0; val avgdl = 16.0 / 4.0
    val df = tf.values.count(_ > 0).toDouble
    val idf = (n - df + 0.5) / (df + 0.5)
    dls.map { case (id, dl) =>
      val t = tf.getOrElse(id, 0L).toDouble
      id -> idf * (t * 2.2) / (t + 1.2 * (1 - 0.75 + 0.75 * (dl / avgdl)))
    }
  }

  test("single-term scores match the closed-form definition") {
    val got = Bm25.scored(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val exp = expected("spark", Map(1L -> 3L, 2L -> 1L, 3L -> 0L, 4L -> 1L))
    exp.foreach { case (id, e) => assert(math.abs(got(id) - e) < 1e-12, s"doc $id") }
  }

  test("multi-term score is the sum of per-term contributions") {
    val one = Bm25.scored(docs, "doc_id", "text", Seq("spark")).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    val two = Bm25.scored(docs, "doc_id", "text", Seq("engine")).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    val both = Bm25.scored(docs, "doc_id", "text", Seq("spark", "engine")).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    both.foreach { case (id, s) =>
      assert(math.abs(s - (one(id) + two(id))) < 1e-12)
    }
  }

  test("topK orders by score desc then doc_id and limits") {
    val got = Bm25.topK(docs, "doc_id", "text", Seq("spark"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    // doc 1 has tf=3 (highest); docs 2 and 4 tie-break by score (dl differs)
    assert(got.head == 1L && got.size == 2)
  }

  test("term absent from the corpus contributes zero (no NaN/div-by-zero)") {
    val got = Bm25.scored(docs, "doc_id", "text", Seq("zzz"))
      .collect().map(r => r.getAs[Double]("score"))
    assert(got.forall(_ == 0.0))
  }
}
