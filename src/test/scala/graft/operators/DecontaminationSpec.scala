package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private val benchmark = Seq(
    "the quick brown fox jumps over the lazy dog",
    "to be or not to be that is the question"
  ).toDF("question")

  private val corpus = Seq(
    // verbatim benchmark leak
    (1L, "the quick brown fox jumps over the lazy dog"),
    // partial overlap: shares the 3-gram "quick brown fox"
    (2L, "a quick brown fox appeared in the garden yesterday evening"),
    // clean
    (3L, "completely unrelated text about distributed query engines here"),
    // short doc, no 3-grams
    (4L, "hi there")
  ).toDF("doc_id", "text")

  test("report flags verbatim and partial leaks, not clean docs") {
    val r = Decontamination.report(corpus, benchmark, "doc_id", "text",
      "question", n = 3, minHits = 1L)
      .orderBy($"doc_id").collect()
    val byId = r.map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(byId(1L).getAs[Boolean]("contaminated"))
    assert(byId(1L).getAs[Double]("containment") == 1.0)
    assert(byId(2L).getAs[Boolean]("contaminated"))
    val c2 = byId(2L).getAs[Double]("containment")
    assert(c2 > 0.0 && c2 < 0.5, s"partial leak containment $c2")
    assert(!byId(3L).getAs[Boolean]("contaminated"))
    assert(byId(3L).getAs[Long]("n_hits") == 0L)
    assert(!byId(4L).getAs[Boolean]("contaminated"))
    assert(byId(4L).getAs[Double]("containment") == 0.0)
  }

  test("clean() drops exactly the contaminated rows") {
    val kept = Decontamination.clean(corpus, benchmark, "doc_id", "text",
      "question", n = 3).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(3L, 4L))
  }

  test("minHits raises the bar: a one-shingle brush is not contamination") {
    val r = Decontamination.report(corpus, benchmark, "doc_id", "text",
      "question", n = 3, minHits = 3L)
      .filter($"contaminated").select("doc_id").as[Long].collect().sorted
    // doc 2 shares only one 3-gram; doc 1 shares all of them
    assert(r.toSeq == Seq(1L))
  }

  test("corpus side stays shuffle-free: benchmark broadcasts") {
    val plan = Decontamination.report(corpus, benchmark, "doc_id", "text",
      "question").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "benchmark side not broadcast")
  }
}
