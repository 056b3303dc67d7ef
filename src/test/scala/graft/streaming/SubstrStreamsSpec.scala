package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SubstringDedup

class SubstrStreamsSpec extends SparkSpec {

  test("streaming passage matches equal batch repeated positions minus one " +
    "first sighting per hash, across micro-batch boundaries") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val docs = graft.core.Tables(s, sf()).documents
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().sortBy(_._1)

    // batch truth: every (id, i) whose hash occurs >= 2 times, minus the
    // (id, i)-minimal sighting per hash, pointed at that minimal sighting
    val grams = SubstringDedup.windowHashes(
        graft.core.Tables(s, sf()).documents, "doc_id", "text", 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byHash = grams.groupBy(_._3).filter(_._2.length >= 2)
    val expected = byHash.values.flatMap { occ =>
      val sorted = occ.sortBy(o => (o._1, o._2))
      val (fid, fi, _) = sorted.head
      sorted.tail.map { case (id, i, _) => (id, i, fid, fi) }
    }.toSet
    assert(expected.nonEmpty, "corpus has no repeated windows — test is vacuous")

    // stream the corpus in ascending-id chunks: arrival order == id order,
    // so the stream's first-sighting choice matches the batch argmin
    val input = MemoryStream[(Long, String)]
    val hits = SubstrStreams.windowHits(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text", 10)
    val q = SubstrStreams.matches(hits)
      .writeStream.format("memory").queryName("passage_matches")
      .outputMode("append").start()
    docs.grouped(math.max(docs.length / 3, 1)).foreach { chunk =>
      input.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()

    val streamed = s.table("passage_matches").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    assert(streamed == expected,
      s"streamed ${streamed.size} vs expected ${expected.size}; " +
        s"missing=${(expected -- streamed).take(3)} extra=${(streamed -- expected).take(3)}")
  }

  test("a passage arriving in a LATER batch matches the first sighting from " +
    "an earlier batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val passage = (1 to 12).map(i => s"w$i").mkString(" ")
    val filler = (1 to 15).map(i => s"f$i").mkString(" ")

    val input = MemoryStream[(Long, String)]
    val q = SubstrStreams.matches(SubstrStreams.windowHits(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text", 10))
      .writeStream.format("memory").queryName("cross_batch")
      .outputMode("append").start()
    input.addData((1L, passage)); q.processAllAvailable()
    input.addData((2L, filler)); q.processAllAvailable()
    input.addData((3L, passage)); q.processAllAvailable()
    q.stop()

    val rows = s.table("cross_batch").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    // doc 3 repeats doc 1's passage: windows 1..3 match (1, same pos)
    assert(rows == Set((3L, 1, 1L, 1), (3L, 2, 1L, 2), (3L, 3, 1L, 3)))
  }
}
