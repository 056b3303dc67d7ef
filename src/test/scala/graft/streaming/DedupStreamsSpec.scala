package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class DedupStreamsSpec extends SparkSpec {

  private def ts(sec: Int): Timestamp = new Timestamp(sec * 1000L)

  test("dedupForever keeps one row per distinct content across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = DedupStreams.dedupForever(docs, "text")
      .writeStream.format("memory").queryName("dedup_forever")
      .outputMode("append").start()

    input.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
    q.processAllAvailable()
    // cross-batch duplicate: "beta" again, plus a new doc
    input.addData((4L, "beta"), (5L, "gamma"))
    q.processAllAvailable()
    q.stop()

    val out = s.table("dedup_forever")
      .select($"text").as[String].collect().sorted
    assert(out.toSeq == Seq("alpha", "beta", "gamma"))
  }

  test("dedupWithinWatermark drops in-horizon dups, evicts old state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[(Timestamp, String)]
    val docs = input.toDF().toDF("ts", "text")
    val q = DedupStreams.dedupWithinWatermark(docs, "text", "ts", "10 seconds")
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").start()

    // duplicate within the horizon -> dropped
    input.addData((ts(1), "alpha"), (ts(2), "alpha"), (ts(3), "beta"))
    q.processAllAvailable()
    // advance event time far past the horizon, then repeat "alpha": its
    // state was evicted, so it re-admits (the documented trade)
    input.addData((ts(100), "closer"))
    q.processAllAvailable()
    input.addData((ts(101), "alpha"))
    q.processAllAvailable()
    q.stop()

    val texts = s.table("dedup_wm").select($"text").as[String].collect()
    assert(texts.count(_ == "alpha") == 2, s"got ${texts.toSeq}")
    assert(texts.count(_ == "beta") == 1)
  }

  test("unified semantics: the same operator dedups a batch frame") {
    val s = spark
    import s.implicits._
    val batch = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("doc_id", "text")
    val out = DedupStreams.dedupForever(batch, "text")
    assert(out.count() == 2)
  }
}
