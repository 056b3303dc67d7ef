package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.FunnelStreams.FunnelEvent

class FunnelStreamsSpec extends SparkSpec {

  private def ts(sec: Int): Timestamp = new Timestamp(sec * 1000L)

  test("streaming funnel: converts once, within window, across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[FunnelEvent]
    val q = FunnelStreams.conversions(input.toDS(), "signup", "purchase",
        windowMs = 60000L)
      .writeStream.format("memory").queryName("funnel_conv")
      .outputMode("append").start()

    // batch 1: u1 signup; u2 purchase with NO prior signup; u3 signup+purchase
    // together in one batch (must convert — in-batch ordering is event time)
    input.addData(
      FunnelEvent(1L, ts(10), "signup"),
      FunnelEvent(2L, ts(10), "purchase"),
      FunnelEvent(3L, ts(10), "signup"), FunnelEvent(3L, ts(20), "purchase"))
    q.processAllAvailable()
    // batch 2: u1 converts ACROSS batches; u3 purchases again (no re-emit);
    // u4 signup
    input.addData(
      FunnelEvent(1L, ts(30), "purchase"),
      FunnelEvent(3L, ts(25), "purchase"),
      FunnelEvent(4L, ts(30), "signup"))
    q.processAllAvailable()
    // batch 3: u4's purchase lands OUTSIDE the 60 s window -> no conversion
    input.addData(FunnelEvent(4L, ts(100), "purchase"))
    q.processAllAvailable()
    q.stop()

    val out = s.table("funnel_conv").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("lag_ms"))).toSet
    assert(out == Set((3L, 10000L), (1L, 20000L)))
  }

  test("streaming conversions match the batch funnel operator") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val events = Seq(
      FunnelEvent(1L, ts(5), "signup"), FunnelEvent(1L, ts(50), "purchase"),
      FunnelEvent(2L, ts(5), "signup"), FunnelEvent(2L, ts(500), "purchase"),
      FunnelEvent(3L, ts(5), "view"))

    val input = MemoryStream[FunnelEvent]
    val q = FunnelStreams.conversions(input.toDS(), "signup", "purchase",
        windowMs = 60000L)
      .writeStream.format("memory").queryName("funnel_batch_eq")
      .outputMode("append").start()
    input.addData(events: _*)
    q.processAllAvailable(); q.stop()
    val streamed = s.table("funnel_batch_eq").collect()
      .map(_.getAs[Long]("user_id")).toSet

    val batch = graft.operators.Funnel.conversionByCohort(
        events.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", "signup", "purchase",
        windowMicros = 60000000L)
      .collect().map(r => r.getAs[Long]("n_converted")).sum
    assert(streamed == Set(1L) && batch == 1L)
  }
}
