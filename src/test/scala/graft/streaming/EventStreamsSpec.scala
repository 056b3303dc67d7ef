package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {

  private def ts(sec: Int): Timestamp = new Timestamp(sec * 1000L)

  test("tumbling window with watermark drops late data and emits per-window counts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val q = EventStreams.tumblingCounts(events, "10 seconds", "5 seconds")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()

    // batch 1: two windows' worth of events (watermark after: 12-5=7)
    input.addData((ts(1), "click", 1.0), (ts(3), "click", 2.0),
      (ts(12), "view", 5.0))
    q.processAllAvailable()
    // batch 2: advance the watermark past window [0,10) (to 40-5=35), which
    // finalizes and emits it
    input.addData((ts(40), "click", 1.0))
    q.processAllAvailable()
    // batch 3: a LATE event for the already-finalized window [0,10) — must
    // be dropped (watermark 35 > window end 10)
    input.addData((ts(60), "view", 1.0), (ts(2), "click", 99.0))
    q.processAllAvailable()
    q.stop()

    val out = s.table("tumbling").collect()
      .map(r => (r.getAs[Timestamp]("window_start").getTime / 1000,
        r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Double]("sum_value")))
    // window [0,10) click: the late 99.0 event was dropped -> n=2, sum=3
    assert(out.contains((0L, "click", 2L, 3.0)))
    assert(out.contains((10L, "view", 1L, 5.0)))
  }

  test("streaming and batch give the same windowed aggregates (unified semantics)") {
    val s = spark
    import s.implicits._
    val batch = Seq((ts(1), "a", 1.0), (ts(9), "a", 2.0), (ts(11), "b", 3.0))
      .toDF("ts", "event_type", "value")
    val agg = EventStreams.tumblingCounts(batch, "10 seconds", "5 seconds")
      .orderBy("window_start", "event_type").collect()
      .map(r => (r.getAs[Timestamp]("window_start").getTime / 1000,
        r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(agg.toSeq == Seq((0L, "a", 2L, 3.0), (10L, "b", 1L, 3.0)))
  }

  test("sessionize closes a session after the inactivity gap") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val sessions = EventStreams.sessionize(input.toDS(), gapMs = 5000)

    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    // user 1: two bursts 20s apart -> first burst closes when second arrives
    input.addData(
      EventStreams.Event(1L, ts(1), 1.0),
      EventStreams.Event(1L, ts(3), 2.0))
    q.processAllAvailable()
    input.addData(EventStreams.Event(1L, ts(30), 7.0))
    q.processAllAvailable()
    q.stop()

    val out = s.table("sessions").as[EventStreams.Session].collect()
    assert(out.length == 1)
    val sess = out.head
    assert(sess.user_id == 1L)
    assert(sess.session_start == ts(1) && sess.session_end == ts(3))
    assert(sess.n_events == 2 && sess.sum_value == 3.0)
  }
}
