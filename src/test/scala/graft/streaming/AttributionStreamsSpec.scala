package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.AttributionStreams.TouchEvent

class AttributionStreamsSpec extends SparkSpec {

  private def ts(sec: Int): Timestamp = new Timestamp(sec * 1000L)

  test("streaming last-touch: credits within lookback, direct otherwise, across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[TouchEvent]
    val q = AttributionStreams.lastTouch(input.toDS(), lookbackMs = 60000L)
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()

    // batch 1: u1 ad then purchase (credited); u2 purchase with no touch
    // (direct); u3 email touch only
    input.addData(
      TouchEvent(1L, 1L, ts(10), "ad"), TouchEvent(1L, 2L, ts(20), "purchase"),
      TouchEvent(2L, 3L, ts(20), "purchase"),
      TouchEvent(3L, 4L, ts(30), "email"))
    q.processAllAvailable()
    // batch 2: u3 purchase credits the CROSS-BATCH email touch; u1's second
    // purchase still credits the batch-1 ad (purchases never clear state);
    // u4 purchase beyond any touch -> direct
    input.addData(
      TouchEvent(3L, 5L, ts(50), "purchase"),
      TouchEvent(1L, 6L, ts(60), "purchase"),
      TouchEvent(4L, 7L, ts(60), "purchase"))
    q.processAllAvailable()
    // batch 3: u3's touch is now OUTSIDE the 60 s lookback -> direct; a new
    // ad touch then refreshes and the next purchase credits it
    input.addData(
      TouchEvent(3L, 8L, ts(120), "purchase"),
      TouchEvent(3L, 9L, ts(130), "ad"), TouchEvent(3L, 10L, ts(140), "purchase"))
    q.processAllAvailable()
    q.stop()

    val out = s.table("attr_out").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("touch")).toMap
    assert(out == Map(2L -> "ad", 3L -> "direct", 5L -> "email", 6L -> "ad",
      7L -> "direct", 8L -> "direct", 10L -> "ad"))
  }

  test("in-batch ordering is event time: purchase before its own batch's later touch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[TouchEvent]
    val q = AttributionStreams.lastTouch(input.toDS(), lookbackMs = 60000L)
      .writeStream.format("memory").queryName("attr_order")
      .outputMode("append").start()
    // delivered out of order inside ONE batch: the purchase at t=20 must
    // see only the t=10 ad, not the t=30 email
    input.addData(
      TouchEvent(1L, 3L, ts(30), "email"),
      TouchEvent(1L, 2L, ts(20), "purchase"),
      TouchEvent(1L, 1L, ts(10), "ad"))
    q.processAllAvailable()
    q.stop()
    val out = s.table("attr_order").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("touch")).toMap
    assert(out == Map(2L -> "ad"))
  }

  test("streaming attributions match the batch q114 window computation") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rnd = new scala.util.Random(5)
    val types = Seq("ad", "email", "purchase", "view", "purchase")
    val events = (1 to 300).map { i =>
      TouchEvent(rnd.nextInt(12).toLong, i.toLong, ts(rnd.nextInt(500)),
        types(rnd.nextInt(types.size)))
    }

    val input = MemoryStream[TouchEvent]
    val q = AttributionStreams.lastTouch(input.toDS(), lookbackMs = 120000L)
      .writeStream.format("memory").queryName("attr_eq")
      .outputMode("append").start()
    // split into 3 batches along EVENT TIME (the stream's ingestion-order
    // contract); ties on the boundary stay in one batch via event_id order
    val ordered = events.sortBy(e => (e.ts.getTime, e.event_id))
    ordered.grouped(100).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()

    // batch replay of the q114 window logic over the same rows
    val w = Window.partitionBy($"user_id").orderBy($"tms", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = events.toDF()
      .withColumn("tms", $"ts".cast("long") * 1000L)
      .withColumn("touch_type",
        last(when($"event_type" =!= "purchase", $"event_type"), true).over(w))
      .withColumn("touch_ms",
        last(when($"event_type" =!= "purchase", $"tms"), true).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id",
        when($"touch_ms".isNotNull && $"tms" - $"touch_ms" <= 120000L,
          $"touch_type").otherwise("direct").as("touch"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = s.table("attr_eq").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("touch")).toMap
    assert(got == expected)
    assert(got.values.exists(_ != "direct") && got.values.exists(_ == "direct"))
  }
}
