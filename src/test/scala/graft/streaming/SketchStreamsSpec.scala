package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class SketchStreamsSpec extends SparkSpec {

  private def ts(sec: Int): Timestamp = new Timestamp(sec * 1000L)

  test("windowed heavy hitters: per-window top-k, exact in-capacity, " +
      "stream == batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // window [0,10): a:5 b:3 c:1; window [10,20): c:4 a:2
    val w0 = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val w1 = Seq.fill(4)("c") ++ Seq.fill(2)("a")
    val rows = w0.zipWithIndex.map { case (it, i) => (ts(1 + i % 8), it) } ++
      w1.zipWithIndex.map { case (it, i) => (ts(11 + i % 8), it) }

    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "item")
    val q = SketchStreams
      .windowedHeavyHitters(events, "item", "10 seconds", "5 seconds",
        k = 2, capacity = 16)
      .writeStream.format("memory").queryName("hh_windows")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    input.addData((ts(60), "zz")) // advance watermark, close both windows
    q.processAllAvailable()
    q.stop()

    val got = s.table("hh_windows")
      .select($"window_start", $"rank", $"item", $"cnt", $"err")
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(r => (r._1.getTime, r._2))
    // capacity >= vocabulary: counts exact, err 0
    assert(got.toSeq == Seq(
      (ts(0), 1L, "a", 5L, 0L), (ts(0), 2L, "b", 3L, 0L),
      (ts(10), 1L, "c", 4L, 0L), (ts(10), 2L, "a", 2L, 0L)))

    // unified semantics: identical plan over the batch frame agrees
    val batch = SketchStreams.windowedHeavyHitters(
        rows.toDF("ts", "item"), "item", "10 seconds", "5 seconds",
        k = 2, capacity = 16)
      .select($"window_start", $"rank", $"item", $"cnt", $"err")
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(r => (r._1.getTime, r._2))
    assert(batch.toSeq == got.toSeq)
  }

  test("windowed quantiles: per-window KLL medians, stream == batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val rnd = new scala.util.Random(3)
    // window [0,10): values 0..99; window [10,20): values 1000..1099
    val rows = (1 to 300).map(i =>
      (ts(1 + i % 8), rnd.nextInt(100).toDouble)) ++
      (1 to 300).map(i => (ts(11 + i % 8), 1000.0 + rnd.nextInt(100)))

    val input = MemoryStream[(Timestamp, Double)]
    val events = input.toDF().toDF("ts", "value")
    val q = SketchStreams
      .windowedQuantiles(events, "value", "10 seconds", "5 seconds",
        qs = Seq("p50" -> 0.5))
      .writeStream.format("memory").queryName("kll_windows")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    input.addData((ts(60), 0.0))
    q.processAllAvailable()
    q.stop()

    val got = s.table("kll_windows")
      .select($"window_start", $"p50").collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1)))
      .sortBy(_._1.getTime)
    assert(got.map(_._1).toSeq == Seq(ts(0), ts(10)))
    assert(got(0)._2 >= 30 && got(0)._2 <= 70, s"w0 median off: ${got(0)}")
    assert(got(1)._2 >= 1030 && got(1)._2 <= 1070, s"w1 median off: ${got(1)}")

    val batch = SketchStreams.windowedQuantiles(
        rows.toDF("ts", "value"), "value", "10 seconds", "5 seconds",
        qs = Seq("p50" -> 0.5))
      .select($"window_start", $"p50").collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1)))
      .sortBy(_._1.getTime)
    assert(batch.toSeq == got.toSeq)
  }
}
