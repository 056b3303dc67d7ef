package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class DriftStreamsSpec extends SparkSpec {

  private def ts(sec: Int): Timestamp = new Timestamp(sec * 1000L)

  test("streaming windows score drift vs a reference; shifted window flags") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // reference distribution: uniform-ish 0..99
    val rnd = new scala.util.Random(1)
    val reference = DriftStreams.referenceSketch(
      (1 to 2000).map(_ => rnd.nextInt(100).toDouble).toDF("value"), "value")

    val input = MemoryStream[(Timestamp, Double)]
    val events = input.toDF().toDF("ts", "value")
    val q = DriftStreams
      .windowedSketches(events, "value", "10 seconds", "5 seconds")
      .writeStream.format("memory").queryName("drift_sketches")
      .outputMode("append").start()

    // window [0,10): same distribution as the reference (no drift);
    // window [10,20): shifted by +500 (certain drift)
    val same = (1 to 500).map(i => (ts(1 + i % 8), rnd.nextInt(100).toDouble))
    val shifted = (1 to 500).map(i => (ts(11 + i % 8), 500.0 + rnd.nextInt(100)))
    input.addData(same ++ shifted: _*)
    q.processAllAvailable()
    input.addData((ts(60), 1.0)) // advance watermark, close both windows
    q.processAllAvailable()
    q.stop()

    val drifts = DriftStreams.evaluate(s.table("drift_sketches"), reference)
    assert(drifts.map(_.n) == Seq(500L, 500L))
    val Seq(w0, w1) = drifts
    assert(!w0.drifted, s"same-distribution window flagged: $w0")
    assert(w1.drifted && w1.ksStat > 0.9, s"shifted window not flagged: $w1")

    // unified semantics: the same operator over a batch frame agrees
    val batch = DriftStreams.windowedSketches(
      (same ++ shifted).toDF("ts", "value"), "value", "10 seconds", "5 seconds")
    val batchDrifts = DriftStreams.evaluate(batch, reference)
    assert(batchDrifts.map(d => (d.windowStart, d.n, d.drifted)) ==
      drifts.map(d => (d.windowStart, d.n, d.drifted)))
  }
}
