package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TemporalOps

class TemporalStreamsSpec extends SparkSpec {

  test("streaming SCD2 equals the batch operator's closed versions " +
    "across micro-batch boundaries") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // real corpus slice: sf0.001 events as (user, state, ts_us, event_id)
    val events = spark.read.parquet(s"${sf()}/events.parquet")
    val typed = graft.core.Tables(s, sf()).events
      .select($"user_id", $"event_type".as("state"),
        graft.core.Tables.epochUs($"ts").as("ts_us"), $"event_id")
      .as[TemporalStreams.StateEvent]
      .collect()
      // per-key order contract: feed in global (ts, event_id) order, split
      // into 5 micro-batches at arbitrary cut points
      .sortBy(e => (e.ts_us, e.event_id))

    val input = MemoryStream[TemporalStreams.StateEvent]
    val q = TemporalStreams.scd2(input.toDS())
      .writeStream.format("memory").queryName("scd2_stream")
      .outputMode("append").start()
    typed.grouped(math.max(typed.length / 5, 1)).foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()

    val streamed = s.table("scd2_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

    val batch = TemporalOps.scd2History(
        graft.core.Tables(s, sf()).events,
        "user_id", "event_type", "ts", "event_id")
      .filter($"valid_to".isNotNull) // open versions live in stream state
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

    assert(streamed == batch)
    assert(batch.nonEmpty)
    assert(events.count() > 0)
  }

  test("streaming interval islands equal the batch coverage aggregates " +
    "(sentinel flush)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val durUs = 300000000L
    val evs = graft.core.Tables(s, sf()).events
      .select($"user_id", graft.core.Tables.epochUs($"ts").as("ts_us"))
      .as[TemporalStreams.IntervalEvent]
      .collect().sortBy(_.ts_us)
    // a far-future sentinel per user flushes each open island so the
    // emitted set covers every real island exactly once (the sentinel's
    // own island stays in state)
    val sentinels = evs.map(_.user_id).distinct
      .map(u => TemporalStreams.IntervalEvent(u, evs.last.ts_us + (1L << 40)))

    val input = MemoryStream[TemporalStreams.IntervalEvent]
    val q = TemporalStreams.intervalIslands(input.toDS(), durUs)
      .writeStream.format("memory").queryName("islands")
      .outputMode("append").start()
    evs.grouped(math.max(evs.length / 4, 1)).foreach { chunk =>
      input.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    input.addData(sentinels.toIndexedSeq); q.processAllAvailable()
    q.stop()

    val streamed = s.table("islands").collect()
      .map(r => (r.getLong(0), r.getLong(4)))
      .groupBy(_._1)
      .map { case (u, xs) =>
        u -> (xs.length.toLong, xs.map(_._2).sum, xs.map(_._2).max) }

    val batch = TemporalOps.intervalCoverage(
        graft.core.Tables(s, sf()).events, "user_id", "ts", durUs)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("open version emits nothing until a later state closes it") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[TemporalStreams.StateEvent]
    val q = TemporalStreams.scd2(input.toDS())
      .writeStream.format("memory").queryName("scd2_open")
      .outputMode("append").start()
    input.addData(TemporalStreams.StateEvent(1L, "A", 100L, 1L))
    q.processAllAvailable()
    assert(s.table("scd2_open").count() == 0)
    input.addData(TemporalStreams.StateEvent(1L, "B", 200L, 2L))
    q.processAllAvailable()
    q.stop()
    val rows = s.table("scd2_open").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.toSeq == Seq((1L, "A", 100L, 200L, 1L)))
  }
}
