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

  test("scd2Late: bounded out-of-order delivery equals the in-order fold") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val typed = graft.core.Tables(s, sf()).events
      .select($"user_id", $"event_type".as("state"),
        graft.core.Tables.epochUs($"ts").as("ts_us"), $"event_id")
      .as[TemporalStreams.StateEvent]
      .collect()
    // deterministic bounded reorder: deliver in (ts + jitter) order with
    // jitter < J, so an event can be preceded by others up to J later in
    // event time; lateness 2J covers every inversion the jitter can make
    val jUs = 600L * 1000 * 1000 // 10 min
    val latenessMs = 2 * jUs / 1000
    def jitter(e: TemporalStreams.StateEvent): Long =
      java.lang.Long.remainderUnsigned(e.event_id * 2654435761L, jUs)
    val perturbed = typed.sortBy(e => (e.ts_us + jitter(e), e.event_id))
    assert(perturbed.map(_.ts_us).sliding(2).exists(w => w(0) > w(1)),
      "perturbation must actually deliver out of ts order")
    // heartbeat rounds: each advances the watermark past the previous
    // round, so pending buffers drain batch by batch; every key's final
    // REAL version closes when round 1 folds
    val tMax = typed.map(_.ts_us).max
    val users = typed.map(_.user_id).distinct.sorted
    def hb(round: Int) = users.map(u => TemporalStreams.StateEvent(
      u, s"__hb$round", tMax + round * 20 * jUs, 1L << 40 | round.toLong))

    def run(name: String, late: Boolean,
        chunks: Seq[Seq[TemporalStreams.StateEvent]]): Set[(Long, String, Long, Long, Long)] = {
      val input = MemoryStream[TemporalStreams.StateEvent]
      val ds = if (late) TemporalStreams.scd2Late(input.toDS(), latenessMs)
        else TemporalStreams.scd2(input.toDS())
      val q = ds.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      chunks.foreach { c => input.addData(c.toIndexedSeq); q.processAllAvailable() }
      q.stop()
      s.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .filterNot(_._2.startsWith("__hb")).toSet
    }

    val hbRounds = (1 to 3).map(hb(_).toSeq)
    val inOrder = run("scd2_ref", late = false,
      typed.sortBy(e => (e.ts_us, e.event_id)).toSeq.grouped(
        math.max(typed.length / 5, 1)).toSeq ++ hbRounds)
    val lateRun = run("scd2_late", late = true,
      perturbed.toSeq.grouped(math.max(perturbed.length / 6, 1)).toSeq
        ++ hbRounds)
    assert(lateRun == inOrder)
    assert(inOrder.nonEmpty)
  }

  test("scd2Late: a straggler past the lateness horizon is dropped, " +
    "history never rewrites") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = 1000000000L
    val min = 60L * 1000 * 1000
    val input = MemoryStream[TemporalStreams.StateEvent]
    val q = TemporalStreams.scd2Late(input.toDS(), latenessMs = 1000L)
      .writeStream.format("memory").queryName("scd2_straggler")
      .outputMode("append").start()
    // in-horizon history: A then B for user 1
    input.addData(TemporalStreams.StateEvent(1L, "A", base, 1L),
      TemporalStreams.StateEvent(1L, "B", base + 10 * min, 2L))
    q.processAllAvailable()
    // advance the watermark far past both (heartbeats two rounds so the
    // fold actually runs over them)
    input.addData(TemporalStreams.StateEvent(1L, "__hb1", base + 100 * min, 3L))
    q.processAllAvailable()
    input.addData(TemporalStreams.StateEvent(1L, "__hb2", base + 200 * min, 4L))
    q.processAllAvailable()
    // straggler: state C between A and B, far below the watermark — if
    // applied it would rewrite A's closure (A->C->B, three versions)
    input.addData(TemporalStreams.StateEvent(1L, "C", base + 5 * min, 5L))
    q.processAllAvailable()
    input.addData(TemporalStreams.StateEvent(1L, "__hb3", base + 300 * min, 6L))
    q.processAllAvailable()
    q.stop()
    val rows = s.table("scd2_straggler").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .filterNot(_._1.startsWith("__hb")).toSet
    // exactly A closed by B and B closed by the first heartbeat — no C
    assert(rows == Set(
      ("A", base, base + 10 * min, 1L),
      ("B", base + 10 * min, base + 100 * min, 2L)))
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
