package graft.queries

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.TemporalStreams

/** Streaming operators under the BATCH oracle gate (round 8): the same
  * DuckDB SQL that gates the batch SCD2 operator (q95) gates the
  * `flatMapGroupsWithState` implementation here — the stream's closed
  * versions come out of the append-mode sink, the OPEN version per key is
  * read back from the checkpoint's state store via Spark's state data
  * source (`spark.read.format("statestore")`), and their union must be
  * row-identical to the batch window plan. Cross-batch incrementality is
  * real: the event log is fed through a MemoryStream in multiple
  * micro-batches, so every version that spans a batch boundary exercises
  * the state fold, not the in-batch sort.
  *
  * Harness note: the driver's gate calls a (SparkSession, dir) => DataFrame
  * builder, so the event drip is driver-side by necessity (collect +
  * MemoryStream — the same shape every Structured Streaming test harness
  * uses). The OPERATOR under test never sees driver state: it reads an
  * unbounded Dataset and keeps three scalars per key. In production the
  * same plan runs off Kafka with the identical checkpoint/state layout the
  * gate reads back here.
  */
object StreamGate {

  /** Same oracle text as q95 (Temporal.scala) — the point of the gate: one
    * SQL, two engines, two execution models (batch window vs incremental
    * state fold), three-way hash equality.
    */
  private val Scd2OracleSql =
    """WITH o AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id
      |                          ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |m AS (
      |  SELECT user_id, event_type, ts_us,
      |    CAST(sum(CASE WHEN prev IS NULL OR prev <> event_type
      |             THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
      |  FROM o),
      |g AS (
      |  SELECT user_id, version, min(event_type) AS state,
      |         min(ts_us) AS valid_from
      |  FROM m GROUP BY 1, 2)
      |SELECT user_id, state, valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
      |    AS valid_to,
      |  version
      |FROM g ORDER BY user_id, version""".stripMargin

  private val q130 = QueryDef.sql(
    "streaming SCD2 (flatMapGroupsWithState + state-store readback) vs the batch oracle")(
    Scd2OracleSql) { (s, dir) =>
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // event drip: global (ts, event_id) order sliced into micro-batches
    // preserves the operator's per-key-ordered delivery contract
    val typed = Tables(s, dir).events
      .select($"user_id", $"event_type".as("state"),
        Tables.epochUs($"ts").as("ts_us"), $"event_id")
      .as[TemporalStreams.StateEvent]
      .collect()
      .sortBy(e => (e.ts_us, e.event_id))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scd2-gate-")
    val sink = "scd2_gate_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val input = MemoryStream[TemporalStreams.StateEvent]
    val q = TemporalStreams.scd2(input.toDS())
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    try {
      typed.grouped(math.max(typed.length / 4, 1)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val closed = s.table(sink)
      .select($"user_id", $"state", $"valid_from",
        $"valid_to".cast("long").as("valid_to"), $"version")
    // the open version per key, straight from the committed state store
    val open = s.read.format("statestore").load(ckpt.toString)
      .select($"key.value".as("user_id"),
        $"value.groupState.state".as("state"),
        $"value.groupState.validFrom".as("valid_from"),
        lit(null).cast("long").as("valid_to"),
        $"value.groupState.version".as("version"))
    // eager localCheckpoint pins the (bounded) result so the checkpoint
    // directory and the memory sink can be torn down before returning
    val out = closed.unionAll(open)
      .repartition(1).sortWithinPartitions($"user_id", $"version")
      .localCheckpoint()
    s.catalog.dropTempView(sink)
    deleteRecursively(ckpt.toFile)
    out
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q130_streaming_scd2" -> q130
  )
}
