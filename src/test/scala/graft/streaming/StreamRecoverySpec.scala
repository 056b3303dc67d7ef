package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stateful recovery across a checkpointed stop/restart (round 10): every
  * other streaming test either keeps one query alive for the whole drip or
  * restarts a STATELESS stream (ChurnStreamSpec's file discovery,
  * IdempotentSink's foreachBatch replay). This spec kills a
  * `flatMapGroupsWithState` job mid-stream and restarts it from the
  * checkpoint with a REAL file source (Memory sources cannot recover), so
  * the per-key version state must come back from the state store, not from
  * the JVM: closed versions emitted before the crash + closed versions
  * after the restart + the recovered open state must equal the batch SCD2
  * of the full log.
  */
class StreamRecoverySpec extends SparkSpec {

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }

  test("scd2 state survives stop + restart from checkpoint (file source)") {
    recoveryRoundTrip(provider = None)
  }

  test("scd2 recovery under the RocksDB state store — the at-scale backend") {
    // HDFS-backed state lives on the executor HEAP (every key resident, a
    // hard ceiling at 100 TB key cardinality); RocksDB spills to native
    // memtables + SST files and is the provider a production deployment
    // runs. Same contract, different engine underneath the checkpoint.
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try recoveryRoundTrip(provider = Some("rocksdb"))
    finally prev match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  private def recoveryRoundTrip(provider: Option[String]): Unit = {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory(
      s"graft-recover-${provider.getOrElse("hdfs")}-")
    val inDir = root.resolve("in"); Files.createDirectory(inDir)
    val ckpt = root.resolve("ckpt").toString
    try {
      val typed = graft.core.Tables(s, sf()).events
        .select($"user_id", $"event_type".as("state"),
          graft.core.Tables.epochUs($"ts").as("ts_us"), $"event_id")
        .as[TemporalStreams.StateEvent]
        .collect()
      // per-key ordered, cross-key interleaved chunks (the q130 drip), one
      // json file per chunk
      val byKey = typed.groupBy(_.user_id).toSeq.sortBy(_._1)
        .map { case (_, es) => es.sortBy(e => (e.ts_us, e.event_id)) }
      val chunks = (0 until 4).map { i =>
        byKey.flatMap(es => es.slice(i * es.length / 4, (i + 1) * es.length / 4))
      }
      def writeChunk(i: Int): Unit = {
        val lines = chunks(i).map(e =>
          s"""{"user_id":${e.user_id},"state":"${e.state}",""" +
            s""""ts_us":${e.ts_us},"event_id":${e.event_id}}""")
        val p = Files.write(inDir.resolve(s"chunk_$i.json"),
          lines.mkString("\n").getBytes("UTF-8"))
        // FileStreamSource orders batches by file mtime; back-to-back writes
        // land in the same millisecond and the tie scrambles chunk order,
        // breaking the per-key-ordered delivery contract — stamp each chunk
        // one second apart so batch order IS chunk order
        Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 1000L))
        ()
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("state",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ts_us",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType)))
      // memory sinks refuse checkpoint recovery; the FILE sink is the one
      // production sink with exactly-once recovery, so the closures land in
      // a parquet dir whose manifest the restart must extend, not duplicate
      val outDir = root.resolve("out").toString
      def startQuery() = TemporalStreams.scd2(
        s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .json(inDir.toString).as[TemporalStreams.StateEvent])
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      def readClosed(): Set[(Long, String, Long, Long, Long)] =
        s.read.parquet(outDir).collect()
          .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("state"),
            r.getAs[Long]("valid_from"), r.getAs[Long]("valid_to"),
            r.getAs[Long]("version"))).toSet

      // phase 1: two chunks, then STOP — the "crash"
      writeChunk(0); writeChunk(1)
      val q1 = startQuery()
      q1.processAllAvailable(); q1.stop()
      val closed1 = readClosed()

      // phase 2: two more chunks land while down; restart SAME checkpoint
      writeChunk(2); writeChunk(3)
      val q2 = startQuery()
      q2.processAllAvailable(); q2.stop()
      // post-restart emissions only — the restart must NOT re-emit anything
      // phase 1 already closed (the file-sink manifest guards duplicates)
      val all2 = readClosed()
      val closed2 = all2 -- closed1
      assert(closed1.subsetOf(all2),
        "restart dropped phase-1 closures from the sink manifest")

      val open = s.read.format("statestore").load(ckpt)
        .select($"key.value".as("user_id"),
          $"value.groupState.state".as("state"),
          $"value.groupState.validFrom".as("valid_from"),
          $"value.groupState.version".as("version"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), -1L,
          r.getLong(3)))

      // ground truth: batch SCD2 fold of the full log (open valid_to -> -1)
      val expected = typed.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e.ts_us, e.event_id))
        val versions = Seq.newBuilder[(Long, String, Long, Long, Long)]
        var cur: Option[(String, Long, Long)] = None
        sorted.foreach { e =>
          cur match {
            case None => cur = Some((e.state, e.ts_us, 1L))
            case Some((st, from, v)) if st != e.state =>
              versions += ((u, st, from, e.ts_us, v))
              cur = Some((e.state, e.ts_us, v + 1))
            case _ => ()
          }
        }
        cur.foreach { case (st, from, v) => versions += ((u, st, from, -1L, v)) }
        versions.result()
      }.toSet
      val got = closed1 ++ closed2 ++ open.toSet
      assert(got == expected,
        s"recovered fold diverges: missing ${expected -- got}, " +
          s"extra ${got -- expected}")
      assert(closed1.nonEmpty && closed2.nonEmpty,
        "both phases must contribute closures for the test to mean anything")
    } finally deleteRecursively(root.toFile)
  }
}
