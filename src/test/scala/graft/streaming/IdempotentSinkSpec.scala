package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IdempotentSinkSpec extends SparkSpec {

  test("foreachBatch delivery is exactly-once across batch replays") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val out = Files.createTempDirectory("graft-idem").toString + "/sink"
    val input = MemoryStream[Long]
    val q = input.toDS().toDF("v")
      .writeStream
      .foreachBatch(IdempotentSink.intoPath(out))
      .option("checkpointLocation",
        Files.createTempDirectory("graft-idem-ck").toString)
      .start()
    input.addData(1L to 5L)
    q.processAllAvailable()
    input.addData(6L to 9L)
    q.processAllAvailable()
    q.stop()

    val read = IdempotentSink.committedBatches(s, out).get
    assert(read.select("v").collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 9L))
    assert(read.select("batch").distinct().count() == 2)

    // engine-style replay of an ALREADY-COMMITTED batch: same batchId,
    // same rows — must be a no-op, not a double write
    val replay = (1L to 5L).toDF("v")
    assert(!IdempotentSink.writeOnce(replay, 0L, out))
    assert(IdempotentSink.committedBatches(s, out).get.count() == 9)
  }

  test("a torn (uncommitted) batch directory is invisible and rewritable") {
    val s = spark
    import s.implicits._
    val out = Files.createTempDirectory("graft-idem2").toString + "/sink"
    assert(IdempotentSink.writeOnce((1L to 3L).toDF("v"), 0L, out))
    // simulate a crash between data write and marker: write batch 1's
    // files then delete its marker
    assert(IdempotentSink.writeOnce((4L to 6L).toDF("v"), 1L, out))
    val marker = new java.io.File(s"$out/batch=1/_COMMITTED")
    assert(marker.delete())
    // torn batch is invisible to readers
    assert(IdempotentSink.committedBatches(s, out).get
      .select("v").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    // replay of the crashed attempt rewrites and commits exactly once
    assert(IdempotentSink.writeOnce((4L to 6L).toDF("v"), 1L, out))
    assert(IdempotentSink.committedBatches(s, out).get
      .select("v").collect().map(_.getLong(0)).sorted.toSeq == (1L to 6L))
  }

  test("committed empty micro-batches do not break the read side") {
    val s = spark
    import s.implicits._
    val out = Files.createTempDirectory("graft-idem4").toString + "/sink"
    // only an empty batch committed: read is None (no data), not a throw
    assert(IdempotentSink.writeOnce(
      Seq.empty[Long].toDF("v").repartition(1).filter(lit(false)), 0L, out))
    val r0 = IdempotentSink.committedBatches(s, out)
    assert(r0.isEmpty || r0.get.count() == 0)
    // a later non-empty batch reads fine alongside it
    assert(IdempotentSink.writeOnce((1L to 3L).toDF("v"), 1L, out))
    assert(IdempotentSink.committedBatches(s, out).get
      .select("v").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("empty sink reads as None") {
    assert(IdempotentSink.committedBatches(spark,
      Files.createTempDirectory("graft-idem3").toString + "/never").isEmpty)
  }
}
