package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SubstringDedup

/** Daily-ingest integration: documents stream through `foreachBatch` into
  * the exactly-once sink, then each committed `batch=<id>` directory is
  * consumed IN ORDER by the incremental substring index — and the union of
  * the per-batch matches equals a one-shot run over the whole corpus.
  * This certifies the composition the operators individually promise:
  * the sink's batch partitioning is a valid incremental-consumption
  * boundary, and replaying from the sink (not from the live stream)
  * reproduces the incremental contract exactly.
  */
class IngestPipelineSpec extends SparkSpec {

  test("stream -> idempotent sink -> per-batch incremental index == one-shot") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val passage = (1 to 12).map(i => s"p$i").mkString(" ")
    def noise(tag: String) = (1 to 15).map(i => s"$tag$i").mkString(" ")
    // doc ids ascend across batches (the incremental == one-shot premise)
    val batches = Seq(
      Seq(1L -> (passage + " " + noise("a")), 2L -> noise("b")),
      Seq(3L -> (noise("c") + " " + passage), 4L -> noise("d")),
      Seq(5L -> (noise("e") + " " + passage)))

    val root = Files.createTempDirectory("graft-ingest").toString
    val sink = s"$root/sink"
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(IdempotentSink.intoPath(sink))
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    batches.foreach { b =>
      input.addData(b)
      q.processAllAvailable()
    }
    q.stop()

    // consume the sink's committed batch directories in batch order
    val committed = IdempotentSink.committedBatches(s, sink).get
    // partition-dir inference types batch=<id> as int; normalize
    val batchIds = committed.select($"batch".cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(batchIds.length == 3)
    val store = s"$root/substr_idx"
    var matches = Set.empty[(Long, Int, Long, Int)]
    batchIds.foreach { id =>
      matches ++= SubstringDedup.incrementalMatches(
          committed.filter($"batch" === id).select($"doc_id", $"text"),
          "doc_id", "text", store, minLen = 10)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    }

    val oneShot = SubstringDedup.incrementalMatches(
        batches.flatten.toDF("doc_id", "text"),
        "doc_id", "text", s"$root/substr_one", minLen = 10)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    assert(matches == oneShot && oneShot.nonEmpty)
    // docs 3 and 5 both match doc 1's planted passage
    assert(matches.exists(_._1 == 3L) && matches.exists(_._1 == 5L))
    assert(matches.forall(_._3 == 1L))
  }
}
