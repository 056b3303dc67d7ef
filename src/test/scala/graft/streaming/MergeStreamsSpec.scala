package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.MergeStreams.{Change, TableRow}

class MergeStreamsSpec extends SparkSpec {

  /** Compact a changelog to the final table: keep each key's latest row,
    * drop tombstones.
    */
  private def compact(rows: Seq[TableRow]): Map[Long, String] =
    rows.groupBy(_.key).view
      .mapValues(_.maxBy(_.seq)).filter(!_._2.deleted)
      .mapValues(_.payload).toMap

  test("streaming CDC apply: upserts, tombstone-wins, stale seqs ignored") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Change]
    val q = MergeStreams.applyChanges(input.toDS())
      .writeStream.format("memory").queryName("cdc_apply")
      .outputMode("update").start()

    // batch 1: two inserts; k2 gets an in-batch update (only the final
    // current row per key per batch is emitted)
    input.addData(
      Change(1L, 10L, "U", "a1"),
      Change(2L, 10L, "U", "b1"), Change(2L, 11L, "U", "b2"))
    q.processAllAvailable()
    // batch 2: k1 deleted; a STALE update for k2 (seq 5 < 11) must not
    // regress the row; k3 inserted
    input.addData(
      Change(1L, 20L, "D", ""),
      Change(2L, 5L, "U", "stale"),
      Change(3L, 1L, "U", "c1"))
    q.processAllAvailable()
    // batch 3: an update for k1 with seq BELOW its tombstone is ignored
    // (delete-wins in log order); a newer one resurrects the key
    input.addData(
      Change(1L, 15L, "U", "ghost"),
      Change(1L, 30L, "U", "a2"))
    q.processAllAvailable()
    q.stop()

    val log = s.table("cdc_apply").as[TableRow].collect().toSeq
    // per-batch emission discipline: batch 2 emitted nothing for k2
    assert(!log.exists(r => r.key == 2L && r.payload == "stale"))
    assert(!log.exists(r => r.key == 1L && r.payload == "ghost"))
    assert(compact(log) == Map(1L -> "a2", 2L -> "b2", 3L -> "c1"))
  }

  test("any micro-batch slicing of a shuffled log compacts to the batch fold") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // a change log over 40 keys with interleaved updates + deletes,
    // delivered out of order
    val rng = new scala.util.Random(42)
    val log = rng.shuffle((1L to 200L).map { seq =>
      val key = 1L + (seq * 7) % 40
      Change(key, seq, if (seq % 11 == 0) "D" else "U", s"v$seq")
    })
    val expect = log.groupBy(_.key).view
      .mapValues(_.maxBy(_.seq)).filter(_._2.op != "D")
      .mapValues(_.payload).toMap

    val input = MemoryStream[Change]
    val q = MergeStreams.applyChanges(input.toDS())
      .writeStream.format("memory").queryName("cdc_slices")
      .outputMode("update").start()
    log.grouped(37).foreach { slice =>
      input.addData(slice: _*); q.processAllAvailable()
    }
    q.stop()
    val got = compact(s.table("cdc_slices").as[TableRow].collect().toSeq)
    assert(got == expect)
  }
}
