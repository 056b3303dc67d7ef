package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class TemporalOpsSpec extends SparkSpec {

  private def ev(rows: (Long, String, String, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq
      .map { case (u, st, ts, id) => (u, st, Timestamp.valueOf(ts), id) }
      .toDF("user_id", "state", "ts", "event_id")
  }

  test("scd2History collapses runs into versioned intervals") {
    // user 1: A A B A — three versions; user 2: single open version
    val df = ev(
      (1L, "A", "2024-01-01 00:00:00", 1L),
      (1L, "A", "2024-01-01 01:00:00", 2L),
      (1L, "B", "2024-01-01 02:00:00", 3L),
      (1L, "A", "2024-01-01 03:00:00", 4L),
      (2L, "X", "2024-01-01 00:30:00", 5L))
    val r = TemporalOps.scd2History(df, "user_id", "state", "ts", "event_id")
      .collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3), x.getLong(4)))
      .sortBy(x => (x._1, x._5))
    def us(s: String) = Timestamp.valueOf(s).getTime * 1000L
    assert(r.toSeq == Seq(
      (1L, "A", us("2024-01-01 00:00:00"), us("2024-01-01 02:00:00"), 1L),
      (1L, "B", us("2024-01-01 02:00:00"), us("2024-01-01 03:00:00"), 2L),
      (1L, "A", us("2024-01-01 03:00:00"), -1L, 3L),
      (2L, "X", us("2024-01-01 00:30:00"), -1L, 1L)))
  }

  test("scd2History ties on timestamp resolve by the tie column") {
    val df = ev(
      (1L, "B", "2024-01-01 00:00:00", 2L),
      (1L, "A", "2024-01-01 00:00:00", 1L))
    val r = TemporalOps.scd2History(df, "user_id", "state", "ts", "event_id")
      .collect().map(x => (x.getString(1), x.getLong(4))).sortBy(_._2)
    assert(r.toSeq == Seq(("A", 1L), ("B", 2L)))
  }

  test("intervalCoverage merges overlapping and counts islands") {
    // user 1: [0,10) [5,15) merge → 15; [100,110) separate
    val df = ev(
      (1L, "e", "2024-01-01 00:00:00", 1L),
      (1L, "e", "2024-01-01 00:00:05", 2L),
      (1L, "e", "2024-01-01 01:00:00", 3L))
    val r = TemporalOps.intervalCoverage(df, "user_id", "ts", durUs = 10000000L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq((1L, 2L, 25000000L, 15000000L)))
  }

  test("intervalCoverage: touching intervals merge (end == next start)") {
    val df = ev(
      (1L, "e", "2024-01-01 00:00:00", 1L),
      (1L, "e", "2024-01-01 00:00:10", 2L))
    val r = TemporalOps.intervalCoverage(df, "user_id", "ts", durUs = 10000000L)
      .collect().map(x => (x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((1L, 20000000L)))
  }

  test("streaks finds the longest run, earliest on ties") {
    // user 1: days 1,2,3 (run of 3), 5,6 (run of 2); user 2: 1,2 and 4,5 (tie → earliest)
    val df = ev(
      (1L, "e", "2024-01-01 10:00:00", 1L),
      (1L, "e", "2024-01-02 10:00:00", 2L),
      (1L, "e", "2024-01-02 11:00:00", 3L), // same day twice — distinct-day dedup
      (1L, "e", "2024-01-03 10:00:00", 4L),
      (1L, "e", "2024-01-05 10:00:00", 5L),
      (1L, "e", "2024-01-06 10:00:00", 6L),
      (2L, "e", "2024-01-01 10:00:00", 7L),
      (2L, "e", "2024-01-02 10:00:00", 8L),
      (2L, "e", "2024-01-04 10:00:00", 9L),
      (2L, "e", "2024-01-05 10:00:00", 10L))
    val r = TemporalOps.streaks(df, "user_id", "ts")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDate(2).toString))
      .sortBy(_._1)
    assert(r.toSeq == Seq(
      (1L, 3L, "2024-01-01"), (2L, 2L, "2024-01-01")))
  }
}
