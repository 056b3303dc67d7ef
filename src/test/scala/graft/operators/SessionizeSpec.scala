package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long, sec: Long = 0): Timestamp =
    new Timestamp(min * 60000L + sec * 1000L)

  // user 1: events at 0, 10, 20 min (one session), then 60, 65 (second
  // session; 40 min gap); user 2: single event
  private lazy val events = Seq(
    (1L, 1L, ts(0)), (2L, 1L, ts(10)), (3L, 1L, ts(20)),
    (4L, 1L, ts(60)), (5L, 1L, ts(65)),
    (6L, 2L, ts(5))
  ).toDF("event_id", "user_id", "t")

  private val gap30Min = 1800000000L

  test("byGap splits on gaps strictly greater than the threshold") {
    val got = Sessionize.byGap(events, Seq("user_id"), "t", "event_id", gap30Min)
      .select($"event_id", $"session_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L, 6L -> 1L))
  }

  test("a gap exactly equal to the threshold does NOT split") {
    val df = Seq((1L, 1L, ts(0)), (2L, 1L, ts(30))).toDF("event_id", "user_id", "t")
    val ids = Sessionize.byGap(df, Seq("user_id"), "t", "event_id", gap30Min)
      .select($"session_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("identical timestamps order by the tie-break, deterministically") {
    val df = Seq((2L, 1L, ts(0)), (1L, 1L, ts(0))).toDF("event_id", "user_id", "t")
    val got = Sessionize.byGap(df, Seq("user_id"), "t", "event_id", gap30Min)
      .select($"event_id", $"session_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("stats aggregates sessions to key grain with exact-microsecond durations") {
    val row = Sessionize.stats(events, Seq("user_id"), "t", "event_id", gap30Min)
      .filter($"user_id" === 1L)
      .select($"n_sessions", $"n_events", $"longest_session_us", $"total_session_us")
      .as[(Long, Long, Long, Long)].collect().head
    // session 1 spans 0..20 min = 1.2e9 us; session 2 spans 60..65 = 3e8 us
    assert(row == ((2L, 5L, 1200000000L, 1500000000L)))
  }

  test("single-event sessions have zero duration") {
    val row = Sessionize.stats(events, Seq("user_id"), "t", "event_id", gap30Min)
      .filter($"user_id" === 2L)
      .select($"n_sessions", $"n_events", $"longest_session_us")
      .as[(Long, Long, Long)].collect().head
    assert(row == ((1L, 1L, 0L)))
  }

  test("the two windows share one sort: a single Window exec in the plan") {
    val plan = Sessionize.byGap(events, Seq("user_id"), "t", "event_id", gap30Min)
      .queryExecution.executedPlan.toString
    val nSorts = "Sort ".r.findAllIn(plan).size
    assert(nSorts <= 1, s"expected the shared (key, order) frame to plan one sort:\n$plan")
  }
}
