package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class FunnelSpec extends SparkSpec {

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  /** day 1: u1 signs up, converts day 3; u2 signs up, converts day 20 (out
    * of window); u3 signs up, never purchases; u4 purchased BEFORE signup.
    * day 2: u5 signs up and converts same day.
    */
  private lazy val events: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "signup", ts(1)), (1L, "purchase", ts(3)),
      (2L, "signup", ts(1)), (2L, "purchase", ts(20)),
      (3L, "signup", ts(1)), (3L, "view", ts(2)),
      (4L, "purchase", ts(1, 1)), (4L, "signup", ts(1, 2)),
      (5L, "signup", ts(2)), (5L, "purchase", ts(2, 5)),
      (6L, "view", ts(1))
    ).toDF("user_id", "event_type", "ts")
  }

  test("conversionByCohort: window, ordering and never-converted handled") {
    val r = Funnel.conversionByCohort(events, "user_id", "ts", "event_type",
        "signup", "purchase", windowMicros = 7L * 86400000000L)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    val day1 = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000 / 86400
    // cohort day 1: u1 converts; u2 out of window; u3 never; u4 purchase
    // precedes signup (not a conversion) -> 1/4
    assert(r(day1) == ((4L, 1L, 0.25)))
    assert(r(day1 + 1) == ((1L, 1L, 1.0)))
    assert(r.size == 2) // u6 never signed up -> no cohort row
  }

  test("firstTouch keeps nulls for missing steps") {
    val ft = Funnel.firstTouch(events, "user_id", "ts", "event_type",
        "signup", "purchase")
      .collect().map(x => x.getLong(0) ->
        ((if (x.isNullAt(1)) None else Some(x.getLong(1))),
         (if (x.isNullAt(2)) None else Some(x.getLong(2))))).toMap
    assert(ft(3L)._2.isEmpty && ft(6L)._1.isEmpty && ft(1L)._1.nonEmpty)
  }

  test("weeklyRetention counts distinct actives per offset") {
    val s = spark
    import s.implicits._
    // u1 active weeks 0,1,3 (relative); u2 only week 0
    val ev = Seq(
      (1L, "view", ts(1)), (1L, "view", ts(10)), (1L, "view", ts(24)),
      (2L, "view", ts(2)), (2L, "view", ts(3))
    ).toDF("user_id", "event_type", "ts")
    val r = Funnel.weeklyRetention(ev, "user_id", "ts", horizon = 3)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toMap
    // both users' first events land in the same epoch week (Jan 1-3 2024
    // spans a week boundary? -> derive instead of hardcoding)
    assert(r.values.map(_._1).sum == 2) // every user counted at w0
    assert(r.values.map(v => v._2 + v._3 + v._4).sum == 2) // u1's weeks 1,3
  }
}
