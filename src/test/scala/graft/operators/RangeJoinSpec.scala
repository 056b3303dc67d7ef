package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  private def ts(sec: Int) = new Timestamp(sec * 1000L)

  test("pairsWithin finds exactly the in-tolerance pairs, once each") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, 10L, ts(0), "a"),
      (1L, 11L, ts(5), "b"),   // within 10s of id 10
      (1L, 12L, ts(30), "c"),  // not within 10s of anything earlier
      (1L, 13L, ts(39), "d"),  // within 10s of id 12 (crosses a band edge)
      (2L, 20L, ts(0), "e"),   // different user: never pairs with user 1
      (2L, 21L, ts(9), "f")
    ).toDF("user_id", "event_id", "ts", "tag")
    val got = RangeJoin.pairsWithin(df, Seq("user_id"), "ts", "event_id",
      toleranceMicros = 10L * 1000000, payload = Seq("tag"))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 11L), (12L, 13L), (20L, 21L)))
  }

  test("tolerance boundary is inclusive") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, 1L, ts(0), "x"),
      (1L, 2L, ts(10), "y") // exactly 10s apart
    ).toDF("user_id", "event_id", "ts", "tag")
    val got = RangeJoin.pairsWithin(df, Seq("user_id"), "ts", "event_id",
      toleranceMicros = 10L * 1000000, payload = Seq("tag"))
    assert(got.count() == 1)
  }
}
