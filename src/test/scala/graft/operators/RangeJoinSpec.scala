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
      (1L, 11L, ts(5), "b"),   // same band (0), within 10s of id 10
      (1L, 12L, ts(38), "c"),  // band 3
      (1L, 13L, ts(41), "d"),  // band 4: within 10s of id 12 ACROSS bands
      (1L, 14L, ts(75), "e"),  // band 7; id order opposes time order vs 15
      (1L, 15L, ts(69), "f"),  // band 6: pairs with 14 across bands, id_a=14>ts order
      (2L, 20L, ts(0), "g"),   // different user: never pairs with user 1
      (2L, 21L, ts(9), "h")
    ).toDF("user_id", "event_id", "ts", "tag")
    val got = RangeJoin.pairsWithin(df, Seq("user_id"), "ts", "event_id",
      toleranceMicros = 10L * 1000000, payload = Seq("tag"))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 11L), (12L, 13L), (14L, 15L), (20L, 21L)))
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
