package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def ts(sec: Int) = new Timestamp(sec * 1000L)

  private lazy val frames = {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, ts(10), 100.0), // matches right at ts 5
      (1L, ts(20), 200.0), // matches right at ts 20 (inclusive equality)
      (2L, ts(10), 300.0), // no prior right row for user 2
      (3L, ts(10), 400.0)  // user 3 has no right rows at all
    ).toDF("user_id", "ts", "lv")
    val right = Seq(
      (1L, ts(5), 50.0),
      (1L, ts(20), 60.0),
      (1L, ts(30), 70.0), // later than every left row: never matched
      (2L, ts(15), 80.0)  // after user 2's left row
    ).toDF("user_id", "ts", "rv")
    (left, right)
  }

  test("inner as-of join matches latest prior right row, inclusive") {
    val (left, right) = frames
    val got = AsOfJoin.latestPrior(left, right, Seq("user_id"), "ts", Seq("rv"))
      .select("user_id", "lv", "rv")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 100.0, 50.0), (1L, 200.0, 60.0)))
  }

  test("forward as-of matches earliest following right row, inclusive") {
    val (left, right) = frames
    val got = AsOfJoin.earliestAfter(left, right, Seq("user_id"), "ts", Seq("rv"))
      .select("user_id", "lv", "rv")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    // left(1, t10) -> right(1, t20); left(1, t20) -> right(1, t20) inclusive;
    // left(2, t10) -> right(2, t15); user 3 unmatched
    assert(got == Set((1L, 100.0, 60.0), (1L, 200.0, 60.0), (2L, 300.0, 80.0)))
  }

  test("forward outer variant keeps lefts after the last right row") {
    val (left, right) = frames
    val got = AsOfJoin.earliestAfter(left, right, Seq("user_id"), "ts", Seq("rv"),
      inner = false)
      .select("user_id", "lv", "rv")
      .collect().map(r => (r.getLong(0), r.getDouble(1), Option(r.get(2)))).toSet
    assert(got == Set(
      (1L, 100.0, Some(60.0)), (1L, 200.0, Some(60.0)),
      (2L, 300.0, Some(80.0)), (3L, 400.0, None)))
  }

  test("outer variant keeps unmatched left rows with null payload") {
    val (left, right) = frames
    val got = AsOfJoin.latestPrior(left, right, Seq("user_id"), "ts", Seq("rv"),
      inner = false)
      .select("user_id", "lv", "rv")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        Option(r.get(2)))).toSet
    assert(got == Set(
      (1L, 100.0, Some(50.0)), (1L, 200.0, Some(60.0)),
      (2L, 300.0, None), (3L, 400.0, None)))
  }
}
