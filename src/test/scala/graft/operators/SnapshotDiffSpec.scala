package graft.operators

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {

  test("classifies added / removed / changed / unchanged per key") {
    val s = spark
    import s.implicits._
    val before = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
    ).toDF("k", "name", "bal")
    val after = Seq(
      (1L, "a", 10.0),   // unchanged
      (2L, "b", 25.0),   // changed (bal)
      (4L, "D", 40.0),   // changed (name)
      (5L, "e", 50.0)    // added; 3 removed
    ).toDF("k", "name", "bal")
    val got = Merge.snapshotDiff(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added"))
  }

  test("null-safe comparison: null == null is unchanged, null vs value is changed") {
    val s = spark
    import s.implicits._
    val before = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("k", "v")
    val after = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "v")
    val got = Merge.snapshotDiff(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("round-trips the CDC merge: diff statuses match the changeset") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val upserts = Seq((2L, "B"), (9L, "i")).toDF("k", "v")
    val deletes = Seq(Tuple1(3L)).toDF("k")
    val after = Merge.upsertDelete(base, upserts, deletes, "k")
    val got = Merge.snapshotDiff(base, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      9L -> "added"))
  }
}
