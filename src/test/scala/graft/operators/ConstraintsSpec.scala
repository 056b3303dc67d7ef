package graft.operators

import graft.SparkSpec

class ConstraintsSpec extends SparkSpec {

  private lazy val df = {
    val s = spark
    import s.implicits._
    Seq(
      (Some(1L), 5.0, "A"),
      (Some(2L), -1.0, "B"),   // range + set violations
      (None, 3.0, "A"),        // null violation
      (Some(4L), 51.0, "R"),   // range violation
      (Some(4L), 5.0, "N")     // duplicate key
    ).toDF("k", "v", "f")
  }

  test("audit counts violations per check in one pass; nulls violate") {
    val r = Constraints.audit(df, Seq(
        Constraints.notNull("k"),
        Constraints.between("v", 0.0, 50.0),
        Constraints.isIn("f", Seq("A", "N", "R"))))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getInt(3))).toMap
    assert(r("not_null(k)") == ((1L, 5L, 0)))
    assert(r("between(v,0.0,50.0)") == ((2L, 5L, 0)))
    assert(r("in_set(f)") == ((1L, 5L, 0)))
  }

  test("unique reports duplicate keys; pass flips on a clean frame") {
    val dup = Constraints.unique(df, Seq("k")).head
    assert(dup.getLong(1) == 1L && dup.getInt(3) == 0)
    val clean = Constraints.unique(df, Seq("k", "v")).head
    assert(clean.getLong(1) == 0L && clean.getInt(3) == 1)
  }

  test("fused uniqueKeys match the standalone unique results in one pass") {
    val r = Constraints.audit(df, Seq(Constraints.notNull("k")),
        uniqueKeys = Seq(Seq("k"), Seq("k", "v")))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getInt(3))).toMap
    assert(r("unique(k)") == ((1L, 5L, 0)))
    assert(r("unique(k,v)") == ((0L, 5L, 1)))
    assert(r("not_null(k)") == ((1L, 5L, 0)))
  }

  test("all-green frame passes every check") {
    val r = Constraints.audit(df.filter("k = 1"),
        Seq(Constraints.notNull("k"), Constraints.matches("f", "[A-Z]")))
      .collect()
    assert(r.forall(_.getInt(3) == 1))
  }

  test("functional dependency: holding FD passes, broken FD quantified") {
    val s = spark
    import s.implicits._
    val t = Seq((1L, "a", 10), (1L, "a", 20), (2L, "b", 30), (3L, "a", 40),
      (3L, "c", 50)).toDF("k", "v", "x")
    // k -> v broken only at k=3 (a and c)
    val broken = Constraints.functionalDependency(t, Seq("k"), Seq("v"))
      .collect().head
    assert(broken.getLong(1) == 3L)      // n_keys
    assert(broken.getLong(2) == 1L)      // violating_keys
    assert(broken.getLong(3) == 2L)      // max_distinct
    assert(broken.getInt(5) == 0)        // pass
    // (k, v) -> k holds trivially
    val holds = Constraints.functionalDependency(t, Seq("k", "v"), Seq("k"))
      .collect().head
    assert(holds.getLong(2) == 0L && holds.getInt(5) == 1)
  }
}
