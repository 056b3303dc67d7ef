package graft.operators

import graft.SparkSpec

class EwmaSpec extends SparkSpec {

  test("matches the driver recurrence bit-exactly, resets at key boundaries") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val rows = for (k <- Seq("a", "b", "c"); i <- 0 until 50)
      yield (k, i.toLong, rnd.nextDouble() * 100)
    // shuffled input: the operator must not depend on arrival order
    val df = rnd.shuffle(rows).toDF("k", "i", "x")
    val got = Ewma.perKey(df, "k", "i", "x", alpha = 0.25)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    val expected = rows.groupBy(_._1).flatMap { case (k, series) =>
      series.sortBy(_._2).scanLeft(("", -1L, 0.0)) {
        case ((_, _, prev), (_, i, x)) =>
          (k, i, if (i == 0) x else 0.25 * x + 0.75 * prev)
      }.tail.map { case (kk, i, e) => (kk, i) -> e }
    }
    assert(got == expected)
  }

  test("alpha=1 reproduces the series; out-of-range alpha rejected") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 7.0)).toDF("k", "i", "x")
    val out = Ewma.perKey(df, "k", "i", "x", alpha = 1.0)
      .collect().map(_.getDouble(3)).sorted
    assert(out.toSeq == Seq(5.0, 7.0))
    intercept[IllegalArgumentException] {
      Ewma.perKey(df, "k", "i", "x", alpha = 0.0)
    }
  }
}
