package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Bridge, SpaceSavingAgg}

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {

  private def hh(c: Column, capacity: Int): Column =
    Bridge.column(SpaceSavingAgg(Bridge.expression(c), capacity)
      .toAggregateExpression())

  private lazy val tokens: Seq[String] =
    Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(12)("c") ++
      Seq.fill(5)("d") ++ Seq.fill(2)("e") ++ Seq("f")

  private def toDf(xs: Seq[String], parts: Int) = {
    val s = spark
    import s.implicits._
    s.sparkContext.parallelize(xs, parts).toDF("t")
  }

  test("capacity above distinct count: exact counts, zero err, sorted") {
    val got = toDf(scala.util.Random.shuffle(tokens), 8)
      .agg(hh(col("t"), 64).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.item", "e.cnt", "e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 50L, 0L), ("b", 30L, 0L), ("c", 12L, 0L),
      ("d", 5L, 0L), ("e", 2L, 0L), ("f", 1L, 0L)))
  }

  test("multi-partition merge equals the single-partition exact result") {
    val single = toDf(tokens, 1).agg(hh(col("t"), 64)).head.getSeq[Any](0)
    val multi = toDf(tokens, 7).agg(hh(col("t"), 64)).head.getSeq[Any](0)
    assert(single == multi)
  }

  test("under capacity pressure: one-sided error bound holds, top item kept") {
    val got = toDf(tokens, 4)
      .agg(hh(col("t"), 3).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.item", "e.cnt", "e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val truth = tokens.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got.length == 3)
    // the dominant item must survive any eviction schedule
    assert(got.map(_._1).contains("a"))
    got.foreach { case (item, cnt, err) =>
      val t = truth(item)
      assert(cnt >= t, s"$item: est $cnt < true $t (must overcount)")
      assert(cnt - err <= t, s"$item: est-err ${cnt - err} > true $t")
    }
  }
}
