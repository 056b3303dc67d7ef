package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental connected components == full recompute, on both dispatch
  * paths, with label stability for untouched components.
  */
class IncrementalCcSpec extends SparkSpec {

  private def pairs(ps: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    ps.toSeq.toDF("da", "db")
  }

  private def labelMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("incremental fold equals full recompute (random graphs, both paths)") {
    (0 until 6).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val all = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter(p => p._1 != p._2)
      val (e1, e2) = all.splitAt(all.length / 2)
      Seq(2000000L, 0L).foreach { budget => // driver path, distributed path
        val full = labelMap(ConnectedComponents.assign(
          pairs(all: _*), driverEdgeBudget = budget))
        val prev = ConnectedComponents.assign(
          pairs(e1: _*), driverEdgeBudget = budget)
        val inc = labelMap(ConnectedComponents.incrementalAssign(
          prev, pairs(e2: _*), driverEdgeBudget = budget))
        assert(inc == full, s"seed=$seed budget=$budget")
      }
    }
  }

  test("untouched components keep their labels; merges take the min id") {
    // batch 1: {1,2,3} comp 1; {10,11} comp 10; batch 2 merges {10,11}
    // with {20,21} and leaves {1,2,3} alone
    val prev = ConnectedComponents.assign(pairs(1L -> 2L, 2L -> 3L, 10L -> 11L))
    val inc = labelMap(ConnectedComponents.incrementalAssign(
      prev, pairs(11L -> 20L, 20L -> 21L)))
    assert(inc(1L) == 1L && inc(2L) == 1L && inc(3L) == 1L)
    assert(inc(10L) == 10L && inc(11L) == 10L && inc(20L) == 10L &&
      inc(21L) == 10L)
  }

  test("edgeless singletons in the prior labeling pass through") {
    val s = spark
    import s.implicits._
    val prev = Seq((1L, 1L), (2L, 2L), (5L, 5L)).toDF("id", "comp")
    val inc = labelMap(ConnectedComponents.incrementalAssign(
      prev, pairs(2L -> 9L)))
    assert(inc == Map(1L -> 1L, 5L -> 5L, 2L -> 2L, 9L -> 2L))
  }
}
