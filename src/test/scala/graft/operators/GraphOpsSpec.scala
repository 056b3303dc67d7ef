package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {

  private def df(ps: Seq[(Long, Long)], a: String, b: String): DataFrame = {
    val s = spark
    import s.implicits._
    ps.toDF(a, b)
  }
  private def nodes(ns: Long*): DataFrame = {
    val s = spark
    import s.implicits._
    ns.toDF("node")
  }

  // star + path: 0→{1,2,3}, 3→4→5→6, plus an unreachable island 10→11
  private val directed =
    Seq((0L, 1L), (0L, 2L), (0L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (10L, 11L))

  test("bfsHops: hop distances from a single seed, bounded by maxHops") {
    val r = GraphOps.bfsHops(df(directed, "src", "dst"), nodes(0L), maxHops = 3)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r == Map(0L -> 0, 1L -> 1, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3))
  }

  test("bfsHops: multi-source takes the minimum over seeds") {
    val r = GraphOps.bfsHops(df(directed, "src", "dst"), nodes(0L, 5L), maxHops = 4)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r(6L) == 1 && r(5L) == 0 && r(4L) == 2 && r(0L) == 0)
    assert(!r.contains(10L) && !r.contains(11L))
  }

  test("bfsHops: driver and distributed paths agree on a random graph") {
    val rnd = new scala.util.Random(7)
    val es = Seq.fill(400)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(e => e._1 != e._2)
    val seeds = nodes(1L, 2L, 3L)
    val driver = GraphOps.bfsHops(df(es, "src", "dst"), seeds, maxHops = 5)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    val dist = GraphOps.bfsHops(df(es, "src", "dst"), seeds, maxHops = 5,
        driverEdgeBudget = 0L)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(driver == dist)
  }

  test("pageRank: sink accumulates more rank than sources; dangling leaks") {
    // 1→3, 2→3: node 3 is the only sink; 1 and 2 get only the base share
    val r = GraphOps.pageRank(
        df(Seq((1L, 3L), (2L, 3L)), "src", "dst"), nodes(1L, 2L, 3L), iters = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val base = (15L * GraphOps.RankScale) / (100L * 3)
    assert(r(1L) == base && r(2L) == base)
    assert(r(3L) > r(1L))
    // one damped step from the converged state reproduces the fixed point
    assert(r(3L) == base + (85L * (r(1L) / 1 + r(2L) / 1)) / 100L)
  }

  test("pageRank: driver and distributed paths are bit-identical") {
    val rnd = new scala.util.Random(11)
    val es = Seq.fill(600)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(e => e._1 != e._2).distinct
    val uni = nodes((0L until 80L): _*)
    val driver = GraphOps.pageRank(df(es, "src", "dst"), uni, iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val dist = GraphOps.pageRank(df(es, "src", "dst"), uni, iters = 5,
        driverEdgeBudget = 0L)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(driver == dist)
  }

  test("pageRank: edges outside the node universe are dropped on both paths") {
    val es = Seq((1L, 2L), (2L, 99L), (99L, 1L)) // 99 not in universe
    val uni = nodes(1L, 2L)
    val driver = GraphOps.pageRank(df(es, "src", "dst"), uni, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val dist = GraphOps.pageRank(df(es, "src", "dst"), uni, iters = 3,
        driverEdgeBudget = 0L)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(driver == dist && driver.keySet == Set(1L, 2L))
  }

  private def triMap(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.triangleCounts(df(edges, "src", "dst"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap

  test("triangleCounts: K4 — four triangles, every node in three") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val r = triMap(k4)
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: triangle-free graphs yield no rows") {
    assert(triMap(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty) // path
    assert(triMap((1L to 6L).map(i => (0L, i))).isEmpty)      // star
  }

  test("triangleCounts: wheel graph — hub in all five, rim nodes in two") {
    val star = (1L to 5L).map(i => (0L, i))
    val rim = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L))
    val r = triMap(star ++ rim)
    assert(r(0L) == 5L && (1L to 5L).forall(r(_) == 2L))
  }

  test("triangleCounts: random graph matches brute-force enumeration") {
    val rnd = new scala.util.Random(11)
    val es = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct
    val eset = es.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val brute = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      k <- (j + 1) until nodes.size
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if eset((a, b)) && eset((b, c)) && eset((a, c))
    } { brute(a) += 1; brute(b) += 1; brute(c) += 1 }
    assert(triMap(es) == brute.toMap)
    assert(brute.nonEmpty, "random graph should contain triangles")
    // distributed path (budget 0) agrees with the driver path exactly
    val dist = GraphOps.triangleCounts(df(es, "src", "dst"), driverEdgeBudget = 0L)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(dist == brute.toMap)
  }
}
