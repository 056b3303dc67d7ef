package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  private def edges(ps: (Long, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    ps.toSeq.toDF("da", "db")
  }

  test("two chains and a singleton pair resolve to min-id components") {
    // 1-2-3 (path), 10-11, 20-21-22-23 (path needing propagation)
    val r = ConnectedComponents.assign(
        edges((1L, 2L), (2L, 3L), (10L, 11L), (21L, 20L), (21L, 22L), (23L, 22L)))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("long path converges (propagation beyond one hop per round works)") {
    val path = edges((1L to 12L).sliding(2).map(s => (s(1), s(0))).toSeq: _*)
    val r = ConnectedComponents.assign(path, driverEdgeBudget = 0L).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.values.toSet == Set(1L) && r.size == 12)
  }

  test("clusters carries component sizes") {
    val r = ConnectedComponents.clusters(edges((1L, 2L), (2L, 3L), (7L, 9L)))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(r == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (7L, 7L, 2L), (9L, 7L, 2L)))
  }

  test("driver and distributed paths return identical assignments") {
    val es = edges((1L, 2L), (2L, 3L), (10L, 11L), (21L, 20L), (21L, 22L),
      (23L, 22L), (5L, 6L), (6L, 7L), (7L, 8L), (8L, 9L))
    val driver = ConnectedComponents.assign(es)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val dist = ConnectedComponents.assign(es, driverEdgeBudget = 0L)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(driver == dist)
  }

  test("20k-edge graph: driver and distributed paths agree (dispatch proof)") {
    // 4000 clusters of 5 vertices (path-shaped, diameter 4) + 1000 isolated
    // pairs — the near-dup workload shape at scale
    val rnd = new scala.util.Random(13)
    val es = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    (0 until 4000).foreach { c =>
      val base = 10L + c * 10L
      val perm = rnd.shuffle((0 to 4).toList)
      perm.sliding(2).foreach {
        case Seq(a, b) => es += ((base + a, base + b))
        case _ => ()
      }
    }
    (0 until 1000).foreach { p =>
      es += ((100000L + p * 2, 100001L + p * 2))
    }
    val df = edges(rnd.shuffle(es.toSeq): _*)
    val driver = ConnectedComponents.assign(df)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val dist = ConnectedComponents.assign(df, driverEdgeBudget = 0L)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(driver.size == 4000 * 5 + 2000)
    assert(driver == dist)
    // every 5-cluster collapses to its base vertex; pairs to their even id
    assert(driver(84L) == 80L && driver(100001L) == 100000L)
  }

  test("10k-vertex path graph: two-phase escalation converges in O(log n) rounds") {
    // Adversarial shape for hash-min (diameter 10k ⇒ 10k rounds); the
    // escalated large-star/small-star path must converge in ~log2(n)
    // rounds. Run twoPhase directly to pin the round count, then the full
    // distributed dispatch (hash-min -> escalation) for end-to-end truth.
    val n = 10000L
    val s = spark
    import s.implicits._
    val pairEdges = (0L until n - 1).map(i => (i, i + 1))
    val raw = pairEdges.toDF("src", "dst")
    val (lbl, rounds) = ConnectedComponents.twoPhase(raw, maxRounds = 40)
    assert(rounds <= 30, s"expected O(log n) rounds, got $rounds") // log2(10k) ≈ 13.3
    val comps = lbl.select("comp").distinct().collect().map(_.getLong(0)).toSet
    assert(comps == Set(0L) && lbl.count() == n)

    val full = ConnectedComponents.assign(
        pairEdges.toDF("da", "db"), maxIters = 50, driverEdgeBudget = 0L)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(full.size == n && full.values.toSet == Set(0L))
  }

  test("nonSurvivors drops exactly the non-minimum vertices") {
    val r = ConnectedComponents.nonSurvivors(edges((1L, 2L), (2L, 3L), (7L, 9L)))
      .collect().map(_.getLong(0)).toSet
    assert(r == Set(2L, 3L, 9L))
  }
}
