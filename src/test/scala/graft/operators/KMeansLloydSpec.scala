package graft.operators

import graft.SparkSpec

class KMeansLloydSpec extends SparkSpec {

  private def df(vecs: Seq[Array[Float]]) = {
    val s = spark
    import s.implicits._
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
  }

  /** Shared-nothing driver replay of the exact grid/rational arithmetic. */
  private def replay(vecs: Seq[Array[Float]], dim: Int, k: Int,
      iters: Int): Map[Int, (Long, Double)] = {
    val q = vecs.map(_.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong))
    var cents: Seq[(Int, Array[Long], Long)] =
      (0 until k).map(i => (i, q(i), 1L))
    def assign(): Map[Int, Seq[Array[Long]]] = q.groupBy { v =>
      cents.map { case (id, s, n) =>
        val dot = v.zip(s).map { case (a, b) => a * b }.sum
        val ss = s.map(x => x * x).sum
        ((dot * -2L).toDouble / n.toDouble + ss.toDouble / (n.toDouble * n),
          id)
      }.min._2
    }
    for (_ <- 1 to iters) {
      cents = assign().toSeq.sortBy(_._1).map { case (id, members) =>
        val sums = (0 until dim).map(j => members.map(_(j)).sum).toArray
        (id, sums, members.size.toLong)
      }
    }
    assign().map { case (id, members) =>
      val sums = (0 until dim).map(j => members.map(_(j)).sum).toArray
      val svv = members.map(v => v.map(x => x * x).sum).sum
      val ss = sums.map(x => x * x).sum
      id -> (members.size.toLong,
        svv.toDouble - ss.toDouble / members.size)
    }
  }

  test("matches a shared-nothing driver replay bit-exactly") {
    val rnd = new scala.util.Random(42)
    val vecs = Seq.fill(200)(Array.fill(8)(rnd.nextFloat() - 0.5f))
    val got = KMeansLloyd.clusterStats(df(vecs), "vec_id", "embedding",
      dim = 8, k = 4, iters = 2).collect()
      .map(r => r.getAs[Int]("cluster") ->
        (r.getAs[Long]("n"), r.getAs[Double]("inertia"))).toMap
    assert(got == replay(vecs, 8, 4, 2))
  }

  test("empty cluster: duplicate seeds collapse to the lower id, labels stay original") {
    // seeds 0 and 1 identical: every tie breaks to cell 0, so cluster 1
    // empties after round 1 and the remaining rounds run on {0, 2}
    val base = Array.fill(4)(0.1f)
    val far = Array.fill(4)(0.9f)
    val vecs = Seq(base, base.clone(), far) ++
      Seq.fill(20)(base.clone()) ++ Seq.fill(20)(far.clone())
    val got = KMeansLloyd.clusterStats(df(vecs), "vec_id", "embedding",
      dim = 4, k = 3, iters = 2).collect()
      .map(r => r.getAs[Int]("cluster") -> r.getAs[Long]("n")).toMap
    assert(got.keySet == Set(0, 2))
    assert(got(0) == 22L && got(2) == 21L)
  }

  test("an extra Lloyd update never increases within-cluster inertia") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(300)(Array.fill(8)(rnd.nextFloat() - 0.5f))
    def total(iters: Int): Double =
      KMeansLloyd.clusterStats(df(vecs), "vec_id", "embedding",
        dim = 8, k = 4, iters = iters).collect()
        .map(_.getAs[Double]("inertia")).sum
    assert(total(2) <= total(1) + 1e-9)
  }
}
