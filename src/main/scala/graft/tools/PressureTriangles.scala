package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Pressure test for the DISTRIBUTED triangle path (the regime the gated
  * SFs never reach — their co-purchase graphs stay under the 2M-edge
  * driver budget): a ~2.2M-edge planted-clique graph whose per-node
  * triangle counts are known analytically, driven through the distributed
  * plan with the budget forced to 0 and checked EXACTLY — then
  * cross-checked against the driver path on the same edges (two
  * independent implementations, one closed-form truth).
  *
  * Construction: K cliques of size c (every node sits in C(c-1,2)
  * triangles) plus an identity vertex-matching between paired cliques.
  * The matching adds ZERO triangles: a triangle with one cross edge
  * (u_i^m, v_j^m) needs a second cross edge at the third vertex w, but w's
  * only cross edge leads to ITS OWN image vertex, which is u or v's — so
  * any such closure forces w to coincide with u, a contradiction. That
  * gives 2.16M in-clique edges whose wedge volume (~K·c³/6 ≈ 43M) is real
  * work for the adjacency-grouped kernel, with an exact expected answer.
  */
object PressureTriangles {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(cores = 32,
      appName = "pressure-triangles")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val K = 1200; val c = 60
    val perNode = (c - 1).toLong * (c - 2) / 2  // C(c-1, 2) = 1711
    // clique edges: for clique k, vertices k·c + {0..c-1}, all pairs
    val cliq = spark.range(K.toLong * c * c)
      .select(($"id" / (c * c)).cast("long").as("k"),
        (($"id" / c).cast("long") % c).as("i"), ($"id" % c).as("j"))
      .filter($"i" < $"j")
      .select(($"k" * c + $"i").as("src"), ($"k" * c + $"j").as("dst"))
    // identity matching between clique k and k + K/2
    val cross = spark.range(K.toLong / 2 * c)
      .select(($"id" / c).cast("long").as("k"), ($"id" % c).as("m"))
      .select(($"k" * c + $"m").as("src"),
        (($"k" + K / 2) * c + $"m").as("dst"))
    val edges = cliq.union(cross)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEdges = edges.count()
    println(s"PRESSURE triangles: $nEdges edges, ${K * c} nodes, " +
      s"expected $perNode triangles/node")
    require(nEdges > 2000000L, "graph too small to pressure the distributed path")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }

    val dist = timed("distributed triangleCounts") {
      GraphOps.triangleCounts(edges, driverEdgeBudget = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    require(dist.size == K * c, s"distributed: ${dist.size} nodes, want ${K * c}")
    require(dist.values.forall(_ == perNode),
      s"distributed: counts off — ${dist.values.toSet.take(5)} vs $perNode")
    println(s"PRESSURE distributed: ${dist.size} nodes all at $perNode — exact")

    val drv = timed("driver triangleCounts") {
      GraphOps.triangleCounts(edges, driverEdgeBudget = Long.MaxValue)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    require(drv == dist, "driver and distributed paths disagree")
    println(s"PRESSURE driver==distributed: ${drv.size} nodes — exact")
    spark.stop()
  }
}
