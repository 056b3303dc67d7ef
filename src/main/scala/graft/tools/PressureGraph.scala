package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Pressure test for the distributed graph paths (the regime the gated SFs
  * never reach — their edge lists stay under the driver budget): a ~4M-edge
  * synthetic graph with communities, long chains and hub stars, driven
  * through distributed BFS and distributed fixed-point PageRank with the
  * driver budget forced to 0, then checked EXACTLY against the driver
  * implementations on the same edges (hard assertion, not a print).
  * Prints a summary block for PRESSURE.md.
  */
object PressureGraph {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(cores = 32, appName = "pressure-graph")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // deterministic generator: 200k nodes; per node, edges to
    //  - its community neighbours (communities of 50, ring + chords)
    //  - a chain successor (long-diameter stress for BFS frontiers)
    //  - a hub (skew stress: node n links hub n % 37)
    val n = 300000L
    val nodes = spark.range(n).select($"id".as("node"))
    val ring = spark.range(n).select($"id".as("src"),
      (($"id" / 50).cast("long") * 50 + ($"id" + 1) % 50).as("dst"))
    val chord = spark.range(n).select($"id".as("src"),
      (($"id" / 50).cast("long") * 50 + ($"id" * 7 + 13) % 50).as("dst"))
    val chain = spark.range(n - 1).select($"id".as("src"), ($"id" + 1).as("dst"))
    // sparse hub links (every 97th node) keep BFS hop distances graded —
    // most nodes reach a seed only through community rings and the chain
    val hubs = spark.range(n).filter($"id" % 97 === 0)
      .select($"id".as("src"), ($"id" % 37).as("dst"))
    val edges = ring.union(chord).union(chain).union(hubs)
      .filter($"src" =!= $"dst").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEdges = edges.count()
    println(s"pressure-graph: $nEdges edges over $n nodes")
    require(nEdges > 500000L, "graph too small to pressure the distributed path")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }

    // --- BFS: undirected walk (both directions) so the hub seeds reach the
    // whole graph in a few hops — frontier sizes in the 10^5 range
    val seeds = spark.range(37).select($"id".as("node"))
    val sym = edges.union(edges.select($"dst".as("src"), $"src".as("dst")))
    val distBfs = timed("distributed BFS (budget=0)")(
      GraphOps.bfsHops(sym, seeds, maxHops = 6, driverEdgeBudget = 0L)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap)
    val drvBfs = timed("driver BFS (ground truth)")(
      GraphOps.bfsHops(sym, seeds, maxHops = 6)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap)
    require(distBfs == drvBfs,
      s"BFS mismatch: ${distBfs.size} vs ${drvBfs.size} labeled nodes")
    println(s"  BFS agreement: ${distBfs.size} labeled nodes, " +
      s"hop histogram ${distBfs.values.groupBy(identity).view.mapValues(_.size).toMap.toSeq.sorted}")

    // --- PageRank: 5 damped fixed-point iterations -------------------------
    val distPr = timed("distributed PageRank (budget=0)")(
      GraphOps.pageRank(edges, nodes, iters = 5, driverEdgeBudget = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val drvPr = timed("driver PageRank (ground truth)")(
      GraphOps.pageRank(edges, nodes, iters = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    require(distPr == drvPr, "PageRank fixed-point mismatch")
    val top = distPr.toSeq.sortBy(-_._2).take(3)
    println(s"  PageRank agreement: ${distPr.size} nodes bit-identical; " +
      s"top ranks $top")
    spark.stop()
  }
}
