package graft.operators

import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an undirected edge list — the
  * clustering step of near-duplicate deduplication: LSH/SimHash emit
  * near-dup PAIRS, but curation keeps one survivor per connected CLUSTER
  * (a~b and b~c must collapse a, b, c together even when a~c was never
  * emitted).
  *
  * Adaptive dispatch (same shape as DistributedQuantiles' group-count
  * guard): the edge list of a near-dup graph is orders of magnitude smaller
  * than the corpus — |pairs| at the usual thresholds is ~0.1-1% of |docs|.
  * Up to `driverEdgeBudget` edges (default 2M ≈ 32 MB of longs) a driver
  * union-find resolves components in milliseconds where the iterative job
  * pays per-round scheduling; above it, distributed hash-min label
  * propagation takes over. Both paths return the identical frame
  * (component = min vertex id; ConnectedComponentsSpec pins equality), and
  * the dispatch is logged.
  *
  * The distributed path: every vertex starts labeled with its own id; each
  * round takes the min of its own and its neighbors' labels — converging in
  * O(component diameter) rounds (near-dup graphs are unions of small dense
  * clusters, diameter 2-4 at any corpus size). Each round is two shuffles
  * of (long, long) labels — never document content — and lineage is
  * truncated per round with `localCheckpoint` so the plan does not grow
  * with iterations. For adversarial long-path graphs the
  * large-star/small-star algorithm (Kiveris et al., "Connected Components
  * in MapReduce and Beyond") converges in O(log n) rounds; near-dup
  * workloads never need it, so we keep the simpler kernel and a maxIters
  * guard.
  */
object ConnectedComponents extends Logging {

  /** Component assignment for every vertex that appears in `edges`
    * (columns `da`, `db`): returns (id, component) with component = the
    * smallest vertex id reachable from `id`.
    */
  def assign(edges: DataFrame, maxIters: Int = 50,
      driverEdgeBudget: Long = 2000000L): DataFrame = {
    val e = edges
      .select(col("da").cast("long").as("da"), col("db").cast("long").as("db"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = e.count()
    val out =
      if (nEdges <= driverEdgeBudget) {
        logInfo(s"ConnectedComponents: $nEdges edges <= budget " +
          s"$driverEdgeBudget, driver union-find path")
        driverAssign(e)
      } else {
        logInfo(s"ConnectedComponents: $nEdges edges > budget " +
          s"$driverEdgeBudget, distributed label-propagation path")
        distributedAssign(e, maxIters)
      }
    e.unpersist()
    out
  }

  /** Driver path: union-find with path compression and union-by-min (the
    * smaller root becomes parent), so find() lands directly on the
    * component's minimum id.
    */
  private def driverAssign(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x // path compression
      while (c != r) { val nxt = parent.get(c); parent.put(c, r); c = nxt }
      r
    }
    e.collect().foreach { row =>
      val a = row.getLong(0); val b = row.getLong(1)
      parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val rows = parent.keySet().iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    while (rows.hasNext) { val v = rows.next(); buf += ((v, find(v))) }
    buf.toSeq.toDF("id", "comp")
  }

  /** Distributed path: iterative hash-min label propagation. */
  private def distributedAssign(e: DataFrame, maxIters: Int): DataFrame = {
    val sym = e.select(col("da").as("src"), col("db").as("dst"))
      .union(e.select(col("db").as("src"), col("da").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()

    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIters) {
      // min label among each vertex's neighbors, one shuffle each way
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("comp").as("ncomp")), "dst")
        .groupBy("src")
        .agg(min(col("ncomp")).as("nbr_min"))
        .select(col("src").as("id"), col("nbr_min"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("comp"),
          (coalesce(col("nbr_min"), col("comp")) < col("comp"))
            .cast("long").as("chg"))
        .localCheckpoint() // materializes: one action per round, bounded lineage
      changed = next.agg(sum(col("chg"))).head.getLong(0)
      labels = next.drop("chg")
      iter += 1
    }
    sym.unpersist()
    require(changed == 0L,
      s"connected components did not converge in $maxIters rounds")
    labels
  }

  /** Component assignment plus cluster size: (id, component, csize). */
  def clusters(edges: DataFrame, maxIters: Int = 50,
      driverEdgeBudget: Long = 2000000L): DataFrame = {
    val lbl = assign(edges, maxIters, driverEdgeBudget)
    val sizes = lbl.groupBy("comp").agg(count(lit(1)).as("csize"))
    lbl.join(sizes, "comp").select(col("id"), col("comp").as("component"), col("csize"))
  }

  /** Dedup survivors: every vertex in `edges` except the minimum id of each
    * component — the rows a cluster-level near-dup pass would DROP, as a
    * frame joinable against the corpus (anti-join to keep survivors).
    */
  def nonSurvivors(edges: DataFrame, maxIters: Int = 50): DataFrame =
    assign(edges, maxIters).filter(col("id") =!= col("comp")).select(col("id"))
}
