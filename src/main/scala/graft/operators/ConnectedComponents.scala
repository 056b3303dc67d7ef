package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an undirected edge list — the
  * clustering step of near-duplicate deduplication: LSH/SimHash emit
  * near-dup PAIRS, but curation keeps one survivor per connected CLUSTER
  * (a~b and b~c must collapse a, b, c together even when a~c was never
  * emitted).
  *
  * Algorithm: iterative hash-min label propagation. Every vertex starts
  * labeled with its own id; each round every vertex takes the minimum of its
  * own label and its neighbors' labels. Converges to component = min vertex
  * id in O(component diameter) rounds — near-dup graphs are unions of small
  * dense clusters, so the diameter is tiny (2-4) regardless of corpus size.
  * Each round is two shuffles (join + aggregate) over (id, label) longs —
  * never over document content. Lineage is truncated every round with
  * `localCheckpoint` so the plan does not grow with iterations (the classic
  * iterative-Spark OOM). For adversarial long-path graphs the
  * large-star/small-star algorithm (Kiveris et al., "Connected Components in
  * MapReduce and Beyond") converges in O(log n) rounds; near-dup workloads
  * never need it, so we keep the simpler kernel and a maxIters guard.
  */
object ConnectedComponents {

  /** Component assignment for every vertex that appears in `edges`
    * (columns `da`, `db`): returns (id, component) with component = the
    * smallest vertex id reachable from `id`.
    */
  def assign(edges: DataFrame, maxIters: Int = 50): DataFrame = {
    val sym = edges
      .select(col("da").cast("long").as("src"), col("db").cast("long").as("dst"))
      .union(edges
        .select(col("db").cast("long").as("src"), col("da").cast("long").as("dst")))
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
  def clusters(edges: DataFrame, maxIters: Int = 50): DataFrame = {
    val lbl = assign(edges, maxIters)
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
