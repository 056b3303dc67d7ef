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
  * with iterations (each round's checkpoint RDD is unpersisted once the
  * next round materializes — storage stays O(1) in rounds).
  *
  * Adversarial long-path graphs would stall hash-min (O(diameter) rounds),
  * so after `HashMinEscalationRounds` unconverged rounds the loop escalates
  * to large-star/small-star alternation (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", public algorithm): O(log n) rounds
  * on ANY shape, seeded with the partially-propagated labels so hash-min
  * progress is kept. Near-dup graphs never trip the escalation; a 10k-edge
  * path graph converges in ~log2 rounds (ConnectedComponentsSpec).
  */
object ConnectedComponents extends Logging {

  /** Component assignment for every vertex that appears in `edges`
    * (columns `da`, `db`): returns (id, component) with component = the
    * smallest vertex id reachable from `id`.
    */
  def assign(edges: DataFrame, maxIters: Int = 50,
      driverEdgeBudget: Long = 2000000L): DataFrame = {
    // session-conf override of the dispatch budget: deployments size it to
    // their driver heap, and the fault gate pins it to 0 so the DISTRIBUTED
    // label rounds (the `cc` probe's surface) run even on gate-sized graphs
    val budget = edges.sparkSession.conf
      .getOption("spark.graft.cc.driverEdgeBudget").map(_.toLong)
      .getOrElse(driverEdgeBudget)
    val e = edges
      .select(col("da").cast("long").as("da"), col("db").cast("long").as("db"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = e.count()
    val out =
      if (nEdges <= budget) {
        logInfo(s"ConnectedComponents: $nEdges edges <= budget " +
          s"$budget, driver union-find path")
        driverAssign(e)
      } else {
        logInfo(s"ConnectedComponents: $nEdges edges > budget " +
          s"$budget, distributed label-propagation path")
        distributedAssign(e, maxIters)
      }
    e.unpersist()
    out
  }

  /** Incremental clustering: fold a NEW batch of near-dup pairs into an
    * existing (id, comp) labeling without re-running components over the
    * full historical edge set — the daily-ingest shape (each day's LSH pass
    * emits pairs between new docs and between new and old docs; the
    * historical pair list is long gone).
    *
    * Correctness reduction: each prior label (id, comp) is itself an edge
    * connecting the vertex to its component representative, and a
    * component's labels form a star that preserves exactly its
    * connectivity — so components over (label stars ∪ new pairs) equal
    * components over (all historical pairs ∪ new pairs). Labels stay
    * STABLE under growth: component ids are min vertex ids, so a component
    * untouched by new pairs keeps its id and merging components adopt the
    * min of the merged ids — downstream survivor choices only ever change
    * where a genuine merge happened.
    *
    * Scale shape: the input is one label row per historical vertex plus
    * the new pairs — O(corpus) rows of two longs, not O(all pairs ever) —
    * and the star topology makes hash-min converge in ~2 rounds on the
    * distributed path regardless of how long ingestion has been running.
    * Singleton components (id == comp, edgeless) pass through unchanged.
    */
  def incrementalAssign(prevLabels: DataFrame, newPairs: DataFrame,
      maxIters: Int = 50, driverEdgeBudget: Long = 2000000L): DataFrame = {
    val labelEdges = prevLabels
      .select(col("id").cast("long").as("da"), col("comp").cast("long").as("db"))
      .filter(col("da") =!= col("db"))
    val merged = assign(
      labelEdges.unionAll(newPairs.select(col("da"), col("db"))),
      maxIters, driverEdgeBudget)
    // edgeless singletons never appear in the edge list; carry them over
    val singletons = prevLabels
      .select(col("id").cast("long").as("id"), col("comp").cast("long").as("comp"))
      .filter(col("id") === col("comp"))
      .join(merged.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("comp"))
    merged.unionAll(singletons)
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

  /** Hash-min rounds before escalating to large-star/small-star: near-dup
    * graphs (diameter 2-4) converge well inside this; only adversarial
    * long-path shapes reach it.
    */
  val HashMinEscalationRounds = 8

  /** Distributed path: iterative hash-min label propagation, escalating to
    * two-phase star contraction if the graph turns out to be long-diameter.
    */
  private def distributedAssign(e: DataFrame, maxIters: Int): DataFrame = {
    val sym = e.select(col("da").as("src"), col("db").as("dst"))
      .union(e.select(col("db").as("src"), col("da").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()

    var iter = 0
    var changed = 1L
    val hashMinBudget = math.min(HashMinEscalationRounds, maxIters)
    while (changed > 0 && iter < hashMinBudget) {
      // min label among each vertex's neighbors, one shuffle each way
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("comp").as("ncomp")), "dst")
        .groupBy("src")
        .agg(min(col("ncomp")).as("nbr_min"))
        .select(col("src").as("id"), col("nbr_min"))
      // fault-gate injection point (scope "cc"): each label round's
      // checkpoint materialization runs under attempt-0 task retry
      val next = graft.fault.FaultInjection.probe(
        labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("comp"),
            (coalesce(col("nbr_min"), col("comp")) < col("comp"))
              .cast("long").as("chg")),
        "cc")
        .localCheckpoint() // materializes: one action per round, bounded lineage
      changed = next.agg(sum(col("chg"))).head.getLong(0)
      // the new round is materialized — release the previous round's
      // checkpoint RDD (localCheckpoint persists OUTSIDE the CacheManager,
      // so Dataset.unpersist can't; see Bridge.unpersistCheckpointed)
      org.apache.spark.sql.graft.Bridge.unpersistCheckpointed(labels)
      labels = next.drop("chg")
      iter += 1
    }
    val out = if (changed == 0L) labels
    else {
      // Long-diameter graph: hand off to O(log n) star contraction, seeding
      // with the label edges (id -> current comp) so propagated mins carry
      // over — connectivity is identical (labels only ever link vertices of
      // one component) and the partial stars shorten the remaining work.
      logInfo(s"ConnectedComponents: hash-min unconverged after $iter " +
        "rounds — escalating to large-star/small-star")
      val seed = sym.select(col("src"), col("dst"))
        .union(labels.select(col("id").as("src"), col("comp").as("dst")))
      val (lbl, rounds) = twoPhase(seed, maxIters - iter)
      org.apache.spark.sql.graft.Bridge.unpersistCheckpointed(labels)
      logInfo(s"ConnectedComponents: two-phase converged in $rounds rounds")
      lbl
    }
    sym.unpersist()
    out
  }

  /** Large-star/small-star alternation (Kiveris et al. 2014): repeatedly
    * (a) attach every vertex's larger neighbors to its neighborhood min,
    * (b) collapse each vertex's smaller neighbors onto their min — until
    * the edge set is a fixed point, i.e. a star forest with every child
    * pointing at its component minimum. O(log n) rounds on any graph, each
    * round two (long,long) aggregate+join shuffles; per-round
    * localCheckpoint with eager unpersist of the previous round, same
    * storage discipline as hash-min. Returns (labels, roundsUsed).
    */
  private[operators] def twoPhase(edges0: DataFrame,
      maxRounds: Int): (DataFrame, Int) = {
    // canonical parent-pointer orientation: child > parent
    var edges = edges0
      .select(greatest(col("src"), col("dst")).as("c"),
        least(col("src"), col("dst")).as("p"))
      .filter(col("c") =!= col("p"))
      .distinct()
      .localCheckpoint()
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      // LARGE-STAR over the symmetric neighborhood: for each u, link every
      // strictly-larger neighbor to m = min(N(u) ∪ {u}). Each undirected
      // edge is emitted from exactly one side (its smaller endpoint), so
      // the edge count never grows.
      val sym = edges.select(col("c").as("u"), col("p").as("v"))
        .union(edges.select(col("p").as("u"), col("c").as("v")))
      val mins = sym.groupBy("u")
        .agg(min(least(col("u"), col("v"))).as("m"))
      val ls = sym.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("c"), col("m").as("p"))
        .distinct()
      // SMALL-STAR over the oriented edges: for each child c, collapse its
      // parents onto mp = min parent — emit (c, mp) and (p, mp) for the
      // displaced parents. Orientation (child > parent) is preserved.
      val joined = ls.join(ls.groupBy("c").agg(min(col("p")).as("m")), "c")
      // fault-gate injection point (scope "cc"), as in the hash-min rounds
      val next = graft.fault.FaultInjection.probe(
        joined.select(col("c"), col("m").as("p"))
          .union(joined.filter(col("p") =!= col("m"))
            .select(col("p").as("c"), col("m").as("p")))
          .distinct(),
        "cc")
        .localCheckpoint()
      // fixed point = identical edge set (both sides distinct, so equal
      // counts + empty one-way difference suffices)
      done = next.count() == edges.count() &&
        next.join(edges, Seq("c", "p"), "left_anti").isEmpty
      org.apache.spark.sql.graft.Bridge.unpersistCheckpointed(edges)
      edges = next
      round += 1
    }
    require(done, s"two-phase connected components did not converge in " +
      s"$maxRounds rounds")
    // star forest: every child points at its component min; roots self-map
    val labels = edges.select(col("c").as("id"), col("p").as("comp"))
      .union(edges.select(col("p").as("id"), col("p").as("comp")))
      .distinct()
      .localCheckpoint()
    org.apache.spark.sql.graft.Bridge.unpersistCheckpointed(edges)
    (labels, round)
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
