package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{GraphOps, SetSimilarity}

/** Iterative graph surface (round 7): multi-source BFS hop distance,
  * fixed-point PageRank, and a prefix-filtered set-similarity join — the
  * three graph/pairwise shapes a curation pipeline needs beyond component
  * labeling (lineage walks over derived-from graphs, importance ranking of
  * interlinked sources, and high-threshold near-dup joins whose candidate
  * generation indexes only a fraction of each document).
  *
  * Scale notes: both iterative operators shuffle only (long, long) rows per
  * round with per-round `localCheckpoint` lineage truncation and dispatch
  * adaptively between a driver fast-path (edge list under budget) and the
  * distributed iteration (GraphOps scaladoc); the set-similarity join's
  * inverted index carries only each document's rarest-prefix shingles
  * (1 − τ of the set, the PPJoin prefix-filter bound) instead of every
  * shingle, with zero recall loss at the threshold.
  */
object Graphs {

  /** BFS hop distance over the customer order-succession graph: orders of
    * one customer form a path in (o_orderdate, o_orderkey) order; seeds are
    * the urgent orders; output is the count of orders at each minimum hop
    * distance ≤ 6 (undirected walk). The oracle replays the walk with a
    * recursive CTE.
    */
  private val q92 = QueryDef.sql(
    "multi-source BFS: orders by hop distance from urgent orders")(
    """WITH RECURSIVE ordered AS (
      |  SELECT o_orderkey, o_custkey,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders),
      |e0 AS (
      |  SELECT a.o_orderkey AS src, b.o_orderkey AS dst
      |  FROM ordered a JOIN ordered b
      |    ON a.o_custkey = b.o_custkey AND b.rn = a.rn + 1),
      |edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      |seeds AS (SELECT o_orderkey AS node FROM orders
      |          WHERE o_orderpriority = '1-URGENT'),
      |walk AS (
      |  SELECT node, 0 AS hop FROM seeds
      |  UNION
      |  SELECT e.dst AS node, w.hop + 1 AS hop
      |  FROM walk w JOIN edges e ON e.src = w.node
      |  WHERE w.hop < 6)
      |SELECT hop, count(*) AS cnt
      |FROM (SELECT node, min(hop) AS hop FROM walk GROUP BY node)
      |GROUP BY hop ORDER BY hop""".stripMargin) { (s, dir) =>
    import s.implicits._
    val t = Tables(s, dir)
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    // successor edges ride the ONE exchange by custkey: lead() instead of a
    // rn/rn+1 self-join
    val e0 = t.orders
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
      .withColumn("nxt", lead($"o_orderkey", 1).over(w))
      .filter($"nxt".isNotNull)
      .select($"o_orderkey".as("src"), $"nxt".as("dst"))
    val edges = e0.union(e0.select($"dst".as("src"), $"src".as("dst")))
    val seeds = t.orders.filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey".as("node"))
    GraphOps.bfsHops(edges, seeds, maxHops = 6)
      .groupBy($"hop").agg(count(lit(1)).as("cnt"))
      .select($"hop".cast("long"), $"cnt")
      .smallOrdered($"hop")
  }

  /** Fixed-point PageRank over the co-purchase graph of urgent orders:
    * directed edges low→high partkey within an order, 5 damped iterations
    * in scaled-long arithmetic (GraphOps.RankScale) — exact, partitioning-
    * invariant, and replayed by the oracle as 5 unrolled materialized CTE
    * steps with identical integer division.
    */
  private val q93 = QueryDef.sql(
    "fixed-point PageRank over the urgent-order co-purchase part graph")(
    PageRankOracle.sql(iters = 5)) { (s, dir) =>
    import s.implicits._
    val t = Tables(s, dir)
    val urg = t.lineitem
      .join(t.orders.filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey"), $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_partkey")
    val edges = urg.as("a").join(urg.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" && $"a.l_partkey" < $"b.l_partkey")
      .select($"a.l_partkey".as("src"), $"b.l_partkey".as("dst"))
      .distinct()
    val nodes = t.part.select($"p_partkey".as("node"))
    GraphOps.pageRank(edges, nodes, iters = 5)
      .select($"node".as("part_id"), $"rank")
      .orderBy($"rank".desc, $"part_id").limit(20)
      .smallOrdered($"rank".desc, $"part_id")
  }

  /** Prefix-filtered set-similarity self-join (PPJoin candidate
    * generation): document pairs with 3-gram shingle-set Jaccard ≥ 0.7,
    * found by indexing only each document's ⌈(1−τ)·n⌉+1 globally-rarest
    * shingles and verifying candidates exactly. Same output as a full
    * inverted index (the prefix-filter theorem guarantees zero false
    * negatives); the oracle is the exact full-index computation with the
    * threshold as an integer cross-multiplication.
    */
  private val q94 = QueryDef.scalableSql(
    "prefix-filtered set-similarity join: shingle Jaccard >= 0.7 pairs")(
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 1))) AS i
      |        FROM tok),
      |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      |       FROM idx),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT da, db, inter, na.n AS na, nb.n AS nb
      |FROM pairs JOIN sizes na ON pairs.da = na.doc_id
      |           JOIN sizes nb ON pairs.db = nb.doc_id
      |WHERE 10*inter >= 7*(na.n + nb.n - inter)
      |ORDER BY da, db""".stripMargin)(
    """WITH grp AS MATERIALIZED (
      |SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep,
      |  count(*) OVER (PARTITION BY text) AS gsize
      |FROM documents),
      |rsh AS MATERIALIZED (
      |WITH reps AS (SELECT d.doc_id, d.text FROM documents d
      |    JOIN grp g ON d.doc_id = g.doc_id WHERE g.doc_id = g.rep),
      |tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM reps),
      |idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 1))) AS i FROM tok),
      |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx)
      |SELECT doc_id, s FROM sh),
      |rsizes AS MATERIALIZED (
      |SELECT doc_id, count(*) AS n FROM rsh GROUP BY 1),
      |rpairs AS MATERIALIZED (
      |WITH p AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
      |  FROM rsh a JOIN rsh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT p.da, p.db, p.inter, na.n AS na, nb.n AS nb
      |FROM p JOIN rsizes na ON p.da = na.doc_id
      |       JOIN rsizes nb ON p.db = nb.doc_id
      |WHERE 10 * p.inter >= 7 * (na.n + nb.n - p.inter)),
      |members AS MATERIALIZED (
      |SELECT least(ga.doc_id, gb.doc_id) AS da,
      |  greatest(ga.doc_id, gb.doc_id) AS db, r.inter,
      |  CASE WHEN ga.doc_id < gb.doc_id THEN r.na ELSE r.nb END AS na,
      |  CASE WHEN ga.doc_id < gb.doc_id THEN r.nb ELSE r.na END AS nb
      |FROM rpairs r JOIN grp ga ON ga.rep = r.da JOIN grp gb ON gb.rep = r.db
      |UNION ALL
      |SELECT a.doc_id, b.doc_id, sz.n, sz.n, sz.n
      |FROM grp a JOIN grp b ON a.rep = b.rep AND a.doc_id < b.doc_id
      |JOIN rsizes sz ON sz.doc_id = a.rep)
      |SELECT da, db, inter, na, nb FROM members ORDER BY da, db""".stripMargin) { (s, dir) =>
    import s.implicits._
    SetSimilarity.prefixJaccardPairs(
        Tables(s, dir).documentsFanned, "doc_id", "text", n = 3,
        tauNum = 7, tauDen = 10)
      .smallOrdered($"da", $"db")
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q92_bfs_hops" -> q92,
    "q93_pagerank" -> q93,
    "q94_prefix_setsim" -> q94
  )
}

/** The q93 oracle: 5 unrolled fixed-point iterations as materialized CTEs
  * (DuckDB's recursive CTEs disallow the per-step aggregate; unrolling keeps
  * the replay a single static statement). Built by loop so the iteration
  * count stays in ONE place next to the Spark side.
  */
private object PageRankOracle {
  def sql(iters: Int): String = {
    val base =
      """WITH urg AS MATERIALIZED (
        |  SELECT l.l_orderkey, l.l_partkey FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderpriority = '1-URGENT'),
        |edges AS MATERIALIZED (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM urg a JOIN urg b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |outdeg AS MATERIALIZED (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        |nodes AS MATERIALIZED (SELECT p_partkey AS node FROM part),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |r0 AS (SELECT node, 1000000000000 AS rank FROM nodes)""".stripMargin
    val steps = (1 to iters).map { i =>
      s""",
         |r$i AS MATERIALIZED (
         |  SELECT n.node,
         |    (SELECT 15000000000000 // (100*n) FROM nn)
         |      + (85 * coalesce(sum(r${i - 1}.rank // outdeg.deg), 0)) // 100 AS rank
         |  FROM nodes n
         |  LEFT JOIN edges ON edges.dst = n.node
         |  LEFT JOIN r${i - 1} ON r${i - 1}.node = edges.src
         |  LEFT JOIN outdeg ON outdeg.src = edges.src
         |  GROUP BY n.node)""".stripMargin
    }.mkString
    // DuckDB promotes sum() over BIGINT to HUGEINT; the gate hashes the typed
    // encoding, so the final column must be cast back to BIGINT to match Spark.
    base + steps +
      s"""
         |SELECT node AS part_id, CAST(rank AS BIGINT) AS rank FROM r$iters
         |ORDER BY rank DESC, part_id LIMIT 20""".stripMargin
  }
}
