package graft.queries

import graft.core.Tables

/** Learned clustering under the oracle gate (SURVEY.md §2 LLM-pipeline
  * rows: semantic dedup / IVF coarse quantization). The IVF gates (q43/
  * q157) probe FIXED portable centroids; q163 gates the TRAINING loop
  * itself — two full distributed Lloyd updates plus the final partition,
  * replayed bit-exactly by SQL thanks to KMeansLloyd's integer-grid /
  * rational-centroid arithmetic (no float accumulation on either side).
  */
object Clustering {

  // The iteration joints (q, a_r, c_r) are AS MATERIALIZED: DuckDB 1.0
  // re-evaluates a plain CTE at every reference, so the chained Lloyd
  // rounds otherwise compound re-evaluations exponentially in the
  // iteration depth — at sf10 the un-hinted form ballooned past 66 GB RSS
  // / 40 GB of spill (round 14, found by the shared-box OOM kill). The
  // hints change evaluation only, not semantics; d_r/s_r are referenced
  // once and stay plain.
  private def assignRound(qv: String, cents: String, r: Int): String =
    s"""d$r AS (SELECT $qv.vec_id, c.cell,
       |    (-2 * list_sum(list_transform(range(1, 65),
       |        j -> $qv.v[j] * c.sv[j])))::DOUBLE / c.n
       |      + list_sum(list_transform(c.sv, s -> s * s))::DOUBLE
       |        / (c.n::DOUBLE * c.n) AS d
       |  FROM $qv CROSS JOIN $cents c),
       |a$r AS MATERIALIZED (SELECT vec_id, cell FROM (SELECT vec_id, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
       |  FROM d$r) WHERE rn = 1)""".stripMargin

  private def updateRound(r: Int): String =
    s"""s$r AS (SELECT a.cell, jj.j AS j, sum(q.v[jj.j])::BIGINT AS s
       |  FROM a$r a JOIN q USING (vec_id)
       |  CROSS JOIN (SELECT unnest(range(1, 65)) AS j) jj GROUP BY 1, 2),
       |c$r AS MATERIALIZED (SELECT s$r.cell, list(s ORDER BY j) AS sv, n FROM s$r
       |  JOIN (SELECT cell, count(*) AS n FROM a$r GROUP BY 1) cn$r
       |    USING (cell)
       |  GROUP BY s$r.cell, n)""".stripMargin

  /** k=4, two Lloyd updates, dim 64, grid scale 1000. */
  private val q163 = QueryDef.sql(
    "distributed k-means: 2 exact Lloyd updates, final partition stats")(
    s"""WITH q AS MATERIALIZED (SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(x::DOUBLE * 1000 + 0.5) AS BIGINT)) AS v
       |  FROM embeddings),
       |c0 AS (SELECT vec_id::INT AS cell, v AS sv, 1::BIGINT AS n
       |  FROM q WHERE vec_id < 4),
       |${assignRound("q", "c0", 1)},
       |${updateRound(1)},
       |${assignRound("q", "c1", 2)},
       |${updateRound(2)},
       |${assignRound("q", "c2", 3)},
       |${updateRound(3)},
       |st AS (SELECT a.cell, count(*) AS n,
       |    sum(list_sum(list_transform(q.v, x -> x * x)))::BIGINT AS svv
       |  FROM a3 a JOIN q USING (vec_id) GROUP BY 1)
       |SELECT st.cell AS cluster, st.n,
       |  svv::DOUBLE - list_sum(list_transform(sv, s -> s * s))::DOUBLE / st.n
       |    AS inertia,
       |  sv[1]::DOUBLE / st.n AS c0_milli,
       |  sv[2]::DOUBLE / st.n AS c1_milli
       |FROM st JOIN c3 ON c3.cell = st.cell
       |ORDER BY cluster""".stripMargin) { (s, dir) =>
    import s.implicits._
    graft.operators.KMeansLloyd.clusterStats(
      Tables(s, dir).embeddingsFanned, "vec_id", "embedding",
      dim = 64, k = 4, iters = 2)
      .smallOrdered($"cluster")
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q163_kmeans_lloyd" -> q163
  )
}
