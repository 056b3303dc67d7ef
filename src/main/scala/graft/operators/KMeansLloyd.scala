package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable distributed k-means (Lloyd 1982): the clustering
  * primitive behind IVF coarse quantizers (`Ann.ivfTopK` fits MLlib's —
  * fast but seed/engine-opaque) and semantic-dedup bucketing. This variant
  * is EXACT and replayable by an external SQL oracle (q163), the same
  * portability discipline as `Ann.portableCentroids`:
  *
  *  - inputs quantize to an integer grid: q_j = floor(x_j·scale + 0.5) —
  *    floor on doubles is exact, so both engines see identical longs;
  *  - a centroid is the RATIONAL (S, n) = (Σ members, count), never a
  *    rounded mean: the argmin ranks −2·(v·S)/n + (S·S)/n², where v·S and
  *    S·S are INTEGER dot products (order-independent, exactly summable)
  *    and the two divisions are single deterministic double ops — no
  *    float accumulation anywhere, so cell assignment is bit-portable;
  *  - ties break on the lower cell id.
  *
  * Plan shape per iteration: one scan, cell argmin fused in-plan over k
  * literal centroids, then ONE map-side-combined aggregate to k rows of
  * (n, 64 component sums) collected to the driver (k·dim longs — the
  * bounded-collect pattern of Ann's centroid literals). At 100 TB: scans
  * dominate, nothing downstream exceeds k·dim. Exactness bounds: the v·S
  * dot and Σv·v accumulate in longs — safe while n·scale²·dim < 2^63
  * (≈ 10^11 rows PER CLUSTER at scale=1000, dim=64); the quadratic S·S
  * term would wrap six orders of magnitude earlier (S_j² ≈ n²·scale²),
  * so it is computed in widened arithmetic instead — BigInt on the
  * driver, decimal(38,0) in-plan — and never binds. Both widenings
  * convert to double with one round-to-nearest, exactly DuckDB's
  * HUGEINT→DOUBLE cast, so oracle replays stay bit-identical. Past the
  * long bound, lift the dot accumulator to decimal(38,0) too — same
  * plan, wider lanes.
  */
object KMeansLloyd {

  /** (id, sums, count) rational centroid — `id` is the stable cell label
    * (survives empty-cluster dropout, so labels and tie-breaks stay aligned
    * with an oracle that keeps original cell ids).
    */
  final case class Centroid(id: Int, sums: Array[Long], n: Long)

  /** Quantized copy of `df`: (idCol, v array<long>). */
  def quantized(df: DataFrame, idCol: String, embCol: String,
      scale: Int = 1000): DataFrame =
    df.select(col(idCol), transform(col(embCol),
      x => floor(x.cast("double") * scale + lit(0.5)).cast("long")).as("v"))

  /** Argmin cell over literal rational centroids: −2(v·S)/n + (S·S)/n²
    * ranked as (d, cell) structs — `array_min` keeps it all in-plan.
    */
  def cellFor(v: Column, cents: Seq[Centroid]): Column = {
    def rank(c: Centroid): Column = {
      val dot = aggregate(
        zip_with(v, typedLit(c.sums.toSeq), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)
      // S·S in BigInt: with scale=1000 a Long Σ S_j² wraps around n ≈ 10^6
      // rows per cluster; BigInt is exact at any n and its toDouble is one
      // deterministic round-to-nearest (DuckDB's HUGEINT sum + ::DOUBLE).
      val ss = c.sums.map(s => BigInt(s) * BigInt(s)).sum
      val d = (dot * -2L).cast("double") / lit(c.n.toDouble) +
        lit(ss.toDouble / (c.n.toDouble * c.n))
      struct(d.as("d"), lit(c.id).as("cell"))
    }
    array_min(array(cents.map(rank): _*)).getField("cell")
  }

  /** One aggregation pass: per-cell (n, component sums, Σ v·v). */
  private def cellStats(assigned: DataFrame, dim: Int): DataFrame = {
    val vv = aggregate(zip_with(col("v"), col("v"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val aggCols = Seq(count(lit(1)).as("n"), sum(vv).as("svv")) ++
      (1 to dim).map(j => sum(element_at(col("v"), j)).as(s"s$j"))
    assigned.groupBy(col("cell"))
      .agg(aggCols.head, aggCols.tail: _*)
  }

  private def collectCentroids(stats: DataFrame, dim: Int): Seq[Centroid] =
    stats.collect().sortBy(_.getAs[Int]("cell")).map { r =>
      Centroid(r.getAs[Int]("cell"),
        (1 to dim).map(j => r.getAs[Long](s"s$j")).toArray,
        r.getAs[Long]("n"))
    }.toSeq

  /** `iters` full Lloyd updates from the first-k-ids seed, then one final
    * assignment reported as per-cluster stats: (cluster, n, inertia,
    * c0_milli, c1_milli) — inertia is the within-cluster sum of squares
    * Σv·v − (S·S)/n of the FINAL partition (exact ints, one division) and
    * the c*_milli are the first two centroid coordinates in grid units.
    */
  def clusterStats(df: DataFrame, idCol: String, embCol: String,
      dim: Int, k: Int, iters: Int, scale: Int = 1000): DataFrame = {
    val q = quantized(df, idCol, embCol, scale)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val init = q.filter(col(idCol) < k)
        .collect().sortBy(_.getAs[Long](idCol)).map { r =>
          Centroid(r.getAs[Long](idCol).toInt, r.getSeq[Long](1).toArray, 1L)
        }.toSeq
      val fin = (1 to iters).foldLeft(init) { (cents, _) =>
        collectCentroids(
          cellStats(q.withColumn("cell", cellFor(col("v"), cents)), dim), dim)
      }
      val stats = cellStats(q.withColumn("cell", cellFor(col("v"), fin)), dim)
      // in-plan S·S widened to decimal(38,0): Long s_j*s_j wraps around
      // n ≈ 10^6 rows per cluster (see cellFor); the exact decimal sum
      // casts to double with one round-to-nearest, matching the oracle's
      // HUGEINT list_sum + ::DOUBLE
      val ss = (1 to dim).map(j =>
          col(s"s$j").cast("decimal(38,0)") * col(s"s$j").cast("decimal(38,0)"))
        .reduce(_ + _)
      stats.select(col("cell").as("cluster"), col("n"),
        (col("svv").cast("double") - ss.cast("double") / col("n"))
          .as("inertia"),
        (col("s1").cast("double") / col("n")).as("c0_milli"),
        (col("s2").cast("double") / col("n")).as("c1_milli"))
    } finally { q.unpersist(blocking = false); () }
  }
}
