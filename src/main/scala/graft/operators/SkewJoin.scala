package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (builder brief: "salting for skew").
  * AQE's skew-join split handles most cases at runtime, but it only splits
  * SORT-MERGE join partitions and only after a stage materializes; a hot
  * key that must hash-join (or feeds an aggregation) still lands on one
  * task. Salting fixes the plan shape itself: the skewed side gets a
  * deterministic per-row salt in [0, salt), the other side is replicated
  * once per salt value, and the join key becomes (keys..., salt) — the hot
  * key's rows spread over `salt` tasks by construction.
  *
  * The salt is `hash(all left columns) mod salt` — deterministic per row
  * (shuffle map outputs must be retry-stable; a random salt can corrupt
  * results under fetch-failure recomputation), at the cost that fully
  * identical duplicate rows share a salt. Cost model: replicates the
  * small side `salt` times — size the salt to the hot key's excess, not
  * to the cluster.
  */
object SkewJoin {

  def saltedEquiJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val saltedLeft = skewed.withColumn("__salt",
      pmod(hash(skewed.columns.map(col): _*), lit(salt)))
    val replicatedRight = other.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedLeft.join(replicatedRight, keys :+ "__salt", joinType).drop("__salt")
  }
}
