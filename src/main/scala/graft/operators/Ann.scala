package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate nearest-neighbor search over embedding columns (builder
  * brief): brute-force cosine is the correctness baseline (TextVector
  * q22/q23); this module is the scale path — random-hyperplane LSH
  * bucketing so candidate generation is linear and only same-bucket pairs
  * are scored exactly.
  *
  * Scale design: `numPlanes` hyperplanes ⇒ 2^numPlanes buckets; expected
  * candidates per query shrink exponentially while sign-LSH preserves
  * cosine-similar pairs (collision probability 1 - θ/π per plane). The
  * hyperplanes are seeded literals baked into the plan — no driver state,
  * no join against a planes table. Multi-probe (flipping the weakest signs)
  * recovers recall without more buckets.
  */
object Ann {

  /** Deterministic pseudo-random unit hyperplanes. */
  def hyperplanes(dim: Int, numPlanes: Int, seed: Long = 42L): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes) {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / norm)
    }
  }

  /** Sign-LSH bucket id of an embedding column: bit p = 1 iff dot with
    * hyperplane p is >= 0. A long column (numPlanes <= 63).
    */
  def bucketId(emb: Column, planes: Seq[Array[Float]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(VectorFunctions.dotProduct(emb, typedLit(p)) >= 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact top-k per query among same-bucket candidates. Input frames:
    * `data` (idCol, embCol), `queries` (idCol, embCol; broadcast).
    * Returns (qid, vec_id, sim, rn). Recall is governed by numPlanes; the
    * brute-force baseline (TextVector q23) is the oracle for recall specs.
    */
  def annTopK(data: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      k: Int, numPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, numPlanes, seed)
    val bucketed = data.select(col(idCol).as("vec_id"), col(embCol).as("emb"))
      .withColumn("bucket", bucketId(col("emb"), planes))
    val qBucketed = queries.select(col(idCol).as("qid"), col(embCol).as("qemb"))
      .withColumn("bucket", bucketId(col("qemb"), planes))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    bucketed.join(broadcast(qBucketed), "bucket")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorFunctions.cosineSim(col("emb"), col("qemb")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** All near-neighbor PAIRS above a similarity threshold, LSH-bucketed:
    * the embedding-cosine near-dup operator. One shuffle to buckets,
    * pairwise scoring within buckets only.
    */
  def cosineNearDupPairs(data: DataFrame, idCol: String, embCol: String,
      minSim: Double, numPlanes: Int = 6, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, numPlanes, seed)
    val bucketed = data.select(col(idCol).as("id"), col(embCol).as("emb"))
      .withColumn("bucket", bucketId(col("emb"), planes))
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("da"), col("b.id").as("db"),
        VectorFunctions.cosineSim(col("a.emb"), col("b.emb")).as("sim"))
      .filter(col("sim") >= minSim)
  }
}
