package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sharded dataset delivery with an integrity manifest — the write side of
  * a training-data platform: a curated corpus ships as N deterministic
  * shards (so the trainer's data loader can assign shards to workers
  * without a coordinator) plus a manifest of per-shard row counts and
  * content checksums (so a torn copy or a silently dropped part file is
  * caught before a training run, not during).
  *
  * Determinism contract (engine-portable, q136 replays it in SQL): shard =
  * `tokenHash60(key) mod n` — the same md5-derived 60-bit hash the dedup
  * family uses, so assignment is reproducible from any engine and STABLE
  * across runs (a re-export of the same corpus produces byte-identical
  * shard membership; downstream caches keyed by shard stay valid).
  * Checksum = sum of the hash's low 30 bits per shard — order-independent
  * (shards are unordered row sets), mergeable (map-side combined), and
  * overflow-safe to ~8e9 rows per shard in a signed 64-bit sum; past that
  * the slice narrows (a width parameter, not a redesign).
  *
  * Scale shape: assignment is one codegen'd projection; the manifest is
  * one map-side-combined aggregation of (int, long, long) rows; the write
  * is `partitionBy(shard)` so each shard lands as its own directory with
  * no extra exchange beyond the write's own. Verification re-derives the
  * manifest FROM THE WRITTEN FILES and requires equality — the check reads
  * what a consumer would read.
  */
object Sharding {

  /** Deterministic shard id from a stable key column. */
  def assign(df: DataFrame, keyCol: String, n: Int): DataFrame = {
    require(n > 0, s"shard count $n must be positive")
    df.withColumn("shard",
      pmod(Dedup.tokenHash60(col(keyCol).cast("string")), lit(n.toLong))
        .cast("int"))
  }

  /** Per-shard (shard, rows, checksum) from an assigned frame. */
  def manifest(assigned: DataFrame, keyCol: String): DataFrame =
    assigned
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(Dedup.tokenHash60(col(keyCol).cast("string"))
          .bitwiseAND(lit((1L << 30) - 1))).as("checksum"))

  /** Write `df` as `n` shards under `path` and return the verified
    * manifest: computed from the input, re-derived from the written files,
    * required equal.
    */
  def writeShards(df: DataFrame, keyCol: String, path: String, n: Int): DataFrame = {
    val spark = df.sparkSession
    val assigned = assign(df, keyCol, n)
    assigned.write.mode("overwrite").partitionBy("shard").parquet(path)
    val expected = manifest(assigned, keyCol)
    val actual = manifest(spark.read.parquet(path), keyCol)
    val diff = expected.unionAll(actual)
      .groupBy(col("shard"), col("n_rows"), col("checksum"))
      .agg(count(lit(1)).as("c")).filter(col("c") =!= 2)
    val bad = diff.limit(1).collect()
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"shard manifest mismatch after write at $path: shard ${bad(0).get(0)}")
    expected
  }

  /** Re-verify an existing sharded dataset against a manifest — the
    * consumer-side integrity check before a training run.
    */
  def verify(spark: SparkSession, path: String, keyCol: String,
      expected: DataFrame): Boolean = {
    val actual = manifest(spark.read.parquet(path), keyCol)
    expected.unionAll(actual)
      .groupBy(col("shard"), col("n_rows"), col("checksum"))
      .agg(count(lit(1)).as("c")).filter(col("c") =!= 2)
      .isEmpty
  }
}
