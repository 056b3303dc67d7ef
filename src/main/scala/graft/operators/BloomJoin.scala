package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter pre-filtered joins (builder brief: "minimize shuffles" /
  * "push down and prune"): build a bloom filter over the dimension side's
  * join keys with ONE small aggregate job, then drop non-matching fact rows
  * AT THE SCAN — before any exchange — so the subsequent exact join
  * shuffles only probable matches. The bloom filter has no false negatives,
  * so the final result is EXACT; false positives are removed by the exact
  * join that follows. This is the plan shape Spark's own runtime row-level
  * filtering (`spark.sql.optimizer.runtime.bloomFilter.*`) injects for
  * shuffle joins, made explicit and deterministic: the same
  * `BloomFilterAggregate` / `might_contain` machinery (codegen'd on the
  * probe side), but under operator control — sized from the dim count, not
  * gated on the optimizer's selectivity heuristics, and usable above any
  * join type.
  *
  * Scale: at 100 TB the fact side's semi-join shuffle is the dominant cost;
  * a 1% fpp filter over 10M dim keys is ~12 MB of task-closure bytes and
  * turns that shuffle into (selectivity + 1%) of itself. The dim aggregate
  * shuffles only one bloom buffer per partition (map-side merge). The
  * filter rides the scan stage and keeps whole-stage codegen
  * (`BloomFilterMightContain.doGenCode`).
  */
object BloomJoin {

  /** The probe predicate: `might_contain(bloomOf(keys), xxhash64(keyCol))`.
    * Exposed so callers can prune any plan side (e.g. both inputs of a
    * shuffled join) with one shared filter. Sizing: pass `expectedItems`
    * when the dim cardinality is known (a catalog estimate, an upstream
    * count); otherwise one cheap count job over the (column-pruned) key
    * scan sizes the filter — a deliberately separate job, because an
    * undersized bloom filter silently degrades to pass-through fpp and an
    * oversized one ships dead bytes to every task.
    */
  def keyFilter(keys: DataFrame, keysCol: String, probe: Column,
      fpp: Double = 0.01, expectedItems: Option[Long] = None): Column = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    val n = math.max(expectedItems.getOrElse(keys.count()), 1L)
    val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(n, fpp)
    val bytes = keys
      .select(xxhash64(col(keysCol)).as("__h"))
      .agg(
        Bridge.column(new BloomFilterAggregate(
          Bridge.expression(col("__h")),
          Literal(n), Literal(numBits)).toAggregateExpression())
          .as("bf"))
      .head().getAs[Array[Byte]](0)
    Bridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      Bridge.expression(xxhash64(probe))))
  }

  /** Exact semi-join with bloom pre-pruning: `fact` rows whose `factKey`
    * appears in `dim.dimKey`. The bloom filter drops ~(1 - selectivity)
    * of the fact scan before the exchange; the left-semi join makes the
    * result exact.
    */
  def semiJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, fpp: Double = 0.01): DataFrame = {
    val pruned = fact.filter(keyFilter(dim, dimKey, col(factKey), fpp))
    pruned.join(dim.select(col(dimKey)), col(factKey) === col(dimKey),
      "left_semi")
  }
}
