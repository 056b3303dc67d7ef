package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** SCD-1 / CDC merge: apply a changeset to a keyed base table — the batch
  * MERGE INTO of lakehouse table formats, expressed as a plan over plain
  * DataFrames. Semantics (per key):
  *
  *   - a key in `deleteKeys` is removed, whether or not it also appears in
  *     `upserts` (delete wins — the CDC convention where a tombstone
  *     supersedes any buffered update for the same key);
  *   - a key in `upserts` replaces the base row wholesale (SCD-1: latest
  *     value wins, no history), or inserts if absent from base;
  *   - any other base row passes through unchanged.
  *
  * `upserts` must be key-unique (CDC compaction — latest change per key —
  * is the caller's melt step; enforcing it here would charge every merge
  * for a distinct it usually doesn't need).
  *
  * Scale: the changeset is the small side by construction (a day of
  * changes vs the accumulated base), so both anti-joins broadcast under
  * AQE and the base table NEVER shuffles — each base partition streams
  * through two hash probes and a union. The output is a plan, not a table:
  * writers compose it with `Compaction`/`Layout` for the rewrite step.
  */
object Merge {

  def upsertDelete(base: DataFrame, upserts: DataFrame,
      deleteKeys: DataFrame, key: String): DataFrame = {
    require(base.columns.sorted.sameElements(upserts.columns.sorted),
      s"upserts schema ${upserts.columns.mkString(",")} must match base " +
        s"schema ${base.columns.mkString(",")}")
    require(deleteKeys.columns.contains(key),
      s"deleteKeys needs a '$key' column, has ${deleteKeys.columns.mkString(",")}")
    base
      .join(upserts.select(col(key)), Seq(key), "left_anti")
      .unionByName(upserts)
      .join(deleteKeys.select(col(key)), Seq(key), "left_anti")
  }
}
