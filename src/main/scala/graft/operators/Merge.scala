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

  /** Snapshot diff — the inverse of the merge: classify every key of two
    * same-schema snapshots as added / removed / changed / unchanged (the
    * change-data-feed a lakehouse table format derives between versions,
    * and the audit step of any ingestion pipeline). One full-outer
    * equi-join on the key; non-key columns compare null-safely (`<=>`),
    * never through a rendered string (double formatting differs across
    * engines — a md5-of-concat fingerprint is NOT portable). Output:
    * (key..., status) for every key present in either snapshot.
    *
    * Scale: the join shuffles both snapshots by key once; no window, no
    * driver state. Bucketed snapshots co-locate and skip the exchange
    * entirely (operators.Bucketing).
    */
  def snapshotDiff(before: DataFrame, after: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{lit, when}
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"snapshot schemas must match: ${before.columns.mkString(",")} vs " +
        after.columns.mkString(","))
    val valueCols = before.columns.filterNot(keyCols.contains).toSeq
    def tagged(df: DataFrame, p: String, flag: String) =
      valueCols.foldLeft(df) { (d, c) => d.withColumnRenamed(c, s"$p$c") }
        .withColumn(flag, lit(true))
    val a = tagged(before, "__b_", "__in_b")
    val b = tagged(after, "__a_", "__in_a")
    val differs = valueCols
      .map(c => !(col(s"__b_$c") <=> col(s"__a_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    a.join(b, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("__in_a").isNull, "removed")
          .when(col("__in_b").isNull, "added")
          .when(differs, "changed")
          .otherwise("unchanged").as("status"): _*)
  }
}
