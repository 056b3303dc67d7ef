package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: the Spark build plus (when the semantics are
  * ANSI-SQL-expressible) an equivalent DuckDB oracle over the same parquet
  * tables. Column names must match between the two — the driver's compare
  * sorts columns by name before hashing values (see the builder contract).
  *
  * Queries with no oracle get a weaker rows-only check from the driver; keep
  * those to genuinely non-SQL-expressible operators (hash-seeded sketches,
  * model scoring).
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    doc: String = ""
)

object QueryDef {
  /** Helper keeping each query definition to one expression. */
  def sql(doc: String)(oracle: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, Some(oracle), doc)

  def rowsOnly(doc: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, None, doc)
}
