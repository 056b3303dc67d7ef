package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2): each entry is
  * one engine operator expressed over the TESTDATA.md tables; `oracleSql`
  * holds the DuckDB-equivalent SQL for the driver's hash-compare gate.
  */
object SparkEntry {

  /** All declared query groups, in inventory order. */
  private val all: Seq[(String, QueryDef)] =
    Relational.defs ++ TextVector.defs ++ MlDrift.defs ++ Analytics.defs ++
      Curation.defs ++ Scale.defs ++ Pipeline.defs ++ Graphs.defs ++
      Temporal.defs ++ Stats.defs ++ Features.defs ++ Media.defs ++
      StreamGate.defs ++ AnnAudit.defs ++ Tokenizer.defs ++ Delivery.defs ++
      Formats.defs ++ ModelEval.defs ++ Clustering.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.head._2.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, d) => name -> d.build }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (name, QueryDef(_, Some(sql), _, _)) => name -> sql }.toMap

  /** For the collapse-class queries whose committed oracle is the proven
    * scalable formulation: the transparent all-pairs SEMANTIC definition.
    * OracleEquivalenceSpec asserts committed ≡ semantic (exact frames, via
    * DuckDB) at sf0.01 on every test run.
    */
  def semanticOracleSql: Map[String, String] =
    all.collect {
      case (name, QueryDef(_, _, _, Some(sql))) => name -> sql
    }.toMap
}
