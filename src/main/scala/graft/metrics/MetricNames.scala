package graft.metrics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Metric-name canonicalization (SURVEY.md §2.9 R2) — the exact string
  * contract between the report generator and the 22 dashboard SQL queries.
  *
  * Reference semantics (churn_prediction_pipeline.py:533-553):
  *  - base name = leading `[a-zA-Z0-9_]+` of the metric id, lowercased
  *    ("F1Score(conf_matrix=True)" → "f1score");
  *  - if the id carries `column=<name>`, append `_<name lowercased>`
  *    ("ValueDrift(column=age_group)" → "valuedrift_age_group");
  *  - per-label dict flatten appends `[<key>]` AFTER simplification
  *    ("F1ByLabel()" with key "0" → "f1bylabel[0]"... the reference then
  *    stores `f1bylabel_0`-style Grafana keys via the same flatten —
  *    see `flattenKey`).
  */
object MetricNames {

  private val BasePattern = "^([a-zA-Z0-9_]+)".r
  private val ColumnPattern = "column=([\\w\\d_]+)".r

  /** Driver-side simplification, exact reference semantics. */
  def simplify(metricId: String): String = {
    val base = BasePattern.findFirstMatchIn(metricId)
      .map(_.group(1).toLowerCase)
      .getOrElse(metricId.toLowerCase)
    ColumnPattern.findFirstMatchIn(metricId) match {
      case Some(m) => s"${base}_${m.group(1).toLowerCase}"
      case None => base
    }
  }

  /** Dict-value flatten key (churn_prediction_pipeline.py:519):
    * `name[key]`, e.g. "driftedcolumnscount[share]".
    */
  def flattenKey(simpleName: String, key: String): String = s"$simpleName[$key]"

  /** Column-level simplification for distributed use — same semantics as
    * `simplify`, expressed with codegen'd built-ins (no UDF).
    */
  def simplifyCol(metricId: Column): Column = {
    val base = lower(regexp_extract(metricId, "^([a-zA-Z0-9_]+)", 1))
    val column = lower(regexp_extract(metricId, "column=([\\w\\d_]+)", 1))
    when(column === "", base).otherwise(concat(base, lit("_"), column))
  }
}
