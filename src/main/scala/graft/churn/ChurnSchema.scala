package graft.churn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical churn data model (SURVEY.md §1, FIXTURES.md §1).
  *
  * Reference: the raw CSV header has double spaces in several names
  * (data/customer_churn_0.csv:1); the cleaning contract is
  * churn_model_training.py:87-99 and the feature whitelist is
  * churn_model_training.py:38-52 (tariff_plan and age deliberately excluded).
  */
object ChurnSchema {

  val TargetColumn = "churn"
  val TargetPredictionColumn = "churn_prediction"
  val ModelName = "XGBoostChurnModel"
  val ModelAlias = "staging"

  /** The 11 whitelisted features, in declared order
    * (churn_model_training.py:38-52).
    */
  val NumericalColumns: Seq[String] = Seq(
    "call_failure",
    "complains",
    "subscription_length",
    "charge_amount",
    "seconds_of_use",
    "frequency_of_use",
    "frequency_of_sms",
    "distinct_called_numbers",
    "age_group",
    "status",
    "customer_value")

  /** Raw header names exactly as they appear in the canonical CSV
    * (double spaces are real).
    */
  val RawColumns: Seq[String] = Seq(
    "Call  Failure", "Complains", "Subscription  Length", "Charge  Amount",
    "Seconds of Use", "Frequency of use", "Frequency of SMS",
    "Distinct Called Numbers", "Age Group", "Tariff Plan", "Status", "Age",
    "Customer Value", "Churn")

  /** Explicit schema for the canonical churn CSV — avoids pandas-style silent
    * inference on the known format (SURVEY.md §1.3). Raw (unnormalized)
    * header names; `Customer Value` is the only fractional column.
    */
  val RawSchema: StructType = StructType(RawColumns.map {
    case c @ "Customer Value" => StructField(c, DoubleType)
    case c => StructField(c, LongType)
  })

  /** Column-name normalization (P1), the exact 4-step order of
    * churn_model_training.py:94-97: lowercase → single-pass literal
    * "  "→" " → trim → " "→"_". The double-space collapse is ONE
    * non-overlapping pass (pandas str.replace with regex=False), so
    * "a   b" (3 spaces) → "a  b" — replicated exactly by Java
    * String.replace.
    */
  def normalizeColumnName(name: String): String =
    name.toLowerCase
      .replace("  ", " ")
      .trim
      .replace(" ", "_")

  /** clean_column_names (churn_model_training.py:87-99) as a plan-preserving
    * rename: `toDF` rewrites the projection, nothing is computed.
    */
  def cleanColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(normalizeColumnName): _*)

  /** prepare_data (churn_model_training.py:62-84): clean names, require the
    * target, select the 11 features cast to double, target cast to int.
    *
    * Spark-first deviation from the reference's (X, y) pair: one DataFrame
    * holding features + label — a label is just a column here (SURVEY.md
    * §2.2 P5); positional re-alignment is never needed.
    */
  def prepareData(df: DataFrame): DataFrame = {
    val cleaned = cleanColumnNames(df)
    if (!cleaned.columns.contains(TargetColumn))
      throw new IllegalArgumentException(
        s"Target column '$TargetColumn' not found in the dataset.")
    cleaned.select(
      NumericalColumns.map(c => col(c).cast(DoubleType).as(c))
        :+ col(TargetColumn).cast(IntegerType).as(TargetColumn): _*)
  }

  /** Feature-only projection of a prepared frame. */
  def features(df: DataFrame): DataFrame =
    df.select(NumericalColumns.map(col): _*)
}
