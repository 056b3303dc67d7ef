package graft.churn

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Input-file validation (SURVEY.md §2.2 P2/P3), with the reference's exact
  * error strings (churn_prediction_pipeline.py:135-159) — these are
  * observable outputs (they land in the per-file log and drive the
  * errored/ routing).
  */
object Validation {

  /** Python-list rendering of a column list, matching
    * `input_example.columns.tolist()` interpolation
    * (churn_prediction_pipeline.py:154-157).
    */
  def pyList(cols: Seq[String]): String =
    cols.map(c => s"'$c'").mkString("[", ", ", "]")

  /** validate_file_input: extension predicate → CSV read → name
    * normalization → schema-inclusion predicate. Returns the cleaned
    * DataFrame or the exact reference error message.
    *
    * The CSV is read eagerly enough to surface parse failures here (header
    * resolution); Spark's lazy execution would otherwise defer unreadable-
    * file errors past validation, which would break the errored/ routing
    * contract.
    */
  def validateFileInput(
      spark: SparkSession,
      key: String,
      expectedColumns: Seq[String]): Either[String, DataFrame] = {
    if (!key.endsWith(".csv"))
      return Left(s"Invalid file type for $key. Expected a CSV file.")

    val parsed = Try {
      val df = spark.read
        .option("header", "true")
        .option("inferSchema", "true")
        .csv(key)
      df.columns // forces header resolution; throws on unreadable files
      df
    }
    parsed match {
      case Failure(e) =>
        Left(s"Error reading CSV file $key: ${e.getMessage}")
      case Success(df) =>
        val cleaned = ChurnSchema.cleanColumnNames(df)
        val actual = cleaned.columns.toSet
        if (!expectedColumns.forall(actual.contains))
          Left(s"Input file $key does not match expected structure. " +
            s"Expected columns: ${pyList(expectedColumns)}")
        else Right(cleaned)
    }
  }
}
