package graft.churn

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class ValidationSpec extends SparkSpec {

  private val expected = ChurnSchema.NumericalColumns

  test("valid churn file passes and comes back name-cleaned") {
    val r = Validation.validateFileInput(spark,
      "/root/reference/data/customer_churn_1.csv", expected)
    assert(r.isRight)
    val df = r.toOption.get
    assert(expected.forall(df.columns.contains))
    assert(df.columns.contains("churn"))
  }

  test("non-csv extension: exact error string") {
    val r = Validation.validateFileInput(spark, "data/input/foo.txt", expected)
    assert(r == Left("Invalid file type for data/input/foo.txt. Expected a CSV file."))
  }

  test("unreadable file: 'Error reading CSV file' prefix") {
    val r = Validation.validateFileInput(spark, "/nonexistent/nowhere.csv", expected)
    assert(r.isLeft)
    assert(r.swap.toOption.get.startsWith("Error reading CSV file /nonexistent/nowhere.csv: "))
  }

  test("missing columns: exact error string with python list rendering") {
    val tmp = Files.createTempDirectory("graft-validate")
    val f = tmp.resolve("short.csv")
    Files.writeString(f, "Call  Failure,Churn\n1,0\n")
    val r = Validation.validateFileInput(spark, f.toString, expected)
    assert(r == Left(
      s"Input file $f does not match expected structure. " +
        "Expected columns: ['call_failure', 'complains', 'subscription_length', " +
        "'charge_amount', 'seconds_of_use', 'frequency_of_use', 'frequency_of_sms', " +
        "'distinct_called_numbers', 'age_group', 'status', 'customer_value']"))
  }

  test("extra columns are allowed (superset rule)") {
    val tmp = Files.createTempDirectory("graft-validate2")
    val f = tmp.resolve("extra.csv")
    val header = ChurnSchema.RawColumns.mkString(",") + ",Bonus Column"
    val row = Seq.fill(ChurnSchema.RawColumns.size)("1").mkString(",") + ",9"
    Files.writeString(f, s"$header\n$row\n")
    val r = Validation.validateFileInput(spark, f.toString, expected)
    assert(r.isRight)
    assert(r.toOption.get.columns.contains("bonus_column"))
  }
}
