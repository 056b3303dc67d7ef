package graft.churn

import graft.SparkSpec

class ChurnSchemaSpec extends SparkSpec {

  test("normalizeColumnName: the canonical headers (double spaces real)") {
    val got = ChurnSchema.RawColumns.map(ChurnSchema.normalizeColumnName)
    assert(got == Seq("call_failure", "complains", "subscription_length",
      "charge_amount", "seconds_of_use", "frequency_of_use",
      "frequency_of_sms", "distinct_called_numbers", "age_group",
      "tariff_plan", "status", "age", "customer_value", "churn"))
  }

  test("normalizeColumnName: single-pass double-space collapse like pandas") {
    // pandas str.replace('  ',' ') is ONE non-overlapping pass:
    // 'a   b' (3 spaces) -> 'a  b' (2) -> then ' '->'_' gives 'a__b'
    assert(ChurnSchema.normalizeColumnName("a   b") == "a__b")
    assert(ChurnSchema.normalizeColumnName("a    b") == "a__b")
    assert(ChurnSchema.normalizeColumnName("  Edge  ") == "edge")
  }

  test("prepareData selects 11 features double + churn int") {
    val raw = spark.read.schema(ChurnSchema.RawSchema)
      .option("header", "true")
      .csv("/root/reference/data/customer_churn_0.csv")
    val prepared = ChurnSchema.prepareData(raw)
    assert(prepared.columns.toSeq ==
      ChurnSchema.NumericalColumns :+ "churn")
    val types = prepared.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    ChurnSchema.NumericalColumns.foreach(c => assert(types(c) == "double"))
    assert(types("churn") == "integer")
    assert(prepared.count() == 1050)
  }

  test("prepareData error string when target missing") {
    val s = spark
    import s.implicits._
    val df = Seq((1, 2)).toDF("Call  Failure", "Complains")
    val e = intercept[IllegalArgumentException](ChurnSchema.prepareData(df))
    assert(e.getMessage == "Target column 'churn' not found in the dataset.")
  }
}
