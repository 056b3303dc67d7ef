package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Smoke over sf0.001: every declared query runs, returns rows, and exposes
  * the column names its oracle SQL promises (the driver's hash compare is
  * name-sensitive). The numeric compare itself is the driver's DuckDB gate.
  */
class RelationalSpec extends SparkSpec {

  test("entry query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, build) =>
    test(s"$name runs on sf0.001 and returns rows") {
      val df = build(spark, sf())
      assert(df.count() > 0, s"$name returned no rows")
      assert(df.columns.distinct.length == df.columns.length,
        s"$name has duplicate column names")
    }
  }

  test("every oracle key exists in queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
