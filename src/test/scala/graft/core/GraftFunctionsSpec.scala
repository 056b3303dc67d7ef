package graft.core

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  test("native expressions are callable from spark.sql") {
    GraftFunctions.registerAll(spark)

    val cos = spark.sql(
      """SELECT cosine_sim(array(cast(1 as float), cast(0 as float)),
        |                  array(cast(1 as float), cast(0 as float))) AS c""".stripMargin)
      .first().getDouble(0)
    assert(cos == 1.0)

    val sh = spark.sql("SELECT word_shingles('a b c', 2) AS s")
      .first().getSeq[String](0)
    assert(sh.toList == List("a b", "b c"))

    val hits = spark.sql("SELECT text_hit_count('the cat the dog', 'the,a') AS h")
      .first().getInt(0)
    assert(hits == 2)

    val pairs = spark.sql(
      "SELECT pair_combinations(array(1L, 2L, 3L)) AS p")
      .first().getSeq[org.apache.spark.sql.Row](0)
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toList ==
      List((1L, 2L), (1L, 3L), (2L, 3L)))

    val sketch = spark.sql(
      """SELECT histogram_sketch(cast(v as double), 4) AS h
        |FROM VALUES (1),(2),(3),(10),(11),(12) AS t(v)""".stripMargin)
      .first().getSeq[org.apache.spark.sql.Row](0)
    assert(sketch.length <= 4)
    assert(sketch.map(_.getLong(1)).sum == 6L)
  }
}
