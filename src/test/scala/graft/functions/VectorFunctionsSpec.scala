package graft.functions

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class VectorFunctionsSpec extends SparkSpec {

  private def pairs = {
    val s = spark
    import s.implicits._
    Seq(
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)), // orthogonal
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)), // identical
      (Array(1f, 2f, 3f), Array(2f, 4f, 6f)), // parallel
      (Array(0f, 0f, 0f), Array(1f, 1f, 1f))  // zero vector
    ).toDF("a", "b")
  }

  test("cosineSim: orthogonal 0, identical 1, parallel 1, zero-norm 0") {
    val r = pairs.select(VectorFunctions.cosineSim(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(r(0) == 0.0)
    assert(math.abs(r(1) - 1.0) < 1e-12)
    assert(math.abs(r(2) - 1.0) < 1e-12)
    assert(r(3) == 0.0)
  }

  test("dotProduct matches hand computation") {
    val r = pairs.select(VectorFunctions.dotProduct(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0))
    assert(r(0) == 0.0)
    assert(r(1) == 14.0)
    assert(r(2) == 28.0)
    assert(r(3) == 0.0)
  }

  test("expressions survive the interpreted (non-codegen) path too") {
    // nullSafeEval path: evaluate through a literal-free filter forcing eval
    val s = spark
    import s.implicits._
    val df = Seq((Array(3f, 4f), Array(3f, 4f))).toDF("a", "b")
    val c = df.select(VectorFunctions.cosineSim(col("a"), col("b")).as("v"))
      .filter(col("v") > 0.99)
    assert(c.count() == 1)
  }
}
