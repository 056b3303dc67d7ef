package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.SparkSpec

/** The extensions class (for `spark.sql.extensions=graft.core.
  * GraftExtensions`) must inject the full function surface. Exercised by
  * applying the extensions' injected functions to the live registry after
  * dropping one (a second SparkContext per JVM isn't possible in tests).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects every registered function") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)

    val registry = org.apache.spark.sql.graft.Bridge
    val fr = spark.sessionState.functionRegistry
    fr.dropFunction(FunctionIdentifier("cosine_sim"))
    assert(!fr.functionExists(FunctionIdentifier("cosine_sim")))

    registry.applyInjectedFunctions(ext, spark)
    GraftFunctions.builders.foreach { case (name, _) =>
      assert(fr.functionExists(FunctionIdentifier(name)), s"missing $name")
    }
    val cos = spark.sql(
      """SELECT cosine_sim(array(cast(3 as float), cast(0 as float)),
        |                  array(cast(3 as float), cast(0 as float))) AS c""".stripMargin)
      .first().getDouble(0)
    assert(cos == 1.0)
    val sim = spark.sql(
      """SELECT simhash(cast(conv(substring(md5(cast(t as binary)), 1, 15),
        |  16, 10) as bigint)) AS h
        |FROM VALUES ('alpha'), ('beta') AS v(t)""".stripMargin)
      .first().getLong(0)
    assert(sim != 0L)
  }
}
