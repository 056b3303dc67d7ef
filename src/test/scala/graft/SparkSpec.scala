package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session — Spark
  * session startup dominates test time otherwise).
  */
object SharedSpark {
  lazy val spark: SparkSession = graft.core.GraftSession.local(cores = 4, appName = "graft-test")
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}
