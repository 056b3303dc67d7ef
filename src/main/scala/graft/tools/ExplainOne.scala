package graft.tools

/** Print the formatted physical plan of one declared query (debug aid):
  * `sbt "runMain graft.tools.ExplainOne <queryName> [sfDir]"`.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_pricing_summary")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.GraftSession.local(cores = 4, appName = "explain")
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
