package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one declared query (debug aid):
  * `sbt "runMain graft.tools.ExplainOne <queryName> [sfDir]"`.
  *
  * Round 14: the session mirrors the BENCH protocol (same master, shuffle
  * sizing and fan-out conf from SPARK_GRAFT_CPUS / SPARK_GRAFT_SHUFFLE /
  * SPARK_GRAFT_FANOUT, AQE off) so committed plan files show the shape the
  * driver actually times — under the old 4-core toy session, width-
  * dependent operators (Tables.fanOut's partition guard) planned
  * differently than they run.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_pricing_summary")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      math.max(cpus / 8, 1).toString).toInt
    val spark = graft.core.GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]").appName("explain"),
        shufflePartitions = shuffleParts)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.default.parallelism", shuffleParts.toString)
      .config("spark.graft.fanout", sys.env.getOrElse("SPARK_GRAFT_FANOUT",
        math.max(cpus / 2, shuffleParts).toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
