package graft.tools

import org.apache.spark.sql.SparkSession

/** Print q69's optimized + physical plan to find where the verify filter
  * lands.
  */
object ProfileQ69Plan {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession
      .configure(SparkSession.builder().master("local[32]"),
        shufflePartitions = 4)
      .getOrCreate()
    val df = graft.SparkEntry.queries("q69_fuzzy_name_join")(
      spark, "/root/testdata/sf0.1")
    println(df.queryExecution.optimizedPlan.treeString.take(6000))
    println("==== PHYSICAL ====")
    println(df.queryExecution.executedPlan.treeString.take(6000))
    spark.stop()
  }
}
