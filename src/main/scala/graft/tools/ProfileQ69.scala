package graft.tools

import org.apache.spark.sql.SparkSession

/** End-to-end timing for the declared fuzzy-join query (q69) at sf0.1 —
  * the bench shape (noop write materialization), repeated to expose
  * warm-path cost.
  */
object ProfileQ69 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession
      .configure(SparkSession.builder().master("local[32]"),
        shufflePartitions = 4)
      .getOrCreate()
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q69_fuzzy_name_join")(spark, sf)
        .write.format("noop").mode("overwrite").save()
      println(f"q69 rep $i: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
