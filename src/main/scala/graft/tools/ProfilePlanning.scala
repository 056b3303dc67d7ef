package graft.tools

import graft.SparkEntry

/** Where does the pre-first-job driver time go? Times each planning phase
  * separately for a set of gated queries: DataFrame construction (analysis
  * included — Datasets analyze eagerly), optimization, physical planning,
  * then full execution. Run after a warm-up pass so Janino/codegen caches
  * are hot and the deltas isolate per-query planning cost.
  */
object ProfilePlanning {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY",
      "q01_pricing_summary,q05_anti_join,q40_rollup_revenue").split(",")
    val spark = graft.core.GraftSession.local(cores = 32, appName = "profile-planning")
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val qe = df.queryExecution
        qe.assertOptimized()
        val t2 = System.nanoTime()
        qe.executedPlan
        val t3 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t4 = System.nanoTime()
        def ms(a: Long, b: Long) = (b - a) / 1e6
        println(f"$name rep$rep build=${ms(t0, t1)}%6.1f opt=${ms(t1, t2)}%6.1f " +
          f"phys=${ms(t2, t3)}%6.1f exec=${ms(t3, t4)}%7.1f ms")
      }
    }
    spark.stop()
  }
}
