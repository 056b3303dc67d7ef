package graft.tools

import org.apache.spark.sql.SparkSession

/** Which analyzer/optimizer rules the 63-query planning floor actually
  * pays for: resets RuleExecutor's global time accounting, plans every
  * gated query once (no execution), and prints the top rules by wall
  * time. Feeds the bench-only `spark.sql.optimizer.excludedRules` choice —
  * excluding an optimizer rule is always semantics-preserving (rules are
  * rewrites, not requirements), so the only risk is a worse plan, which
  * the per-query bench medians would surface immediately.
  */
object ProfileRules {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "4").toInt
    val builder = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("profile-rules"),
      shufflePartitions = shuffleParts)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.constraintPropagation.enabled", "false")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    // warm pass: fill codegen/metastore caches so the measured pass is the
    // bench's steady-state planning cost
    qs.foreach { case (_, fn) =>
      try fn(spark, sfDir).queryExecution.executedPlan
      catch { case scala.util.control.NonFatal(_) => () }
    }
    org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
    val t0 = System.nanoTime()
    qs.foreach { case (_, fn) =>
      try fn(spark, sfDir).queryExecution.executedPlan
      catch { case scala.util.control.NonFatal(_) => () }
    }
    println(f"TOTAL planning wall for ${qs.size} queries: " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent())
    spark.stop()
  }
}
