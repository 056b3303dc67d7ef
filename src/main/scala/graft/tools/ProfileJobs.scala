package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query job/stage anatomy for the bench floor: how many Spark jobs,
  * stages and tasks each gated query launches, and where task time goes.
  * The per-query floor is mostly COUNT-driven (each job pays scheduling +
  * first-task latency), so this ranks queries by what to fuse next.
  * Usage: SPARK_GRAFT_ONLY=... SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileJobs
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8").toInt
    val builder = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("profile-jobs"),
      shufflePartitions = shuffleParts)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.default.parallelism", shuffleParts)
      .config("spark.locality.wait", "0")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        taskTimeMs += s.stageInfo.taskMetrics.executorRunTime
      }
    })

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // warm pass (JIT + codegen), unprofiled
    selected.foreach { case (_, fn) =>
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    println(f"${"query"}%-32s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"taskSec"}%8s ${"wallSec"}%8s")
    selected.foreach { case (name, fn) =>
      spark.catalog.clearCache()
      jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0L
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener is async; give the bus a beat to drain before reading
      Thread.sleep(120)
      println(f"$name%-32s $jobs%5d $stages%7d $tasks%6d ${taskTimeMs / 1000.0}%8.2f $wall%8.2f")
    }
    spark.stop()
  }
}
