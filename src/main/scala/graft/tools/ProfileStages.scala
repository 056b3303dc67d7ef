package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-STAGE anatomy for one query (optimization round 14): task count,
  * summed task time, and wall span of every stage, in completion order —
  * finds the stages whose width (not work) bounds a CPU-heavy query.
  * Usage: SPARK_GRAFT_ONLY=q174_... [SPARK_GRAFT_SHUFFLE=4] runMain
  * graft.tools.ProfileStages
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "4").toInt
    val builder = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("profile-stages"),
      shuffleParts)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.execution.ui.enabled", "false")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.default.parallelism", shuffleParts.toString)
      .config("spark.locality.wait", "0")
      .config("spark.graft.fanout", sys.env.getOrElse("SPARK_GRAFT_FANOUT",
        "16"))
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "q174_curation_flagship")
      .split(",")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val taskDur = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        taskDur.computeIfAbsent(t.stageId,
            _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
          .add(Option(t.taskInfo).map(_.duration).getOrElse(0L))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val span = (for {
          a <- i.completionTime; b <- i.submissionTime
        } yield (a - b) / 1000.0).getOrElse(-1.0)
        val durs = Option(taskDur.get(i.stageId))
          .map(q => { val a = q.toArray(Array.empty[java.lang.Long])
            .map(_.longValue); java.util.Arrays.sort(a); a })
          .getOrElse(Array.empty[Long])
        val mx = if (durs.isEmpty) 0.0 else durs.last / 1000.0
        val md = if (durs.isEmpty) 0.0 else durs(durs.length / 2) / 1000.0
        stages.add(f"  stage=${i.stageId}%4d tasks=${i.numTasks}%4d " +
          f"taskSec=${i.taskMetrics.executorRunTime / 1000.0}%7.2f " +
          f"span=$span%6.2f maxT=$mx%5.2f medT=$md%5.2f  ${i.name.take(60)}")
      }
    })
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
      spark.catalog.clearCache()
      stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"$name wall=$wall%.2f s")
      stages.forEach(s => println(s))
    }
    spark.stop()
  }
}
