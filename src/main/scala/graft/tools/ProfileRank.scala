package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Scratch: per-stage breakdown of q12. */
object ProfileRank {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    graft.core.Tables(spark, dir).lineitem.count()
    def noop(q: String): Unit =
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    noop("q12_summary_stats") // warm up
    val stages = mutable.ArrayBuffer[(Int, String, Long, Int, Long)]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages += ((si.stageId, si.name.split('\n').head.take(60), wall,
          si.numTasks, si.taskMetrics.executorRunTime))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    noop("q12_summary_stats")
    val dt = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    println(f"TOTAL $dt%.2f s over ${stages.size} stages")
    stages.foreach { case (id, name, wall, tasks, run) =>
      println(f"stage $id%3d wall=${wall / 1e3}%6.2f s tasks=$tasks%3d cpuSum=${run / 1e3}%6.2f s  $name")
    }
    spark.stop()
  }
}
