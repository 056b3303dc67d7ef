package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Scratch: per-job/stage wall breakdown of q12 at sf0.1. */
object ProfileQ12c {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    val dir = "/root/testdata/sf0.1"
    val jobs = mutable.Map[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs(j.jobId) = j.time
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        println(f"JOB ${j.jobId}%3d  ${(j.time - jobs.getOrElse(j.jobId, j.time)) / 1e3}%7.2f s")
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val info = s.stageInfo
        val dur = (for {a <- info.completionTime; b <- info.submissionTime}
          yield (a - b) / 1e3).getOrElse(-1.0)
        println(f"  STAGE ${info.stageId}%3d ${info.numTasks}%4d tasks ${dur}%7.2f s  ${info.name.take(60)}")
      }
    }
    val which = sys.env.getOrElse("GRAFT_PROFILE_QUERY", "q12_summary_stats")
    // warm
    graft.SparkEntry.queries(which)(spark, dir).count()
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(which)(spark, dir).count()
    Thread.sleep(500)
    println(f"TOTAL $which ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
