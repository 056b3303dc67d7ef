package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import graft.SparkEntry

/** Per-job anatomy of a gated query: how many Spark jobs one execution
  * launches and where the wall time goes (job gaps = driver-side planning /
  * AQE re-optimization / collect processing). Floor diagnosis for the
  * bench gate: a sub-second query spending half its wall between jobs is
  * bounded by round trips, not compute.
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "q13_grouped_describe").split(",")
    val spark = graft.core.GraftSession.local(cores = 32, appName = "profile-jobs")
    spark.sparkContext.setLogLevel("WARN")
    final case class J(id: Int, start: Long, var end: Long = -1L, var stages: Int = 0)
    val jobs = mutable.ArrayBuffer[J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs += J(e.jobId, System.nanoTime(), stages = e.stageIds.size)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_.id == e.jobId).foreach(_.end = System.nanoTime())
        }
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      Thread.sleep(300)
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val js = jobs.synchronized(jobs.toVector).sortBy(_.start)
      println(f"== $name wall=$wall%.3f s, ${js.size} jobs")
      var prevEnd = t0
      js.foreach { j =>
        val gap = (j.start - prevEnd) / 1e9
        val dur = (j.end - j.start) / 1e9
        println(f"  job ${j.id}%3d stages=${j.stages} gapBefore=$gap%6.3f dur=$dur%6.3f")
        prevEnd = math.max(prevEnd, j.end)
      }
      val totalJob = js.map(j => (j.end - j.start) / 1e9).sum
      println(f"  sum(job)=$totalJob%.3f  driver-side=${wall - totalJob}%.3f")
    }
    spark.stop()
  }
}
