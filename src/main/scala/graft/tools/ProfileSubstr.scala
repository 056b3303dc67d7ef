package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Stage-by-stage timing of SubstringDedup.repeatedSpans on the pressure
  * corpus: which of (window hashing, repeated-hash agg, join-back, island
  * windows) carries the 100 s wall the pressure test measured.
  */
object ProfileSubstr {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(cores = 32, appName = "profile-substr")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val minLen = 10
    val docs = graft.core.Tables(spark, sfDir).documents
    // the same amplified corpus the pressure test drives (shared helper —
    // the profile must explain THAT run, not a diverged cousin)
    val amplified = PressureSubstr.amplify(docs)
      .persist(StorageLevel.MEMORY_AND_DISK)
    timed("amplify")(amplified.count())

    val grams = graft.operators.SubstringDedup
      .windowHashes(amplified, "doc_id", "text", minLen)
    timed("grams count")(println("  n=" + grams.count()))
    val g2 = grams.persist(StorageLevel.MEMORY_AND_DISK)
    timed("grams persist")(g2.count())
    val rep = g2.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("h"))
    timed("rep agg")(println("  rep=" + rep.count()))
    val pos = g2.join(rep, "h").select(col("id"), col("i"))
    timed("join back")(println("  pos=" + pos.count()))
    val full = graft.operators.SubstringDedup
      .repeatedSpans(amplified, "doc_id", "text", minLen)
    timed("full operator")(println("  spans=" + full.count()))
    g2.unpersist()
    spark.stop()
  }
}
