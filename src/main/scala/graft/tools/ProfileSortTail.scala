package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextAnalysis

/** A/B the final-sort tail of scan-heavy queries: a global orderBy whose
  * child is NOT a materialized exchange samples the child subtree for range
  * boundaries and then executes it again for the shuffle — running every
  * scan-side kernel twice. Variants measured here:
  *   a) bare orderBy (current q16 shape)
  *   b) no sort (lower bound)
  *   c) hash-repartition barrier below the sort (kernels once, 2 exchanges)
  *   d) localCheckpoint before sort
  */
object ProfileSortTail {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(cores = 32, appName = "profile-sort")
    def features(t: Tables): DataFrame =
      t.documentsFanned.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.distinctWordRatio(col("text")).as("dwr"),
        TextAnalysis.qualityScore(col("text")).as("q"))
    val t = Tables(spark, sfDir)
    def time(name: String)(f: => Unit): Unit = {
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1) match { case m => println(f"$name%-28s $m%6.3f s") }
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm
    noop(features(t).orderBy("doc_id"))
    time("a_orderBy")(noop(features(t).orderBy("doc_id")))
    time("b_noSort")(noop(features(t)))
    time("c_repartitionThenSort")(noop(features(t)
      .repartition(col("doc_id")).orderBy("doc_id")))
    time("d_sortWithinCoalesce1")(noop(features(t)
      .coalesce(1).sortWithinPartitions("doc_id")))
    time("e_persistThenSort") {
      val f = features(t).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      noop(f.orderBy("doc_id"))
      f.unpersist(blocking = true)
    }
    time("f_localCheckpointSort") {
      val f = features(t).localCheckpoint()
      noop(f.orderBy("doc_id"))
    }
    spark.stop()
  }
}
