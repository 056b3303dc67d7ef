package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers (builder brief: "repartition/bucketing for
  * co-located joins"): persisting both sides of a recurring join bucketed
  * by the join key lets every subsequent join (and aggregation on the key)
  * skip its shuffle entirely — at 100 TB the shuffle IS the cost, and a
  * nightly fact table joined daily amortizes one bucketed write into N
  * shuffle-free reads.
  *
  * Uses the session catalog's saveAsTable (bucket metadata lives in the
  * catalog; plain parquet paths can't carry it). Spark's reader then plans
  * a scan whose output partitioning already satisfies the join's
  * distribution requirement — BucketingSpec asserts the join runs with NO
  * exchange on either side.
  */
object Bucketing {

  /** Persist `df` as a bucketed catalog table (overwriting any previous
    * definition): `buckets` buckets by `keyCols`, sorted within buckets by
    * the same keys so sort-merge joins also skip their sorts.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keyCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys — planned without
    * a shuffle on either side (and without per-task sorts when both sides
    * were written sortBy the key).
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keyCols: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keyCols, joinType)

  /** Drop a bucketed table AND its warehouse location: the catalog is
    * in-memory per JVM but the warehouse dir persists, so a table dropped
    * (or a JVM restarted) leaves an orphaned directory that a later
    * `saveAsTable` of the same name trips over.
    */
  def dropWithLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val dir = java.nio.file.Paths.get(wh, table)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }
}
