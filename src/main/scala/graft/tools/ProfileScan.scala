package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Floor anatomy of single-row-group parquet scans: the driver-generated
  * testdata packs each table into ONE row group, so a vanilla scan stage is
  * one task — decode AND partial aggregation run on one core while 31 idle.
  * Times (a) bare decode, (b) scan-stage agg, (c) fanOut + agg for the
  * bench's worst scan-bound shapes, to size how much of the per-query floor
  * a post-scan repartition recovers.
  */
object ProfileScan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = graft.core.GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder()
        .master("local[32]").appName("profile-scan"),
      shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32").toInt)
    sys.env.get("SPARK_GRAFT_AQE").foreach(v =>
      builder.config("spark.sql.adaptive.enabled", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"$label%-40s median=${runs.sorted.apply(1)}%8.1f ms")
    }
    time("decode lineitem (count)") { t.lineitem.count(); () }
    time("decode lineitem all cols (noop)") {
      t.lineitem.write.format("noop").mode("overwrite").save()
    }
    time("4x count_distinct plain") {
      t.lineitem.select(
        countDistinct(col("l_orderkey")), countDistinct(col("l_partkey")),
        countDistinct(col("l_suppkey")), countDistinct(col("l_returnflag"))
      ).collect(); ()
    }
    time("4x count_distinct fanOut") {
      t.fanOut(t.lineitem).select(
        countDistinct(col("l_orderkey")), countDistinct(col("l_partkey")),
        countDistinct(col("l_suppkey")), countDistinct(col("l_returnflag"))
      ).collect(); ()
    }
    time("events json parse plain") {
      t.events.select(get_json_object(col("props"), "$.k").cast("double"))
        .agg(sum("*")).collect(); ()
    }
    time("events json parse fanOut") {
      t.fanOut(t.events).select(get_json_object(col("props"), "$.k").cast("double"))
        .agg(sum("*")).collect(); ()
    }
    time("agg + global orderBy") {
      t.lineitem.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum("l_quantity").as("s"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
        .write.format("noop").mode("overwrite").save()
    }
    time("agg + coalesce(1) local sort") {
      t.lineitem.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum("l_quantity").as("s"))
        .coalesce(1)
        .sortWithinPartitions(col("l_returnflag"), col("l_linestatus"))
        .write.format("noop").mode("overwrite").save()
    }
    time("agg + repartition(1) local sort") {
      t.lineitem.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum("l_quantity").as("s"))
        .repartition(1)
        .sortWithinPartitions(col("l_returnflag"), col("l_linestatus"))
        .write.format("noop").mode("overwrite").save()
    }
    time("scan-compute + global orderBy") {
      t.documents.select(col("doc_id"),
          length(col("text")).as("len"),
          size(split(col("text"), "\\s+")).as("words"))
        .orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    time("scan-compute + repartition(1) sort") {
      t.documents.select(col("doc_id"),
          length(col("text")).as("len"),
          size(split(col("text"), "\\s+")).as("words"))
        .repartition(1).sortWithinPartitions(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    // irreducible floors: what a query can never undercut on this harness
    time("floor: range(1) noop (plan+1 job)") {
      spark.range(1).write.format("noop").mode("overwrite").save()
    }
    time("floor: range agg 1-exchange") {
      spark.range(100).groupBy((col("id") % 4).as("g")).count()
        .write.format("noop").mode("overwrite").save()
    }
    time("floor: region scan noop") {
      t.region.write.format("noop").mode("overwrite").save()
    }
    time("floor: events 2-col agg") {
      t.events.groupBy(col("event_type")).agg(sum("value"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
