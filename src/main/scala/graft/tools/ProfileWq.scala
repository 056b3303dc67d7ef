package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.WeightedQuantiles

/** Profiling driver for the q78/q80 weighted-quantile shape: split the
  * driver-dispatch build phase (range exchange + persist + cell collect)
  * from the located-cell final pass.
  */
object ProfileWq {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val dir = "/root/testdata/sf0.1"
    val t = Tables(spark, dir)
    val li = t.lineitem
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
    li.count()
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    for (i <- 1 to 3) {
      spark.catalog.clearCache()
      val q = time(s"[$i] build (collect phase)")(
        WeightedQuantiles.byGroup(li, Seq("l_returnflag"),
          "l_extendedprice", col("l_quantity"),
          Seq(("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4))))
      time(s"[$i] final pass")(q.count())
      time(s"[$i] final pass x2")(q.count())
    }
    // how expensive is the raw persist+collect alone?
    spark.catalog.clearCache()
    val ranged = li.repartitionByRange(col("l_returnflag"), col("l_extendedprice"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__w", col("l_quantity"))
    val b = time("persist() handle")(
      ranged.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    time("cellW agg collect (materializes)")(
      b.groupBy(col("__pid"), col("l_returnflag"))
        .agg(sum(col("__w")).as("__cw")).collect())
    time("cellW agg collect x2 (cached)")(
      b.groupBy(col("__pid"), col("l_returnflag"))
        .agg(sum(col("__w")).as("__cw")).collect())
    spark.stop()
  }
}
