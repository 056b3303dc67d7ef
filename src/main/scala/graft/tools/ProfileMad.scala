package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.WeightedQuantiles

/** Stage timing for the q80 med→MAD→outlier chain. */
object ProfileMad {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val dir = "/root/testdata/sf0.1"
    val t = Tables(spark, dir)
    val ev = t.events.select(col("event_type"), col("value"))
    ev.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    val med = WeightedQuantiles.byGroup(ev, Seq("event_type"), "value",
      lit(1L), Seq(("med", 1, 2)))
    time("med pass")(med.count())
    time("med pass x2")(med.count())
    val dev = ev.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("value") - col("med")).as("ad"))
    val mad = WeightedQuantiles.byGroup(dev, Seq("event_type"), "ad",
      lit(1L), Seq(("mad", 1, 2)))
    time("med+mad chained")(mad.count())
    val q80 = graft.SparkEntry.queries("q80_mad_outliers")(spark, dir)
    time("q80 full")({ q80.write.format("noop").mode("overwrite").save(); 1L })
    time("q80 full x2")({ q80.write.format("noop").mode("overwrite").save(); 1L })
    // variant: persist the 5-row med/mad frames so downstream branches read
    // a LocalTableScan-equivalent instead of re-planning the whole DAG
    val medP = med.persist()
    medP.count()
    val devP = ev.join(broadcast(medP), "event_type")
      .select(col("event_type"), abs(col("value") - col("med")).as("ad"))
    val madP = WeightedQuantiles.byGroup(devP, Seq("event_type"), "ad",
      lit(1L), Seq(("mad", 1, 2))).persist()
    madP.count()
    val outl = ev.join(broadcast(medP), "event_type")
      .join(broadcast(madP), "event_type")
      .groupBy(col("event_type"))
      .agg(sum(when(abs(col("value") - col("med")) > lit(3) * col("mad"), 1L)
        .otherwise(0L)).as("n_outliers"))
    val outP = medP.join(madP, "event_type").join(outl, "event_type")
    time("persisted variant (post-fit)")(outP.count())
    spark.stop()
  }
}
