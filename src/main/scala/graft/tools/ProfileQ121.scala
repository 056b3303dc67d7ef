package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level timing probe for q121's chain (debug aid, mirrors the house
  * Profile* drivers): edge generation vs dispatch vs total.
  */
object ProfileQ121 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(cores = 32, appName = "prof121")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t = graft.core.Tables(spark, sfDir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 3).foreach { rep =>
      println(s"-- rep $rep")
      val urg = time("urg count") {
        val u = t.lineitem
          .join(t.orders.filter($"o_orderpriority" === "1-URGENT")
            .select($"o_orderkey"), $"l_orderkey" === $"o_orderkey")
          .select($"l_orderkey", $"l_partkey")
        u.count(); u
      }
      val edges = graft.operators.GraphOps.coOccurrenceEdges(
        urg, "l_orderkey", "l_partkey", distinctPairs = false)
      val collected = time("edges collect") { edges.collect() }
      println(s"PROF edges rows: ${collected.length}")
      // fine-grained: replicate triangleCounts' driver path step by step
      val e = edges.select($"src".cast("long").as("src"),
          $"dst".cast("long").as("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("e.count") { e.count() }
      val rows = time("e.collect") { e.collect() }
      time("dedupe+maps") {
        rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length
      }
      e.unpersist()
      val tri = time("triangleCounts op") {
        graft.operators.GraphOps.triangleCounts(edges, edgesDistinct = false)
      }
      time("topk collect") {
        tri.select($"node".as("part_id"), $"tri_cnt")
          .orderBy($"tri_cnt".desc, $"part_id").limit(20)
          .collect()
      }
      time("full q121") {
        graft.SparkEntry.queries("q121_triangle_counts")(spark, sfDir).collect()
      }
    }
    spark.stop()
  }
}
