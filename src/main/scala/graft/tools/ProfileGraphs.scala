package graft.tools

import org.apache.spark.sql.functions._

/** Break down q92/q93 wall time: edge construction, driver collect, the
  * in-memory walk, and the result re-materialization — under the same
  * session shape as graft.Bench.
  */
object ProfileGraphs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession
      .configure(org.apache.spark.sql.SparkSession.builder()
        .master("local[32]"), shufflePartitions = 4)
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t = graft.core.Tables(spark, sfDir)
    t.orders.count()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    (1 to 3).foreach { rep =>
      println(s"rep $rep")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      val e0 = t.orders
        .select($"o_orderkey", $"o_custkey", $"o_orderdate")
        .withColumn("nxt", lead($"o_orderkey", 1).over(w))
        .filter($"nxt".isNotNull)
        .select($"o_orderkey".as("src"), $"nxt".as("dst"))
      val edges = e0.union(e0.select($"dst".as("src"), $"src".as("dst")))
        .persist()
      time("edges count (materialize)")(edges.count())
      val collected = time("edges collect")(edges.collect())
      val seeds = time("seeds collect")(
        t.orders.filter($"o_orderpriority" === "1-URGENT")
          .select($"o_orderkey".as("node")).distinct().collect())
      println(s"  edges=${collected.length} seeds=${seeds.length}")
      val pairs = time("driver bfs") {
        val adj = new java.util.HashMap[Long, java.util.ArrayList[Long]]()
        collected.foreach { r =>
          adj.computeIfAbsent(r.getLong(0), _ => new java.util.ArrayList[Long]())
            .add(r.getLong(1))
        }
        val hop = new java.util.HashMap[Long, Int]()
        var frontier = seeds.map(_.getLong(0)).toSeq
        frontier.foreach(hop.put(_, 0))
        var h = 0
        while (frontier.nonEmpty && h < 6) {
          h += 1
          val next = scala.collection.mutable.ArrayBuffer.empty[Long]
          frontier.foreach { u =>
            val ns = adj.get(u)
            if (ns != null) {
              val it = ns.iterator()
              while (it.hasNext) {
                val v = it.next()
                if (!hop.containsKey(v)) { hop.put(v, h); next += v }
              }
            }
          }
          frontier = next.toSeq
        }
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
        hop.forEach((k, v) => buf += ((k, v)))
        buf
      }
      val df = time("toDF")(pairs.toSeq.toDF("node", "hop"))
      time("agg + noop write")(
        df.groupBy($"hop").agg(count(lit(1)).as("cnt"))
          .select($"hop".cast("long"), $"cnt")
          .repartition(1).sortWithinPartitions($"hop")
          .write.format("noop").mode("overwrite").save())
      edges.unpersist()
    }
    spark.stop()
  }
}
