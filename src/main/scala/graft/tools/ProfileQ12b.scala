package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Scratch: q12's describe with and without the distinct-value pre-collapse
  * (one range shuffle of raw rows vs aggregate exchange + range shuffle).
  */
object ProfileQ12b {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    val dir = "/root/testdata/sf0.1"
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = Tables(spark, dir).lineitem
    li.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val stackArgs = cols.map(c => s"'$c', $c").mkString(", ")
    def melted = li
      .selectExpr(s"stack(${cols.size}, $stackArgs) AS (col_name, v)")
      .filter(col("v").isNotNull)
    val qs = Seq("p25" -> 0.25, "p50" -> 0.50, "p75" -> 0.75)
    for (round <- 1 to 3) {
      time(s"collapse=true  #$round")(graft.operators.DistributedQuantiles
        .describe(melted, Seq("col_name"), "v", qs, Some(4L)).count())
      time(s"collapse=false #$round")(graft.operators.DistributedQuantiles
        .describe(melted, Seq("col_name"), "v", qs, Some(4L),
          preCollapse = false).count())
    }
    spark.stop()
  }
}
