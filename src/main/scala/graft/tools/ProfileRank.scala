package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch: q12 with vs without fan-out of the melt input. */
object ProfileRank {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val tbl = graft.core.Tables(spark, dir)
    tbl.lineitem.count()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val stackArgs = cols.map(c => s"'$c', $c").mkString(", ")
    def q12(fan: Boolean): DataFrame = {
      val li =
        if (fan) tbl.fanOut(tbl.lineitem.select(cols.map(col): _*))
        else tbl.lineitem
      val melted = li
        .selectExpr(s"stack(${cols.size}, $stackArgs) AS (col_name, v)")
        .filter($"v".isNotNull)
      graft.operators.DistributedQuantiles
        .describe(melted, Seq("col_name"), "v",
          Seq("p25" -> 0.25, "p50" -> 0.50, "p75" -> 0.75))
        .orderBy($"col_name")
    }
    for (r <- 1 to 3) {
      time(s"plain #$r")(noop(q12(fan = false)))
      time(s"fanned #$r")(noop(q12(fan = true)))
    }
    spark.stop()
  }
}
