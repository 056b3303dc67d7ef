package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables

object ProfileQ12 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    val dir = "/root/testdata/sf0.1"
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = Tables(spark, dir).lineitem
    li.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    // variant A: one agg, scalar percentiles (current slow shape)
    val aggsA = cols.flatMap { c => Seq(
      count(col(c)).as(s"n_$c"), avg(col(c)).as(s"mean_$c"),
      stddev_samp(col(c)).as(s"std_$c"), min(col(c)).as(s"vmin_$c"),
      percentile(col(c), lit(0.25)).as(s"p25_$c"),
      percentile(col(c), lit(0.5)).as(s"p50_$c"),
      percentile(col(c), lit(0.75)).as(s"p75_$c"), max(col(c)).as(s"vmax_$c")) }
    time("A one-agg scalar pct")(li.agg(aggsA.head, aggsA.tail: _*).count())
    // variant B: one agg, array percentiles
    val aggsB = cols.flatMap { c => Seq(
      count(col(c)).as(s"n_$c"), avg(col(c)).as(s"mean_$c"),
      stddev_samp(col(c)).as(s"std_$c"), min(col(c)).as(s"vmin_$c"),
      percentile(col(c), array(lit(0.25), lit(0.5), lit(0.75))).as(s"pct_$c"),
      max(col(c)).as(s"vmax_$c")) }
    time("B one-agg array pct")(li.agg(aggsB.head, aggsB.tail: _*).count())
    // variant C: 4 jobs union, array pct
    val un = cols.map { c =>
      li.agg(count(col(c)).as("n"), avg(col(c)).as("mean"),
        stddev_samp(col(c)).as("std"), min(col(c)).as("vmin"),
        percentile(col(c), array(lit(0.25), lit(0.5), lit(0.75))).as("pct"),
        max(col(c)).as("vmax")).select(lit(c).as("col_name"), col("*"))
    }.reduce(_ union _)
    time("C union array pct")(un.count())
    // variant D: approx_percentile high accuracy (NOT exact; timing only)
    val aggsD = cols.flatMap { c => Seq(
      percentile_approx(col(c), array(lit(0.25), lit(0.5), lit(0.75)), lit(100000)).as(s"pa_$c")) }
    time("D one-agg approx pct")(li.agg(aggsD.head, aggsD.tail: _*).count())
    time("B again")(li.agg(aggsB.head, aggsB.tail: _*).count())
    locally {
      import org.apache.spark.sql.types._
      val cols2 = cols
      val aggsE = cols2.flatMap { c => Seq(
        count(col(c)).as(s"n_$c"),
        avg(col(c)).cast("float").as(s"mean_$c"),
        stddev_samp(col(c)).cast("float").as(s"std_$c"),
        min(col(c)).as(s"vmin_$c"),
        percentile(col(c), lit(0.25)).cast("float").as(s"p25_$c"),
        percentile(col(c), lit(0.50)).cast("float").as(s"p50_$c"),
        percentile(col(c), lit(0.75)).cast("float").as(s"p75_$c"),
        max(col(c)).as(s"vmax_$c")) }
      time("E agg+casts")(li.agg(aggsE.head, aggsE.tail: _*).count())
      val stackArgs = cols2.map { c =>
        s"'$c', n_$c, mean_$c, std_$c, vmin_$c, p25_$c, p50_$c, p75_$c, vmax_$c"
      }.mkString(", ")
      val stacked = li.agg(aggsE.head, aggsE.tail: _*)
        .selectExpr(s"stack(4, $stackArgs) AS (col_name, n, mean, std, vmin, p25, p50, p75, vmax)")
      time("F agg+casts+stack")(stacked.count())
      time("G +orderBy")(stacked.orderBy(col("col_name")).count())
      stacked.explain("formatted")
    }
    time("exact q12 #1")(graft.SparkEntry.queries("q12_summary_stats")(spark, dir).count())
    time("exact q12 #2")(graft.SparkEntry.queries("q12_summary_stats")(spark, dir).count())
    time("exact q21 #1")(graft.SparkEntry.queries("q21_simhash_neardups")(spark, dir).count())
    time("exact q21 #2")(graft.SparkEntry.queries("q21_simhash_neardups")(spark, dir).count())
    spark.stop()
  }
}
