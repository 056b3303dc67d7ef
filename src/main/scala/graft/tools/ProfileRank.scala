package graft.tools

/** Scratch: variance probe for q19/q24 + stage counts. */
object ProfileRank {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    graft.core.Tables(spark, dir).documents.count()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def noop(q: String): Unit =
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    for (r <- 1 to 4) time(s"q19 #$r")(noop("q19_jaccard_pairs"))
    for (r <- 1 to 3) time(s"q24 #$r")(noop("q24_ks_drift"))
    for (r <- 1 to 3) time(s"q25 #$r")(noop("q25_chi2_drift"))
    spark.stop()
  }
}
