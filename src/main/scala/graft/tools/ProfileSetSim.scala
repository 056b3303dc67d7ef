package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Dedup, SetSimilarity}

/** Stage-wise q94 breakdown: shingling, document frequencies, prefix
  * ranking, candidate generation, exact verification.
  */
object ProfileSetSim {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession
      .configure(org.apache.spark.sql.SparkSession.builder()
        .master("local[32]"), shufflePartitions = 4)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.graft.fanout", "16")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.core.Tables(spark, sfDir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    (1 to 3).foreach { rep =>
      println(s"rep $rep")
      val df = t.documentsFanned
      val sets = df.select(col("doc_id").as("id"),
          TextAnalysis.wordShingles(col("text"), 3).as("shs"))
        .withColumn("n", size(col("shs")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("sets materialize")(sets.count())
      val postings = sets
        .select(col("id"), col("n"), explode(col("shs")).as("__s"))
        .select(col("id"), col("n"), xxhash64(col("__s")).as("s"))
      println(s"  postings=${time("postings count")(postings.count())}")
      val freq = postings.groupBy("s").agg(count(lit(1)).as("df"))
      println(s"  distinct shingles=${time("freq count")(freq.count())}")
      val prefLen = col("n") -
        ((lit(7) * col("n") + lit(10) - 1) / lit(10)).cast("int") + lit(1)
      val w = Window.partitionBy("id").orderBy(col("df"), col("s"))
      val prefix = postings.join(freq, "s")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= prefLen)
        .select(col("id"), col("s"))
      println(s"  prefix postings=${time("prefix count")(prefix.count())}")
      val cand = time("cand build") {
        val c = SetSimilarity.prefixJaccardPairs(df, "doc_id", "text", 3, 7, 10)
        c
      }
      time("full q94 noop")(
        cand.write.format("noop").mode("overwrite").save())
      // candidate-volume A/B: the full inverted index generates one
      // candidate per shingle-sharing pair; the prefix index only for
      // pairs sharing a RAREST-prefix shingle — the quadratic-step cut
      // that is the operator's reason to exist
      if (rep == 1) {
        val fullCand = Dedup.jaccardPairs(df, "doc_id", "text", 3).count()
        val prefCand = SetSimilarity.prefixCandidates(sets, 7, 10).count()
        println(s"  candidates: full-index=$fullCand prefix=$prefCand " +
          f"(${100.0 * prefCand / math.max(fullCand, 1)}%.1f%%)")
      }
      sets.unpersist()
    }
    spark.stop()
  }
}
