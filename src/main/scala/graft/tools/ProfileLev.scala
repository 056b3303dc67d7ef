package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolate the cost of levenshtein evaluation vs the surrounding plan. */
object ProfileLev {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession
      .configure(SparkSession.builder().master("local[32]"),
        shufflePartitions = 4)
      .getOrCreate()
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    // 1M synthetic 18-char pairs, cached, 32 partitions
    val pairs = spark.range(1000000L)
      .select(
        concat(lit("Customer#"), lpad(($"id" % 15000).cast("string"), 9, "0")).as("a"),
        concat(lit("Customer#"), lpad((($"id" + 7) % 15000).cast("string"), 9, "0")).as("b"))
      .repartition(32)
      .persist()
    pairs.count()

    for (_ <- 1 to 3) {
      time("levenshtein 1M (32 parts)") {
        pairs.select(levenshtein($"a", $"b")).filter(col("levenshtein(a, b)") <= 1).count()
      }
      time("levenshtein 1M threshold=2") {
        pairs.select(levenshtein($"a", $"b", 2).as("d")).filter($"d" <= 1).count()
      }
      time("length-only 1M") {
        pairs.select((length($"a") - length($"b")).as("d")).filter($"d" === 0).count()
      }
    }
    val four = pairs.coalesce(4).persist(); four.count()
    for (_ <- 1 to 2)
      time("levenshtein 1M (4 parts)") {
        four.select(levenshtein($"a", $"b").as("d")).filter($"d" <= 1).count()
      }
    spark.stop()
  }
}
