package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup
import graft.functions.TextAnalysis

/** Scratch profiler for dedup stages (not part of the engine surface). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables(spark, dir).documentsFanned
    docs.count() // warmup
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    time("tokens explode")(docs.select(explode(TextAnalysis.tokens(col("text")))).count())
    time("shingles explode")(Dedup.shingles(docs, "doc_id", "text").count())
    time("shingles x2")(Dedup.shingles(docs, "doc_id", "text").count())
    val sh = Dedup.shingles(docs, "doc_id", "text")
    time("groupBy(s).count")(sh.groupBy("s").count().count())
    time("collect_set per s")(sh.groupBy("s").agg(collect_set("id")).count())
    locally {
      import org.apache.spark.sql.graft.{Bridge, PairCombinations}
      val grouped = sh.groupBy("s").agg(sort_array(collect_set(col("id"))).as("ids")).filter(size(col("ids")) > 1)
      time("  grouped ids")(grouped.count())
      val pairs = grouped.select(explode(Bridge.column(PairCombinations(Bridge.expression(col("ids"))))).as("p"))
        .select(col("p.da").as("da"), col("p.db").as("db"))
      time("  pairs explode")(pairs.count())
      time("  pairs agg")(pairs.groupBy("da", "db").agg(count(lit(1)).as("inter")).count())
    }
    locally {
      // DuckDB-oracle formulation A/B: equi-self-join on the hashed
      // shingle key + aggregate, instead of collect_set + pair explode
      val sh8 = sh.select(col("id"), xxhash64(col("s")).as("s"))
      val a = sh8.select(col("s"), col("id").as("da"))
      val b = sh8.select(col("s"), col("id").as("db"))
      val joined = a.join(b, "s").filter(col("da") < col("db"))
        .groupBy("da", "db").agg(count(lit(1)).as("inter"))
      time("join-form pairs agg")(joined.count())
      val rep = sh8.repartition(16, col("s"))
      val a2 = rep.select(col("s"), col("id").as("da"))
      val b2 = rep.select(col("s"), col("id").as("db"))
      time("join-form pre-part")(
        a2.join(b2, "s").filter(col("da") < col("db"))
          .groupBy("da", "db").agg(count(lit(1)).as("inter")).count())
    }
    time("jaccardPairs full")(Dedup.jaccardPairs(docs, "doc_id", "text").count())
    time("minhash sigs")(Dedup.minHashSignatures(sh).count())
    time("lsh candidates")(Dedup.lshCandidates(Dedup.minHashSignatures(sh)).count())
    time("minhash full")(Dedup.minHashNearDups(docs, "doc_id", "text").count())
    time("simhash")(Dedup.simHash(docs, "doc_id", "text").count())
    time("simhash pairs")(Dedup.simHashNearDups(Dedup.simHash(docs, "doc_id", "text")).count())
    spark.stop()
  }
}
