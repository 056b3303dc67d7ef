package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  test("clustered write yields near-disjoint per-file key envelopes") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-layout").toString + "/ds"
    val rnd = new scala.util.Random(3)
    val df = (1 to 20000).map(_ => (rnd.nextInt(1000000), rnd.nextInt(10)))
      .toDF("k", "other")
    Layout.writeClustered(df, dir, Seq("k"), files = 8)

    // rows survive
    assert(spark.read.parquet(dir).count() == 20000)

    // per-file [min, max] envelopes must not overlap (boundary duplicates
    // aside) — the property min/max pruning needs
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    assert(parts.size == 8, s"expected 8 files, got ${parts.size}")
    val envelopes = parts.map { f =>
      val r = spark.read.parquet(f).agg(min($"k"), max($"k")).first()
      (r.getInt(0), r.getInt(1))
    }.sortBy(_._1)
    envelopes.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping envelopes: $envelopes")
      case _ =>
    }

    // a selective range filter prunes at the row-group level: the scan of
    // one envelope's range must read far fewer rows than the full table
    val (lo, hi) = envelopes.head
    val pruned = spark.read.parquet(dir).filter($"k" >= lo && $"k" <= hi)
    // one file's worth of rows, not the table: the range sampler balances
    // within a few percent, not to the row (seen 2368 vs ideal 2500 when
    // suite ordering shifted the sampler's RDD-id-derived seed)
    val n = pruned.count()
    assert(n >= 20000 / 16 && n <= 20000 / 4, s"pruned scan read $n rows")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(k), GreaterThanOrEqual(k,"),
      s"filters not pushed:\n$plan")
  }
}
