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

  test("zOrderKey interleaves bits (known values + inverse recovery)") {
    val s = spark
    import s.implicits._
    val df = Seq((0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535))
      .toDF("x", "y")
    val got = df.select(Layout.zOrderKey($"x", $"y").as("z"))
      .collect().map(_.getLong(0)).toSeq
    // morton(3,5) = x bits at even, y bits at odd:
    // x=011 -> 0b010101 & even mask = 1+4; y=101 -> bits 1,5 odd -> 2+32
    assert(got == Seq(0L, 1L, 2L, 1L + 4L + 2L + 32L, (1L << 32) - 1))
  }

  test("z-ordered write keeps BOTH dimensions' file envelopes tight") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-zorder").toString + "/ds"
    val rnd = new scala.util.Random(7)
    val df = (1 to 20000).map(_ => (rnd.nextInt(1 << 10), rnd.nextInt(1 << 10)))
      .toDF("x", "y")
    Layout.writeZOrdered(df, dir, "x", "y", files = 16, bits = 10)
    assert(spark.read.parquet(dir).count() == 20000)
    // each file must stay tight on BOTH dims: a linear layout on x leaves
    // every file's y envelope spanning the full 1024 range, while Morton
    // slices are (up to sampled-boundary straddle) quadrant boxes. Allow a
    // few straddlers at coarse curve boundaries.
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    val extents = parts.map { f =>
      val r = spark.read.parquet(f)
        .agg(min($"x"), max($"x"), min($"y"), max($"y")).first()
      math.max(r.getInt(1) - r.getInt(0), r.getInt(3) - r.getInt(2))
    }
    val tight = extents.count(_ <= 512)
    assert(tight >= parts.size * 3 / 4,
      s"only $tight/${parts.size} files tight on both dims: $extents")
  }
}
