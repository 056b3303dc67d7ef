package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShardingSpec extends SparkSpec {

  private def corpus = spark.read.parquet(s"${sf()}/documents.parquet")

  test("writeShards round-trips: written files reproduce the manifest") {
    val out = Files.createTempDirectory("graft-shards").toString + "/ds"
    val m = Sharding.writeShards(corpus, "doc_id", out, n = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(m.map(_._1).sorted.toSeq == Seq(0, 1, 2, 3))
    assert(m.map(_._2).sum == corpus.count())
    // shard directories exist and partition count matches
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.toSeq == Seq("shard=0", "shard=1", "shard=2", "shard=3"))
    // consumer-side verify agrees
    val s = spark
    import s.implicits._
    val expected = m.toSeq.toDF("shard", "n_rows", "checksum")
    assert(Sharding.verify(spark, out, "doc_id", expected))
  }

  test("assignment is stable: a re-export has identical shard membership") {
    val a = Sharding.assign(corpus, "doc_id", 8)
      .select("doc_id", "shard").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val b = Sharding.assign(corpus.orderBy(desc("doc_id")), "doc_id", 8)
      .select("doc_id", "shard").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a == b)
  }

  test("a dropped part file is caught by verify") {
    val out = Files.createTempDirectory("graft-shards2").toString + "/ds"
    val m = Sharding.writeShards(corpus, "doc_id", out, n = 4)
    val expected = m // lazy plan over the input — recomputable
    // tear the copy: delete one shard's data file
    val victim = new java.io.File(out + "/shard=2").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(victim.delete())
    assert(!Sharding.verify(spark, out, "doc_id", expected))
  }

  test("checksum is order-independent but content-sensitive") {
    val s = spark
    import s.implicits._
    val base = Seq(1L, 2L, 3L, 4L).toDF("k")
    val perm = Seq(4L, 3L, 2L, 1L).toDF("k")
    val changed = Seq(1L, 2L, 3L, 5L).toDF("k")
    def sig(df: org.apache.spark.sql.DataFrame) =
      Sharding.manifest(Sharding.assign(df, "k", 2), "k")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(sig(base) == sig(perm))
    assert(sig(base) != sig(changed))
  }
}
