package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactionSpec extends SparkSpec {

  test("compaction collapses a many-file dataset, preserves rows, swaps atomically") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-compact").toString + "/ds"
    // simulate per-batch ingestion: 20 tiny appends
    (1 to 20).foreach { b =>
      (1 to 50).map(i => (b * 1000L + i, s"row $b-$i"))
        .toDF("id", "payload")
        .repartition(2)
        .write.mode("append").parquet(dir)
    }
    val before = spark.read.parquet(dir)
    val beforeRows = before.collect().map(_.getLong(0)).sorted
    assert(beforeRows.length == 1000)

    val result = Compaction.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(result.filesBefore >= 20, s"expected many input files: $result")
    assert(result.filesAfter == 1, s"expected one output file: $result")

    val after = spark.read.parquet(dir)
    assert(after.collect().map(_.getLong(0)).sorted.sameElements(beforeRows))
    assert(after.schema == before.schema)

    // idempotent: compacting compacted data keeps the single file
    val again = Compaction.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(again.filesBefore == 1 && again.filesAfter == 1)
    // no temp/old dirs left behind
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(parent.toSeq == Seq("ds"), parent.mkString(","))
  }
}
