package graft.operators

import graft.SparkSpec

class MergeSpec extends SparkSpec {

  private def base = {
    val s = spark
    import s.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "bal")
  }

  test("upserts replace matched rows wholesale and insert unmatched keys") {
    val s = spark
    import s.implicits._
    val upserts = Seq((2L, "B2", 99.0), (5L, "e", 50.0)).toDF("k", "name", "bal")
    val out = Merge.upsertDelete(base, upserts,
      Seq.empty[Long].toDF("k"), "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "B2", 99.0),
      (3L, "c", 30.0), (4L, "d", 40.0), (5L, "e", 50.0)))
  }

  test("delete wins over a concurrent upsert for the same key (tombstone)") {
    val s = spark
    import s.implicits._
    val upserts = Seq((2L, "B2", 99.0)).toDF("k", "name", "bal")
    val deletes = Seq(2L, 4L).toDF("k")
    val out = Merge.upsertDelete(base, upserts, deletes, "k")
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 3L))
  }

  test("column order of the upsert side is immaterial (unionByName)") {
    val s = spark
    import s.implicits._
    val upserts = Seq(("B2", 2L, 99.0)).toDF("name", "k", "bal")
    val out = Merge.upsertDelete(base, upserts,
      Seq.empty[Long].toDF("k"), "k")
      .filter($"k" === 2L).collect().head
    assert(out.getAs[String]("name") == "B2" && out.getAs[Double]("bal") == 99.0)
  }

  test("mismatched upsert schema fails fast") {
    val s = spark
    import s.implicits._
    val bad = Seq((2L, "B2")).toDF("k", "name")
    intercept[IllegalArgumentException] {
      Merge.upsertDelete(base, bad, Seq.empty[Long].toDF("k"), "k")
    }
  }
}
