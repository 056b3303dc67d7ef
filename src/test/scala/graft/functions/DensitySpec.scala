package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DensitySpec extends SparkSpec {

  test("histogram buckets with fixed width and exact counts") {
    val s = spark
    import s.implicits._
    val df = Seq(0.5, 1.5, 1.6, 2.1, 9.9).toDF("v")
    val h = Density.histogram(df, "v", bucketWidth = 1.0)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(3)))
    assert(h.toSeq == Seq((0L, 0.0, 1L), (1L, 1.0, 2L), (2L, 2.0, 1L), (9L, 9.0, 1L)))
  }

  test("kde integrates to ~1 and peaks near the data mode") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(200)(5.0) ++ Seq.fill(50)(9.0)).toDF("v")
    val grid = (0 to 140).map(_ * 0.1).toArray
    val k = Density.kde(df, "v", bandwidth = 0.5, points = grid)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1))
    val integral = k.map(_._2).sum * 0.1
    assert(math.abs(integral - 1.0) < 0.05, s"integral $integral")
    val peak = k.maxBy(_._2)._1
    assert(math.abs(peak - 5.0) < 0.3, s"peak at $peak")
  }
}
