package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WeightedQuantilesSpec extends SparkSpec {

  test("weighted median: smallest value whose cum weight reaches half") {
    val s = spark
    import s.implicits._
    // group a: weights 1,1,6 on values 10,20,30 -> total 8; cum(10)=1,
    // cum(20)=2, cum(30)=8; first value with cum*2 >= 8 is 30.
    // group b: uniform weights -> plain lower median of 1,2,3,4 = 2.
    val df = Seq(
      ("a", 10.0, 1L), ("a", 20.0, 1L), ("a", 30.0, 6L),
      ("b", 1.0, 1L), ("b", 2.0, 1L), ("b", 3.0, 1L), ("b", 4.0, 1L)
    ).toDF("g", "v", "w")
    val r = WeightedQuantiles.byGroup(df, Seq("g"), "v", col("w"),
        Seq(("p50", 1, 2)))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r == Map("a" -> 30.0, "b" -> 2.0))
  }

  test("tie values share cumulative weight (RANGE semantics)") {
    val s = spark
    import s.implicits._
    // value 5 appears twice with weights 3 and 4: cumulative weight AT 5
    // is 7 of 10 for both rows — the quartile decisions must see the
    // combined mass, matching SQL's default RANGE window frame.
    val df = Seq(("g", 5.0, 3L), ("g", 5.0, 4L), ("g", 9.0, 3L))
      .toDF("g", "v", "w")
    val r = WeightedQuantiles.byGroup(df, Seq("g"), "v", col("w"),
        Seq(("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4)))
      .collect().head
    assert(r.getDouble(1) == 5.0 && r.getDouble(2) == 5.0)
    // p75: cum(5)*4 = 28 < 30 = 10*3 -> needs 9
    assert(r.getDouble(3) == 9.0)
  }

  test("all four dispatches agree: hint, byte gate, rdd two-job, declarative") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, spark_partition_id}
    val rnd = new scala.util.Random(11)
    val df = Seq.tabulate(4000) { i =>
      (s"g${i % 5}", math.floor(rnd.nextDouble() * 40) / 4.0,
        1L + rnd.nextInt(7))
    }.toDF("g", "v", "w").repartition(9)
    val qs = Seq(("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4))
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => x.getString(0) ->
        (x.getDouble(1), x.getDouble(2), x.getDouble(3))).toMap
    val viaHint = norm(WeightedQuantiles.byGroup(df, Seq("g"), "v",
      col("w"), qs, distinctValueHint = Some(1000L)))
    val viaByteGate = norm(WeightedQuantiles.byGroup(df, Seq("g"), "v",
      col("w"), qs))
    val base = df.select(col("g"), col("v").cast("double").as("v"),
      col("w").as("__w"))
    val viaRdd = norm(WeightedQuantiles.viaRddTwoJob(base, Seq("g"), "v", qs))
    val viaDecl = norm(WeightedQuantiles.declarative(
      base.repartitionByRange(col("g"), col("v"))
        .withColumn("__pid", spark_partition_id()),
      Seq("g"), "v", qs))
    assert(viaHint == viaByteGate)
    assert(viaHint == viaRdd)
    assert(viaHint == viaDecl)
  }

  test("matches the SQL window formulation on random data, any partitioning") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(500) { i =>
      (s"g${i % 7}", math.floor(rnd.nextDouble() * 50) / 2.0,
        1L + rnd.nextInt(9))
    }
    for (parts <- Seq(1, 13)) {
      val df = rows.toDF("g", "v", "w").repartition(parts)
      df.createOrReplaceTempView("wq_in")
      val expect = s.sql(
        """SELECT g,
          |  min(CASE WHEN cw * 2 >= w THEN v END) AS p50
          |FROM (SELECT g, v,
          |    sum(w) OVER (PARTITION BY g ORDER BY v) AS cw,
          |    sum(w) OVER (PARTITION BY g) AS w
          |  FROM wq_in) GROUP BY g""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = WeightedQuantiles.byGroup(df, Seq("g"), "v", col("w"),
          Seq(("p50", 1, 2)))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == expect, s"parts=$parts")
    }
  }
}
