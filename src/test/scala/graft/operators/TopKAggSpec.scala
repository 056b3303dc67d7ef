package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Bridge, TopKByAgg}

import graft.SparkSpec

class TopKAggSpec extends SparkSpec {

  private def topk(ord: Column, id: Column, k: Int): Column =
    Bridge.column(TopKByAgg(Bridge.expression(ord), Bridge.expression(id), k)
      .toAggregateExpression())

  test("heap aggregate equals the window-rank top-k, ties to lower id") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    // duplicate ord values force the tie-break path
    val df = (1 to 5000).map(i => (s"g${i % 7}", rnd.nextInt(40).toDouble, i.toLong))
      .toDF("g", "v", "id")

    val viaHeap = df.groupBy($"g").agg(topk($"v", $"id", 5).as("t"))
      .select($"g", posexplode($"t").as(Seq("pos", "e")))
      .select($"g", $"e.id".as("id"), ($"pos" + 1).as("rn"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet

    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5).select($"g", $"id", $"rn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet

    assert(viaHeap == viaWindow)
  }

  test("groups smaller than k return all rows in rank order") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1.0, 1L), ("a", 3.0, 2L)).toDF("g", "v", "id")
    val r = df.groupBy($"g").agg(topk($"v", $"id", 10).as("t"))
      .select(explode($"t").as("e")).select($"e.id")
      .collect().map(_.getLong(0)).toSeq
    assert(r == Seq(2L, 1L))
  }
}
