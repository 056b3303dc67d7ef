package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed co-located joins must actually eliminate the shuffle — the
  * point of paying the bucketed write. Asserted on the executed plan, not
  * just the result.
  */
class BucketingSpec extends SparkSpec {

  test("same-bucketed tables join with no exchange on either side") {
    val s2 = spark
    import s2.implicits._
    // the catalog is in-memory per JVM but the warehouse dir persists:
    // drop any stale table AND its orphaned location from a previous run
    Seq("bkt_lineitem", "bkt_orders").foreach { tb =>
      spark.sql(s"DROP TABLE IF EXISTS $tb")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      val dir = java.nio.file.Paths.get(wh, tb)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    val t = graft.core.Tables(spark, sf("sf0.001"))
    Bucketing.writeBucketed(
      t.lineitem.select("l_orderkey", "l_extendedprice", "l_quantity"),
      "bkt_lineitem", buckets = 8, keyCols = Seq("l_orderkey"))
    Bucketing.writeBucketed(
      t.orders.select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
      "bkt_orders", buckets = 8, keyCols = Seq("l_orderkey"))

    val joined = Bucketing.coLocatedJoin(spark, "bkt_lineitem", "bkt_orders",
      Seq("l_orderkey"))
      .groupBy("l_orderkey")
      .agg(sum($"l_extendedprice").as("rev"), max($"o_totalprice").as("tot"))

    val n = joined.count()
    assert(n > 0)
    // every lineitem row matches exactly one order
    assert(Bucketing.coLocatedJoin(spark, "bkt_lineitem", "bkt_orders",
      Seq("l_orderkey")).count() == t.lineitem.count())

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself (and the groupBy on the same key) must not shuffle:
    // the only acceptable exchange is none at all before the join
    assert(!plan.contains("Exchange hashpartitioning"),
      s"co-located join still shuffles:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"),
      s"no join operator found:\n$plan")
    assert(plan.toLowerCase.contains("bucketed: true"),
      s"scan not bucketed:\n$plan")
  }
}
