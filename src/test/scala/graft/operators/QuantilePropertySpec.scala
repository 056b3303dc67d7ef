package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property check: DistributedQuantiles must equal the in-memory sorted
  * reference (`(n-1)*q` two-row interpolation) for arbitrary small inputs —
  * duplicates, negatives, single elements, skewed groups, q at the edges.
  * Spark rounds: each case is a real distributed run at 4 cores.
  */
class QuantilePropertySpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  // pin the DISTRIBUTED paths: every property frame here is tiny, and the
  // small-input-bytes dispatch would otherwise reroute all 30 cases to the
  // driver sorted-collect path (whose equality is covered separately in
  // QuantileDispatchSpec), leaving the two-job arithmetic unexercised
  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.graft.quantiles.smallInputBytes", "0")
  }
  override def afterAll(): Unit = {
    spark.conf.unset("spark.graft.quantiles.smallInputBytes")
    super.afterAll()
  }

  private def referenceQuantile(sorted: Vector[Double], q: Double): Double = {
    val k = (sorted.length - 1).toDouble * q
    val lo = math.floor(k).toInt
    val hi = math.ceil(k).toInt
    val frac = k - math.floor(k)
    sorted(lo) * (1.0 - frac) + sorted(hi) * frac
  }

  test("DistributedQuantiles equals the sorted-vector reference on random data") {
    val s = spark
    import s.implicits._
    val gen: Gen[(List[(String, Double)], Double)] = for {
      groups <- Gen.chooseNum(1, 3)
      rows <- Gen.listOfN(40, for {
        g <- Gen.chooseNum(0, groups - 1).map(i => s"g$i")
        // small value domain forces duplicates; negatives included
        v <- Gen.chooseNum(-5, 8).map(_.toDouble)
      } yield (g, v))
      q <- Gen.oneOf(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    } yield (rows, q)

    (0 until 30).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach {
        case (rows, q) =>
          val df = rows.toDF("g", "v").repartition(5)
          val got = DistributedQuantiles
            .exact(df, Seq("g"), "v", Seq("qv" -> q))
            .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
          val want = rows.groupBy(_._1).map { case (g, rs) =>
            g -> referenceQuantile(rs.map(_._2).sorted.toVector, q)
          }
          assert(got == want, s"seed=$i q=$q rows=$rows")
      }
    }
  }
}
