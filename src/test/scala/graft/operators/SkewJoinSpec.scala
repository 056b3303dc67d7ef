package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {

  test("salted join equals the plain join and spreads the hot key") {
    val s = spark
    import s.implicits._
    // 20k rows of one hot key + a tail of 100 cold keys
    val left = ((1 to 20000).map(i => (1L, s"hot$i")) ++
      (1 to 100).map(i => (100L + i, s"cold$i")))
      .toDF("k", "payload").repartition(8)
    val right = ((1L to 250L).map(k => (k, s"dim$k"))).toDF("k", "dim")

    val plain = left.join(right, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val salted = SkewJoin.saltedEquiJoin(left, right, Seq("k"), salt = 16)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(salted.length == 20100)
    assert(salted.sameElements(plain))

    // the hot key's rows actually spread across salts
    val saltSpread = left.filter($"k" === 1L)
      .withColumn("__salt", pmod(hash(left.columns.map(col): _*), lit(16)))
      .select("__salt").distinct().count()
    assert(saltSpread >= 12, s"hot key landed on only $saltSpread salts")

    // outer semantics survive salting: unmatched left rows keep one row
    val leftOuter = SkewJoin.saltedEquiJoin(
      left.withColumn("k", $"k" + 1000), right, Seq("k"), salt = 4,
      joinType = "left")
    assert(leftOuter.count() == 20100)
    assert(leftOuter.filter($"dim".isNull).count() == 20100)
  }
}
