package graft.drift

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PsiSpec extends SparkSpec {

  private def psiOf(rows: Seq[(Double, Boolean)], bins: Int = 10): Double = {
    val s = spark
    import s.implicits._
    val df = rows.toDF("v", "cur")
    val out = Psi.binned(df, "v", $"cur", bins).orderBy(desc("bin")).first()
    out.getAs[Float]("psi_cum").toDouble
  }

  test("identical distributions give PSI 0") {
    val vals = (0 until 200).map(i => (i % 100).toDouble)
    val rows = vals.map((_, true)) ++ vals.map((_, false))
    assert(psiOf(rows) == 0.0)
  }

  test("a shifted distribution scores above the 0.25 action threshold") {
    val cur = (0 until 500).map(i => ((i % 50) + 50.0, true))
    val ref = (0 until 500).map(i => ((i % 50).toDouble, false))
    assert(psiOf(cur ++ ref) > 0.25)
  }

  test("bins empty on one side clamp to eps and stay finite") {
    // current occupies only the top bin, reference only the bottom —
    // every occupied bin has a zero count on the other side
    val rows = Seq.fill(50)((99.0, true)) ++ Seq.fill(50)((1.0, false))
    val p = psiOf(rows)
    assert(!p.isNaN && !p.isInfinite && p > 1.0)
  }

  test("matches a driver-side replay of the definition") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(1000)((rnd.nextInt(100).toDouble, rnd.nextBoolean()))
    val lo = rows.map(_._1).min; val hi = rows.map(_._1).max
    val width = (hi - lo) / 10
    val byBin = rows.groupBy { case (v, _) =>
      math.min(math.floor((v - lo) / width), 9).toLong }
    val nCur = rows.count(_._2).toDouble
    val nRef = rows.size - nCur
    val expected = byBin.toSeq.sortBy(_._1).map { case (_, rs) =>
      val pc = math.max(rs.count(_._2) / nCur, 1e-6)
      val pr = math.max(rs.count(!_._2) / nRef, 1e-6)
      (pc - pr) * math.log(pc / pr)
    }.sum
    assert(math.abs(psiOf(rows) - expected) < 1e-6)
  }
}
