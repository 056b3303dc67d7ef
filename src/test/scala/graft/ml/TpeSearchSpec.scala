package graft.ml

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.TpeSearch.ParamDim

class TpeSearchSpec extends AnyFunSuite {

  private val dims = Seq(
    ParamDim("x", 0.0, 1.0),
    ParamDim("y", 1e-4, 1.0, log = true),
    ParamDim("z", 1, 100, integer = true))

  // smooth unimodal objective with the optimum off-center in each dim
  private def objective(m: Map[String, Double]): Double =
    -(math.pow(m("x") - 0.62, 2)
      + 0.3 * math.pow(math.log10(m("y")) + 2.5, 2)
      + math.pow((m("z") - 37.0) / 100.0, 2))

  test("dims sample within bounds, log dims in log space, ints rounded") {
    val trials = TpeSearch.randomSearch(dims, objective, 200, seed = 1L)
    trials.foreach { t =>
      assert(t.params("x") >= 0.0 && t.params("x") <= 1.0)
      assert(t.params("y") >= 1e-4 && t.params("y") <= 1.0)
      val z = t.params("z")
      assert(z >= 1 && z <= 100 && z == math.round(z).toDouble)
    }
    // log sampling: median of y should be near the geometric middle (1e-2),
    // orders of magnitude below the arithmetic middle (~0.5)
    val ys = trials.map(_.params("y")).sorted
    assert(ys(ys.length / 2) < 0.1)
  }

  test("TPE beats random search at equal trial count (fixed seeds)") {
    val seeds = Seq(11L, 23L, 37L, 51L, 73L)
    val results = seeds.map { s =>
      val tpe = TpeSearch.search(dims, objective, nTrials = 80, seed = s)
        .maxBy(_.score).score
      val rand = TpeSearch.randomSearch(dims, objective, nTrials = 80, seed = s)
        .maxBy(_.score).score
      (tpe, rand)
    }
    val tpeMean = results.map(_._1).sum / results.length
    val randMean = results.map(_._2).sum / results.length
    assert(tpeMean > randMean,
      s"TPE mean best $tpeMean not better than random $randMean ($results)")
    // and never catastrophically worse on any single seed
    results.foreach { case (t, r) =>
      assert(t >= r - 0.01, s"TPE $t far below random $r")
    }
  }

  test("search is deterministic for a fixed seed") {
    val a = TpeSearch.search(dims, objective, 15, seed = 5L)
    val b = TpeSearch.search(dims, objective, 15, seed = 5L)
    assert(a == b)
  }
}
