package graft.ml

import scala.util.Random

/** Tree-structured Parzen Estimator search, lite (SURVEY.md §2.8 M8).
  *
  * The reference tunes with Optuna's TPE sampler over 50 trials
  * (churn_model_training.py:277-289). This is the public-knowledge sketch of
  * that algorithm (Bergstra et al., "Algorithms for Hyper-Parameter
  * Optimization", NeurIPS 2011) behind the same `objective(params) → score,
  * argmax` contract as random search:
  *
  *   - first `nStartup` trials sample uniformly;
  *   - afterwards, split history at the γ-quantile into good/bad sets, fit
  *     a 1-D Gaussian KDE per dimension on each set (independent dims —
  *     the "lite" part; Optuna's default is also univariate), and propose
  *     from the GOOD kde. With nCandidates > 1 the proposal is the
  *     candidate maximizing the density ratio l(x)/g(x) (classic TPE EI
  *     argmax); the DEFAULT is nCandidates = 1 — a plain draw from l —
  *     because on deterministic objectives the EI argmax structurally
  *     re-proposes the densest already-evaluated point and wastes trials
  *     on duplicates (measured: argmax-24 lost to random search on a
  *     smooth 3-dim objective at 80 trials; sample-from-l beats it on
  *     every tested seed).
  *
  * Driver-side only: each trial's objective is itself a distributed job
  * (cross-validated fit), so the search loop adds nothing to cluster load.
  */
object TpeSearch {

  /** One search dimension over [lo, hi]; `log` samples in log space (the
    * KDE also operates there); `integer` rounds the emitted value.
    */
  final case class ParamDim(name: String, lo: Double, hi: Double,
      log: Boolean = false, integer: Boolean = false) {
    require(hi > lo && (!log || lo > 0), s"bad bounds for $name")
    private[TpeSearch] def toInternal(x: Double): Double =
      if (log) math.log(x) else x
    private[TpeSearch] def fromInternal(z: Double): Double = {
      val x = if (log) math.exp(z) else z
      val c = math.max(lo, math.min(hi, x))
      if (integer) math.round(c).toDouble else c
    }
    private[TpeSearch] def sampleUniform(rnd: Random): Double = {
      val (a, b) = (toInternal(lo), toInternal(hi))
      fromInternal(a + rnd.nextDouble() * (b - a))
    }
  }

  final case class Trial(params: Map[String, Double], score: Double)

  /** Gaussian-KDE log-density at z over centers (internal space), mixed
    * with a uniform prior component of weight 1 over the dimension span —
    * Optuna's guard against early over-exploitation: density (and sampling
    * mass) never vanishes anywhere in the domain, so a lucky-but-mediocre
    * startup trial can't trap the search.
    */
  private def logKde(z: Double, centers: Array[Double], bw: Double,
      span: Double): Double = {
    var acc = 0.0
    var i = 0
    while (i < centers.length) {
      val u = (z - centers(i)) / bw
      acc += math.exp(-0.5 * u * u) / (bw * math.sqrt(2 * math.Pi))
      i += 1
    }
    acc += 1.0 / span // the uniform prior pseudo-center
    math.log(math.max(acc / (centers.length + 1), Double.MinPositiveValue))
  }

  /** Scott's-rule-ish bandwidth with Optuna's "magic clip" floor: while a
    * set holds few points the kernels stay wide (span/(n+2) — candidates
    * explore), narrowing as evidence accumulates; a degenerate set (all
    * equal) still proposes diverse candidates.
    */
  private def bandwidth(centers: Array[Double], dim: ParamDim,
      totalN: Int): Double = {
    val n = centers.length
    val mean = centers.sum / n
    val sd = math.sqrt(centers.map(c => (c - mean) * (c - mean)).sum / n)
    val span = dim.toInternal(dim.hi) - dim.toInternal(dim.lo)
    math.max(1.06 * sd * math.pow(n.toDouble, -0.2),
      span / math.min(100.0, totalN + 2.0))
  }

  /** Maximize `objective` over `dims` in `nTrials` evaluations; returns
    * every trial (argmax = `.maxBy(_.score)`).
    */
  def search(dims: Seq[ParamDim], objective: Map[String, Double] => Double,
      nTrials: Int, seed: Long = 42L, nStartup: Int = 5, gamma: Double = 0.25,
      nCandidates: Int = 1, explorationRate: Double = 0.25): Seq[Trial] = {
    val rnd = new Random(seed)
    val history = scala.collection.mutable.ArrayBuffer[Trial]()
    for (t <- 0 until nTrials) {
      // explorationRate of the post-startup trials stay uniform: the KDE
      // bandwidths shrink as evidence accumulates, so without a standing
      // exploration mix the sampler can drill a startup-era local basin
      // forever (observed: best-found frozen between trial 40 and 80)
      val params: Map[String, Double] =
        if (t < nStartup || rnd.nextDouble() < explorationRate)
          dims.map(d => d.name -> d.sampleUniform(rnd)).toMap
        else {
          val sorted = history.sortBy(-_.score)
          val nGood = math.max(1, math.ceil(gamma * sorted.length).toInt)
          val (good, bad) = sorted.splitAt(nGood)
          dims.map { d =>
            val lo = d.toInternal(d.lo)
            val hi = d.toInternal(d.hi)
            val span = hi - lo
            val gc = good.map(tr => d.toInternal(tr.params(d.name))).toArray
            val bc = bad.map(tr => d.toInternal(tr.params(d.name))).toArray
            val gBw = bandwidth(gc, d, history.length)
            val bBw = if (bc.isEmpty) gBw else bandwidth(bc, d, history.length)
            // candidates from the good KDE (incl. its uniform-prior
            // component); keep argmax l(x)/g(x)
            val best = (0 until nCandidates).map { _ =>
              val z =
                if (rnd.nextInt(gc.length + 1) == gc.length)
                  lo + rnd.nextDouble() * span // prior component
                else gc(rnd.nextInt(gc.length)) + rnd.nextGaussian() * gBw
              val zc = math.max(lo, math.min(hi, z))
              val ratio = logKde(zc, gc, gBw, span) -
                (if (bc.isEmpty) 0.0 else logKde(zc, bc, bBw, span))
              (ratio, zc)
            }.maxBy(_._1)._2
            d.name -> d.fromInternal(best)
          }.toMap
        }
      history += Trial(params, objective(params))
    }
    history.toSeq
  }

  /** Pure random search over the same space — the baseline contract (and
    * the comparison anchor in TpeSearchSpec).
    */
  def randomSearch(dims: Seq[ParamDim], objective: Map[String, Double] => Double,
      nTrials: Int, seed: Long = 42L): Seq[Trial] = {
    val rnd = new Random(seed)
    (0 until nTrials).map { _ =>
      val params = dims.map(d => d.name -> d.sampleUniform(rnd)).toMap
      Trial(params, objective(params))
    }
  }
}
