package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.churn.ChurnSchema
import graft.drift.KsTest
import graft.metrics.MetricNames

/** Property-based invariants (SURVEY.md §5.2.4). Driver-side only — the
  * properties concern pure kernels (normalization, metric math, p-value
  * machinery); distributed behavior is covered by the suite's Spark specs.
  * Deterministic sampling (fixed seeds) via raw ScalaCheck generators.
  */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(
      f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))

  private def forAll[A, B, C, D](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D])(
      f: (A, B, C, D) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc, gd))(t => f(t._1, t._2, t._3, t._4))

  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  private val headerGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '), Gen.const('_')))
      .map(_.mkString)

  test("normalizeColumnName is idempotent") {
    forAll(headerGen) { s =>
      val once = ChurnSchema.normalizeColumnName(s)
      assert(ChurnSchema.normalizeColumnName(once) == once)
    }
  }

  test("normalizeColumnName output has no spaces and no uppercase") {
    forAll(headerGen) { s =>
      val n = ChurnSchema.normalizeColumnName(s)
      assert(!n.contains(' '))
      assert(n == n.toLowerCase)
    }
  }

  test("metric-name simplification is lowercase and stable under re-simplify") {
    val idGen = for {
      base <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
      col <- Gen.option(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))
    } yield col.fold(s"$base()")(c => s"$base(column=$c)")
    forAll(idGen) { id =>
      val s = MetricNames.simplify(id)
      assert(s == s.toLowerCase)
      assert(MetricNames.simplify(s) == s)
    }
  }

  test("F1 from counts is bounded by [0,1] and by precision/recall") {
    val cnt = Gen.choose(0L, 100000L)
    forAll(cnt, cnt, cnt) { (tp, fp, fn) =>
      whenever(tp + fp > 0 && tp + fn > 0 && 2 * tp + fp + fn > 0) {
        val p = tp.toDouble / (tp + fp)
        val r = tp.toDouble / (tp + fn)
        val f1 = 2.0 * tp / (2 * tp + fp + fn)
        assert(f1 >= 0.0 && f1 <= 1.0)
        assert(f1 <= math.max(p, r) + 1e-12)
        assert(f1 + 1e-12 >= math.min(p, r) * math.min(p, r) /
          math.max(math.max(p, r), 1e-300)) // weak harmonic bound
      }
    }
  }

  test("Kolmogorov survival is a valid decreasing tail probability") {
    forAll(Gen.choose(0.0, 5.0), Gen.choose(0.0, 5.0)) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val sLo = KsTest.kolmogorovSurvival(lo)
      val sHi = KsTest.kolmogorovSurvival(hi)
      assert(sLo >= 0.0 && sLo <= 1.0)
      assert(sHi <= sLo + 1e-9)
    }
  }

  test("KS p-value is in [0,1] and decreases with the statistic") {
    val n = Gen.choose(10L, 100000L)
    forAll(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0), n, n) { (d1, d2, n1, n2) =>
      val (lo, hi) = (math.min(d1, d2), math.max(d1, d2))
      val pLo = KsTest.pValue(hi, n1, n2)
      val pHi = KsTest.pValue(lo, n1, n2)
      assert(pLo >= 0.0 && pLo <= 1.0)
      assert(pLo <= pHi + 1e-9)
    }
  }

  test("drift share is count/n and bounded") {
    forAll(Gen.choose(0, 12)) { drifted =>
      val share = drifted.toDouble / 12
      assert(share >= 0.0 && share <= 1.0)
      assert((share > 0.5) == (drifted >= 7))
    }
  }

  test("PNG encode/decode round-trips at arbitrary dims and payloads") {
    import graft.operators.ImageCodec
    forAll(Gen.zip(Gen.choose(1, 80), Gen.choose(1, 60), Gen.long), n = 120) {
      case (w, h, seed) =>
        val rnd = new scala.util.Random(seed)
        val px = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
        val bytes = ImageCodec.encodePng(w, h, px)
        // closed-form container size (single stored block at these dims)
        assert(bytes.length == 68 + h * (1 + 3 * w))
        assert(ImageCodec.decodeMeta(bytes) ==
          ImageCodec.ImageMeta("png", w, h, 3, ok = true))
        // any single-byte corruption of the IDAT payload area must never
        // throw — and CRC/length checks keep dims intact
        val i = 41 + rnd.nextInt(math.max(1, bytes.length - 53))
        val bad = bytes.clone(); bad(i) = (bad(i) ^ 0x5a).toByte
        val m = ImageCodec.decodeMeta(bad)
        assert(m.format == "png" || m.format == "unknown")
    }
  }

  test("JPEG shell encode/decode round-trips with any comment") {
    import graft.operators.ImageCodec
    val comment = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '),
      Gen.const('é'))).map(_.mkString)
    forAll(Gen.zip(Gen.choose(1, 4000), Gen.choose(1, 4000),
        Gen.choose(1, 4), comment), n = 150) {
      case (w, h, c, s) =>
        val bytes = ImageCodec.encodeJpegShell(w, h, c, s)
        // SOI 2 + APP0 18 + COM (4+len) + SOF0 (10+3c) + SOS (8+2c) + EOI 2
        assert(bytes.length == 44 + 5 * c + s.getBytes("UTF-8").length)
        assert(ImageCodec.decodeMeta(bytes) ==
          ImageCodec.ImageMeta("jpeg", w, h, c, ok = true))
    }
  }
}
