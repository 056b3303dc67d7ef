package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** BPE merge-learning pressure test at realistic vocabulary scale. The
  * gated corpus (q134) holds ~31 distinct words, so the scale claim of
  * [[graft.operators.BpeTrain]] — every merge step aggregates a
  * VOCABULARY-sized frame, never the corpus — is argued there but not
  * measured. This tool manufactures a tens-of-thousands-word vocabulary
  * deterministically (each word occurrence suffixed with a hash-derived
  * marker, so frequencies stay skewed like real text), then:
  *
  *  1. times `learnMerges` at k = 8 / 32 / 64 over the amplified corpus
  *     and prints per-step wall times — the step-time scaling evidence;
  *  2. requires PREFIX CONSISTENCY (k=8 and k=32 tables are exactly the
  *     first rows of the k=64 table — greedy determinism at scale);
  *  3. requires the k=64 table to EXACTLY equal a single-threaded driver
  *     reimplementation of the same contract (independent code path:
  *     plain Scala string splitting, HashMap pair counting, the same
  *     (count desc, l, r) tie-break and leftmost non-overlapping
  *     double-space replace) over the collected corpus text;
  *  4. exercises the corpus-sample hook: merges learned on the
  *     `doc_id % 4 == 0` quarter of the corpus, equality-checked against
  *     the driver reimplementation of the same subset.
  */
object PressureBpe {

  /** Driver reimplementation of the BpeTrain contract over raw texts —
    * deliberately shares NO code with the engine path.
    */
  private[tools] def driverBpe(texts: Seq[String], k: Int)
      : Seq[(Int, String, String, String, Long)] = {
    val freqs = new scala.collection.mutable.HashMap[String, Long]()
    texts.foreach(_.split(" ").iterator.filter(_.nonEmpty)
      .foreach(w => freqs(w) = freqs.getOrElse(w, 0L) + 1L))
    // padded double-space symbol form: " c1  c2  ... "
    var words: Vector[(String, Long)] = freqs.iterator
      .map { case (w, f) => (w.map(_.toString).mkString(" ", "  ", " "), f) }
      .toVector
    val out = Vector.newBuilder[(Int, String, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (w, f) =>
        val ts = w.trim.split("  ")
        var j = 0
        while (j < ts.length - 1) {
          val key = (ts(j), ts(j + 1))
          counts(key) = counts.getOrElse(key, 0L) + f
          j += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        val m = l + r
        out += ((step, l, r, m, c))
        words = words.map { case (w, f) => (w.replace(s" $l  $r ", s" $m "), f) }
        step += 1
      }
    }
    out.result()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(cores = 32, appName = "pressure-bpe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](name: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PRESSURE $name: $s%.1f s")
      (r, s)
    }

    // Vocabulary amplification: suffix every word occurrence with a
    // deterministic marker derived from (word, doc_id) — same word in the
    // same doc keeps one form (frequencies stay > 1), across docs it fans
    // out to ~1500 variants, lifting the ~31-word synthetic vocabulary to
    // tens of thousands while keeping a skewed (Zipf-flavored) frequency
    // profile. Pure column work; fully reproducible driver-side from the
    // collected text.
    val base = graft.core.Tables(spark, sfDir).documents
    val amplified = base
      .select($"doc_id",
        concat_ws(" ", expr(
          "transform(filter(split(text, ' '), w -> length(w) > 0), " +
            "w -> concat(w, '_', pmod(abs(hash(w, doc_id)), 1500)))"))
          .as("text"))
      .repartition(64)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nDocs = amplified.count()
    val vocab = amplified
      .select(explode(split($"text", " ")).as("wd"))
      .filter(length($"wd") > 0).select($"wd").distinct().count()
    println(s"PRESSURE docs: $nDocs, distinct words: $vocab")
    require(vocab > 20000, s"vocabulary amplification too small: $vocab")

    // step-time scaling: k = 8 / 32 / 64 (each call re-learns from scratch;
    // the deltas isolate per-step cost at vocabulary scale)
    val (m8, t8) = timed("learn k=8")(
      graft.operators.BpeTrain.learnMerges(amplified, "text", 8))
    val (m32, t32) = timed("learn k=32")(
      graft.operators.BpeTrain.learnMerges(amplified, "text", 32))
    val (m64, t64) = timed("learn k=64")(
      graft.operators.BpeTrain.learnMerges(amplified, "text", 64))
    println(f"PRESSURE per-step: k8 ${t8 / 8}%.2f s/step, " +
      f"k32 ${t32 / 32}%.2f, k64 ${t64 / 64}%.2f, " +
      f"marginal steps 33-64 ${(t64 - t32) / 32}%.2f")
    require(m64.size == 64, s"expected 64 merges, got ${m64.size}")
    require(m64.take(8) == m8 && m64.take(32) == m32,
      "greedy BPE lost prefix consistency across k")

    // driver ground truth over the same corpus text (independent path)
    val texts = amplified.select($"text").as[String].collect().toSeq
    val (truth, _) = timed("driver reimplementation k=64")(
      driverBpe(texts, 64))
    val engine = m64.map(m => (m.step, m.l, m.r, m.merged, m.pair_count))
    require(engine == truth, {
      val firstDiff = engine.zip(truth).indexWhere { case (a, b) => a != b }
      s"merge tables diverge at step ${firstDiff + 1}: " +
        s"engine=${engine.lift(firstDiff)} truth=${truth.lift(firstDiff)}"
    })
    println("PRESSURE engine-vs-driver k=64: identical merge tables")

    // corpus-sample hook: learn on a deterministic quarter of the corpus
    val sampled = amplified.filter(pmod($"doc_id", lit(4)) === 0)
    val (mS, _) = timed("learn k=16 on doc_id%4==0 sample")(
      graft.operators.BpeTrain.learnMerges(sampled, "text", 16))
    val sampleTexts = amplified.filter(pmod($"doc_id", lit(4)) === 0)
      .select($"text").as[String].collect().toSeq
    val truthS = driverBpe(sampleTexts, 16)
    require(mS.map(m => (m.step, m.l, m.r, m.merged, m.pair_count)) == truthS,
      "sampled-corpus merge table diverges from driver truth")
    println("PRESSURE sample-hook k=16: identical merge tables")
    spark.stop()
  }
}
