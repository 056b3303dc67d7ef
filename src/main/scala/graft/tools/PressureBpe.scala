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
  *  1. times `learnMerges` at k = 8 / 32 / 64, EACH IN A FRESH CHILD JVM
  *     (round 10, de-confounding the r9 numbers: learned back-to-back in
  *     one JVM, k=64 ran third and inherited the earlier learns' JIT
  *     warm-up — the "negative marginal step cost" artifact the round-9
  *     verdict flagged; per-k cold JVMs put the same warm-up inside every
  *     measurement, so the k32→k64 delta isolates steps 33..64) — the
  *     step-time scaling evidence;
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

  /** Vocabulary amplification: suffix every word occurrence with a
    * deterministic marker derived from (word, doc_id) — same word in the
    * same doc keeps one form (frequencies stay > 1), across docs it fans
    * out to ~1500 variants, lifting the ~31-word synthetic vocabulary to
    * tens of thousands while keeping a skewed (Zipf-flavored) frequency
    * profile. Pure column work; fully reproducible driver-side from the
    * collected text.
    */
  private def amplify(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    graft.core.Tables(spark, sfDir).documents
      .select($"doc_id",
        concat_ws(" ", expr(
          "transform(filter(split(text, ' '), w -> length(w) > 0), " +
            "w -> concat(w, '_', pmod(abs(hash(w, doc_id)), 1500)))"))
          .as("text"))
      .repartition(64)
  }

  def main(args: Array[String]): Unit =
    sys.env.get("GRAFT_BPE_CHILD_K") match {
      case Some(k) => childMain(k.toInt)
      case None    => parentMain()
    }

  /** One cold-JVM measurement: amplify + materialize OUTSIDE the timing,
    * then time exactly the k-step learn. Emits a parseable wall line and
    * the full merge table on stdout for the parent.
    */
  private def childMain(k: Int): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(cores = 32,
      appName = s"pressure-bpe-k$k")
    spark.sparkContext.setLogLevel("WARN")
    val amplified = amplify(spark, sfDir).persist(StorageLevel.MEMORY_AND_DISK)
    amplified.count()
    val t0 = System.nanoTime()
    val merges = graft.operators.BpeTrain.learnMerges(amplified, "text", k)
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"BPEWALL\t$k\t$wall%.3f")
    merges.foreach(m =>
      println(s"BPEMERGE\t${m.step}\t${m.l}\t${m.r}\t${m.merged}\t${m.pair_count}"))
    spark.stop()
  }

  private def parentMain(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // fresh child JVM per k (the Bench direct-JVM recipe: CodeSource-derived
    // classpath + Spark's module opens)
    def codeSrc(c: Class[_]): java.io.File =
      new java.io.File(c.getProtectionDomain.getCodeSource.getLocation.toURI)
    val cp = codeSrc(getClass).getPath + java.io.File.pathSeparator +
      codeSrc(classOf[org.apache.spark.sql.SparkSession]).getParent +
      java.io.File.separator + "*"
    val opens = org.apache.spark.launcher.JavaModuleOptions
      .defaultModuleOptions().split(" ").filter(_.nonEmpty).toSeq
    def learnInChild(k: Int): (Double, Seq[(Int, String, String, String, Long)]) = {
      val cmd = Seq(System.getProperty("java.home") + "/bin/java") ++ opens ++
        Seq("-Xmx8g", "-Xss8m", "-XX:ReservedCodeCacheSize=1g",
          "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
          "-cp", cp, "graft.tools.PressureBpe")
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("GRAFT_BPE_CHILD_K", k.toString)
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val outFile = java.io.File.createTempFile(s"graft-bpe-k$k", ".out")
      pb.redirectOutput(outFile)
      val p = pb.start()
      require(p.waitFor(30, java.util.concurrent.TimeUnit.MINUTES) &&
        p.exitValue() == 0, s"child k=$k failed")
      val lines = scala.io.Source.fromFile(outFile).getLines().toVector
      outFile.delete()
      val wall = lines.collectFirst {
        case l if l.startsWith("BPEWALL\t") => l.split("\t")(2).toDouble
      }.getOrElse(sys.error(s"child k=$k printed no BPEWALL"))
      val merges = lines.filter(_.startsWith("BPEMERGE\t")).map { l =>
        val f = l.split("\t")
        (f(1).toInt, f(2), f(3), f(4), f(5).toLong)
      }
      println(f"PRESSURE learn k=$k (fresh JVM): $wall%.1f s")
      (wall, merges)
    }

    val (t8, m8) = learnInChild(8)
    val (t32, m32) = learnInChild(32)
    val (t64, m64) = learnInChild(64)
    println(f"PRESSURE per-step (cold JVM each): k8 ${t8 / 8}%.2f s/step, " +
      f"k32 ${t32 / 32}%.2f, k64 ${t64 / 64}%.2f, " +
      f"marginal steps 33-64 ${(t64 - t32) / 32}%.2f")
    require(m64.size == 64, s"expected 64 merges, got ${m64.size}")
    require(m64.take(8) == m8 && m64.take(32) == m32,
      "greedy BPE lost prefix consistency across k")

    // driver ground truth over the same corpus text (independent path) —
    // this and the sample hook run in the parent's own session
    val spark = graft.core.GraftSession.local(cores = 32,
      appName = "pressure-bpe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val amplified = amplify(spark, sfDir).persist(StorageLevel.MEMORY_AND_DISK)
    val nDocs = amplified.count()
    val vocab = amplified
      .select(explode(split($"text", " ")).as("wd"))
      .filter(length($"wd") > 0).select($"wd").distinct().count()
    println(s"PRESSURE docs: $nDocs, distinct words: $vocab")
    require(vocab > 20000, s"vocabulary amplification too small: $vocab")
    val texts = amplified.select($"text").as[String].collect().toSeq
    val t0 = System.nanoTime()
    val truth = driverBpe(texts, 64)
    println(f"PRESSURE driver reimplementation k=64: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    require(m64 == truth, {
      val firstDiff = m64.zip(truth).indexWhere { case (a, b) => a != b }
      s"merge tables diverge at step ${firstDiff + 1}: " +
        s"engine=${m64.lift(firstDiff)} truth=${truth.lift(firstDiff)}"
    })
    println("PRESSURE engine-vs-driver k=64: identical merge tables")

    // corpus-sample hook: learn on a deterministic quarter of the corpus
    val sampled = amplified.filter(pmod($"doc_id", lit(4)) === 0)
    val mS = graft.operators.BpeTrain.learnMerges(sampled, "text", 16)
    val sampleTexts = amplified.filter(pmod($"doc_id", lit(4)) === 0)
      .select($"text").as[String].collect().toSeq
    val truthS = driverBpe(sampleTexts, 16)
    require(mS.map(m => (m.step, m.l, m.r, m.merged, m.pair_count)) == truthS,
      "sampled-corpus merge table diverges from driver truth")
    println("PRESSURE sample-hook k=16: identical merge tables")
    spark.stop()
  }
}
