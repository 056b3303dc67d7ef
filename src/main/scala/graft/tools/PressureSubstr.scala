package graft.tools

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Repeated-substring pressure test: amplify the sf0.1 corpus ~12× in a
  * way that makes every replica's token stream UNIQUE (per-replica salt
  * tokens interleaved between base tokens) except for a 30-token passage
  * injected into every third replica — then require the distributed
  * [[graft.operators.SubstringDedup]] span set to EXACTLY equal a
  * single-threaded driver reimplementation of the same contract
  * (independent code path: byte-level MessageDigest hashing, scan-based
  * island merge vs the engine's window functions), and the injected
  * passage to be recalled inside a span in every carrier.
  *
  * What this certifies that the driver-gated SFs cannot: span assembly
  * across partition boundaries at millions of window positions (lag/cumsum
  * islands are the part of the operator most exposed to partitioning), the
  * repeated-hash join at a volume where map-side combines matter, and
  * intent-level recall (the audit finds the passage you planted, not just
  * self-consistent spans).
  */
object PressureSubstr {
  private val MinLen = 10

  private[tools] val Passage = (1 to 30).map(i => s"planted$i").mkString(" ")

  /** The shared amplified corpus (12 salted replicas per doc, passage
    * planted in every third, 64-way repartitioned) — used by both this
    * pressure test and `ProfileSubstr`, so the profile explains the exact
    * run the pressure artifact records.
    */
  private[tools] def amplify(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    docs
      .withColumn("rep", explode(sequence(lit(0), lit(11))))
      .select(
        (col("doc_id") * 16 + col("rep")).as("doc_id"),
        concat(
          regexp_replace(col("text"), lit(" "),
            concat(lit(" r"), col("rep"), lit(" "))),
          when(pmod(col("rep"), lit(3)) === 0, lit(" " + Passage))
            .otherwise(lit(""))).as("text"))
      // repartition BEFORE the caller persists: the base documents scan is
      // one parquet split, and a single-partition cache makes every
      // consumer stage start from a one-task read
      .repartition(64)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(cores = 32, appName = "pressure-substr")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PRESSURE $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val passage = Passage
    val docs = graft.core.Tables(spark, sfDir).documents
    // 12 replicas per doc; salt token "rK" interleaved after every base
    // token makes replica token streams pairwise-distinct ACROSS replica
    // indices (any 10-token window contains salts), so cross-replica
    // repetition comes only from (a) the planted passage and (b) genuine
    // base-corpus collisions — both of which ground truth must also find.
    val amplified = amplify(docs)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nDocs = timed("amplify")(amplified.count())
    println(s"PRESSURE docs: $nDocs")

    val spans = timed("spans")(
      graft.operators.SubstringDedup
        .repeatedSpans(amplified, "doc_id", "text", MinLen)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))))
    println(s"PRESSURE spans: ${spans.length}")

    // ---- driver ground truth: independent single-threaded implementation
    val corpus = timed("collect corpus")(
      amplified.select($"doc_id", $"text").as[(Long, String)].collect())
    val md = MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
      // top 15 hex nibbles = top 60 bits of the digest, as tokenHash60
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      v >>> 4
    }
    val truth = timed("driver truth") {
      val toks = corpus.map { case (id, t) => id -> t.split(" ") }
      val counts = new java.util.HashMap[Long, Int](1 << 22)
      toks.foreach { case (_, ws) =>
        var i = 0
        while (i + MinLen <= ws.length) {
          val k = h60(ws.slice(i, i + MinLen).mkString(" "))
          counts.put(k, counts.getOrDefault(k, 0) + 1)
          i += 1
        }
      }
      val out = Seq.newBuilder[(Long, Int, Int)]
      toks.foreach { case (id, ws) =>
        var start = -1; var last = -1
        var i = 0
        while (i + MinLen <= ws.length) {
          val rep = counts.get(h60(ws.slice(i, i + MinLen).mkString(" "))) >= 2
          val p = i + 1 // 1-based to match the operator
          if (rep) {
            if (start < 0) { start = p; last = p }
            else if (p - last > MinLen) { out += ((id, start, last)); start = p; last = p }
            else last = p
          }
          i += 1
        }
        if (start >= 0) out += ((id, start, last))
      }
      out.result()
    }
    println(s"PRESSURE truth spans: ${truth.length}")

    require(spans.toSet == truth.toSet, {
      val miss = truth.toSet -- spans.toSet
      val extra = spans.toSet -- truth.toSet
      s"span mismatch: ${miss.size} missing (e.g. ${miss.take(3)}), " +
        s"${extra.size} extra (e.g. ${extra.take(3)})"
    })
    val covered = spans.map { case (_, s, e) => e - s + MinLen }.sum
    println(s"PRESSURE covered tokens: $covered")

    // intent-level recall: every rep%3==0 replica carries the passage and
    // must have a span reaching its end (passage is the text's tail)
    val carriers = corpus.filter(_._2.endsWith(passage)).map(_._1).toSet
    val lenByDoc = corpus.iterator
      .map { case (id, t) => id -> t.split(" ").length }.toMap
    val spansByDoc = spans.groupBy(_._1)
    val recalled = carriers.count { id =>
      val ws = lenByDoc(id)
      spansByDoc.get(id).exists(_.exists { case (_, _, e) => e + MinLen - 1 == ws })
    }
    println(s"PRESSURE passage recall: $recalled of ${carriers.size} carriers")
    require(recalled == carriers.size,
      s"planted passage missed in ${carriers.size - recalled} carriers")

    spark.stop()
  }
}
