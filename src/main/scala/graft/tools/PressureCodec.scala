package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Image-codec pressure test, MIXED formats (round 10): encode +
  * structurally decode one real container per document over the
  * 12×-amplified corpus (60k containers) through the partition-wise
  * operator path — even doc_ids become RGB PNGs (pixels from the salted
  * text bytes), odd doc_ids become baseline-sequential JPEGs with REAL
  * entropy-coded scans (flat 8x8 blocks, Annex K Huffman tables, RSTn
  * restarts every 4 MCUs). Every container must verify ok with the
  * expected dimensions, the PNG closed-form byte length, and — for the
  * JPEGs — the exact block count and Huffman-decoded DC sum. Prints
  * container counts, total encoded bytes, and wall-clock throughput for
  * PRESSURE.md.
  */
object PressureCodec {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(cores = 32,
      appName = "pressure-codec")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val amplified = PressureSubstr
      .amplify(graft.core.Tables(spark, sfDir).documents)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nDocs = amplified.count()
    println(s"PRESSURE codec docs: $nDocs")

    val t0 = System.nanoTime()
    // PNG (even ids): larger dims than the gate (up to 128x96 RGB), pixels
    // cycle the doc's utf-8 bytes. JPEG (odd ids): up to 12x8 blocks
    // (96x64 px), block means from the q144 arithmetic family, restart
    // interval 4.
    val packed = amplified.select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          if (id % 2 == 0) {
            val w = (id % 128 + 1).toInt
            val h = (id % 96 + 1).toInt
            val tb0 = text.getBytes("UTF-8")
            val tb = if (tb0.isEmpty) Array[Byte](0) else tb0
            val px = new Array[Byte](w * h * 3)
            var i = 0
            while (i < px.length) { px(i) = tb(i % tb.length); i += 1 }
            (id, graft.operators.ImageCodec.encodePng(w, h, px))
          } else {
            val bw = (id % 12 + 1).toInt
            val bh = (id % 8 + 1).toInt
            val means = Array.tabulate(bw * bh) { i =>
              val bx = i % bw; val by = i / bw
              ((id * 31 + bx * 13 + by * 17) % 256).toInt
            }
            (id, graft.operators.ImageCodec.encodeJpegGray(
              bw * 8, bh * 8, means, restartInterval = 4))
          }
        }
      }.toDF("doc_id", "content")
    val decoded = graft.operators.ImageCodec
      .decodeImages(packed, "doc_id", "content")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // per-format exactness: PNG gates dims + the stored-zlib closed-form
    // byte length; JPEG gates dims + block count + the entropy-decoded DC
    // sum (byte length is Huffman-data-dependent, completeness is the
    // decoder's land-exactly-on-EOI requirement)
    val pngExact = $"format" === "png" &&
      $"width" === pmod($"id", lit(128)) + 1 &&
      $"height" === pmod($"id", lit(96)) + 1 &&
      $"byte_len" === lit(68L) + $"height".cast("long") *
        (lit(1L) + lit(3L) * $"width")
    val jBw = (pmod($"id", lit(12)) + 1).cast("long")
    val jBh = (pmod($"id", lit(8)) + 1).cast("long")
    val jpegExact = $"format" === "jpeg" &&
      $"width" === jBw * 8 && $"height" === jBh * 8 &&
      $"blocks" === jBw * jBh &&
      $"dc_sum" === expr(
        """aggregate(flatten(transform(sequence(0, int(id % 12)), bx ->
          |  transform(sequence(0, int(id % 8)), by ->
          |    (id * 31 + bx * 13 + by * 17) % 256))),
          |  0L, (acc, v) -> acc + v)""".stripMargin)
    val agg = decoded.agg(
      count(lit(1)), sum(when($"ok", 1L).otherwise(0L)), sum($"byte_len"),
      sum(when(pngExact, 1L).otherwise(0L)),
      sum(when(jpegExact, 1L).otherwise(0L))).head()
    val wall = (System.nanoTime() - t0) / 1e9
    val (n, ok, bytes, pngN, jpegN) =
      (agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3),
        agg.getLong(4))
    println(f"PRESSURE codec: $n containers ($pngN png exact, $jpegN jpeg " +
      f"entropy-exact), $ok ok, ${bytes / 1e6}%.0f MB encoded, $wall%.1f s " +
      f"(${bytes / 1e6 / wall}%.0f MB/s encode+decode)")
    require(ok == n && pngN + jpegN == n && n == nDocs,
      s"codec pressure divergence: $n containers, $ok ok, " +
        s"$pngN png + $jpegN jpeg exact")
    spark.stop()
  }
}
