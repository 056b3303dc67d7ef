package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Image-codec pressure test: encode + structurally decode one real PNG
  * per document over the 12×-amplified corpus (60k containers, pixel
  * payloads from the salted text bytes) through the partition-wise
  * operator path, and require every container to verify ok with the
  * expected dimensions and closed-form byte length. Prints container
  * count, total encoded bytes, and wall-clock throughput for PRESSURE.md.
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
    // larger dims than the gate (up to 128x96 RGB) so payload volume is
    // meaningful; pixels cycle the doc's utf-8 bytes
    val packed = amplified.select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val w = (id % 128 + 1).toInt
          val h = (id % 96 + 1).toInt
          val tb0 = text.getBytes("UTF-8")
          val tb = if (tb0.isEmpty) Array[Byte](0) else tb0
          val px = new Array[Byte](w * h * 3)
          var i = 0
          while (i < px.length) { px(i) = tb(i % tb.length); i += 1 }
          (id, graft.operators.ImageCodec.encodePng(w, h, px))
        }
      }.toDF("doc_id", "content")
    val decoded = graft.operators.ImageCodec
      .decodeImages(packed, "doc_id", "content")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val agg = decoded.agg(
      count(lit(1)), sum(when($"ok", 1L).otherwise(0L)), sum($"byte_len"),
      sum(when($"width" === pmod($"id", lit(128)) + 1 &&
        $"height" === pmod($"id", lit(96)) + 1 &&
        $"byte_len" === lit(68L) + ($"height").cast("long") *
          (lit(1L) + lit(3L) * $"width"), 1L).otherwise(0L))).head()
    val wall = (System.nanoTime() - t0) / 1e9
    val (n, ok, bytes, exact) =
      (agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3))
    println(f"PRESSURE codec: $n containers, $ok ok, $exact dim+size exact, " +
      f"${bytes / 1e6}%.0f MB encoded, $wall%.1f s " +
      f"(${bytes / 1e6 / wall}%.0f MB/s encode+decode)")
    require(ok == n && exact == n && n == nDocs,
      s"codec pressure divergence: $n containers, $ok ok, $exact exact")
    spark.stop()
  }
}
