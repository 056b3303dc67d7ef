package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val packed = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, 640, 480, 3, "payload-one"),
      (2L, 32, 16, 1, "p2"),
      (3L, 1920, 1080, 3, "third payload here")
    ).toDF("id", "w", "h", "c", "body")
      .select(col("id"),
        Multimodal.packImage(col("w"), col("h"), col("c"), col("body"))
          .as("content"))
  }

  test("pack/decode round-trip recovers the typed metadata") {
    val meta = packed.select(col("id"),
      Multimodal.decodeImageMeta(col("content")).as("m"))
      .select(col("id"), col("m.width"), col("m.height"), col("m.channels"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(meta.toSet == Set((1L, 640, 480, 3), (2L, 32, 16, 1), (3L, 1920, 1080, 3)))
  }

  test("payload survives the header") {
    val got = packed.select(col("id"),
      Multimodal.imagePayload(col("content")).cast("string").as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "payload-one", 2L -> "p2", 3L -> "third payload here"))
  }

  test("audio pack/decode round-trip recovers sample_rate and n_samples") {
    val s = spark
    import s.implicits._
    val audio = Seq(
      (1L, 44100, 1234567890123L, "pcm-bytes-here"),
      (2L, 16000, 42L, "x")
    ).toDF("id", "sr", "n", "body")
      .select(col("id"),
        Multimodal.packAudio(col("sr"), col("n"), col("body")).as("content"))
    val meta = audio.select(col("id"),
      Multimodal.decodeAudioMeta(col("content")).as("m"),
      Multimodal.audioPayload(col("content")).cast("string").as("p"))
      .select(col("id"), col("m.sample_rate"), col("m.n_samples"), col("p"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(meta.toSet == Set(
      (1L, 44100, 1234567890123L, "pcm-bytes-here"),
      (2L, 16000, 42L, "x")))
  }

  test("frame sampling yields fixed-count byte slices") {
    val frames = packed
      .select(Multimodal.sampleFrames(col("content"), 4, 3).as("f"))
      .collect().map(_.getSeq[Array[Byte]](0))
    assert(frames.forall(_.length == 3))
    // first frame of doc 1 = first 4 bytes = header prefix 0x02 0x80 0x01 0xE0
    val f0 = frames.head.head
    assert(f0.toSeq == Seq(0x02.toByte, 0x80.toByte, 0x01.toByte, 0xE0.toByte))
  }

  test("byte histogram counts high nibbles deterministically") {
    val s = spark
    import s.implicits._
    // "ab" = 0x61 0x62 -> both high-nibble 6
    val h = Seq("ab").toDF("t")
      .select(Multimodal.byteHistogram($"t".cast("binary")).as("h"))
      .first().getSeq[Int](0)
    assert(h.length == 16)
    assert(h(6) == 2 && h.sum == 2)
  }

  test("resize stub rewrites header and pads payload") {
    val resized = packed.filter(col("id") === 2)
      .select(Multimodal.resizeImage(col("content"), 8, 2).as("content"))
    val meta = resized.select(Multimodal.decodeImageMeta(col("content")).as("m"))
      .select("m.width", "m.height", "m.channels").first()
    assert((meta.getInt(0), meta.getInt(1), meta.getInt(2)) == (8, 2, 1))
    val payloadLen = resized
      .select(length(Multimodal.imagePayload(col("content")))).first().getInt(0)
    assert(payloadLen == 16)
  }

  test("partition-wise decode (mapInPandas shape) matches expression decode") {
    val decoded = Multimodal.decodePartitionwise(packed, "id", "content")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getInt(4)))
    assert(decoded.toSet == Set(
      (1L, 640, 480, 3, "payload-one".length),
      (2L, 32, 16, 1, 2),
      (3L, 1920, 1080, 3, "third payload here".length)))
  }
}
