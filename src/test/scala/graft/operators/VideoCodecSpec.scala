package graft.operators

import graft.SparkSpec

class VideoCodecSpec extends SparkSpec {

  test("encodeMp4Shell round-trips through the box walk with exact metadata") {
    val bytes = VideoCodec.encodeMp4Shell(timescale = 1200, duration = 3601,
      width = 1920, height = 1080)
    assert(bytes.length == 248)
    val m = VideoCodec.decodeMp4Meta(bytes)
    assert(m.ok && m.format == "mp4")
    assert(m.timescale == 1200)
    assert(m.durationUs == 3601L * 1000000L / 1200L)
    assert(m.width == 1920 && m.height == 1080)
  }

  test("decodeMp4Meta handles version-1 mvhd, largesize boxes, and " +
    "unknown siblings") {
    // synthesize: ftyp + free + moov{udta(unknown), mvhd v1} with moov
    // written as a size==1 largesize box
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def u64(v: Long): Unit = { u32(v >>> 32); u32(v & 0xffffffffL) }
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    u32(24); ascii("ftyp"); ascii("isom"); u32(0); ascii("isom"); ascii("mp41")
    u32(12); ascii("free"); u32(0)
    // mvhd v1: 8 hdr + 4 ver + 8 + 8 + 4 timescale + 8 duration + rest(80)
    val mvhdLen = 8 + 4 + 8 + 8 + 4 + 8 + 80
    val udtaLen = 16
    val moovPayload = udtaLen + mvhdLen
    u32(1); ascii("moov"); u64(16 + moovPayload) // largesize form
    u32(udtaLen); ascii("udta"); (0 until 8).foreach(_ => out.write(0x5a))
    u32(mvhdLen); ascii("mvhd")
    out.write(1); out.write(0); out.write(0); out.write(0) // version 1
    u64(0); u64(0)      // creation/modification
    u32(90000)          // timescale
    u64(123456789L)     // duration
    (0 until 20).foreach(_ => u32(0)) // rate..next_track_id filler (80 bytes)
    val m = VideoCodec.decodeMp4Meta(out.toByteArray)
    assert(m.ok, s"v1/largesize walk failed: $m")
    assert(m.timescale == 90000)
    assert(m.durationUs == 123456789L * 1000000L / 90000L)
    assert(m.width == 0 && m.height == 0) // no trak: audio-only shape
  }

  test("decodeMp4Meta fails closed on corruption") {
    val bytes = VideoCodec.encodeMp4Shell(600, 1200, 640, 480)
    assert(VideoCodec.decodeMp4Meta(bytes).ok)
    // truncation breaks the last box's declared size
    assert(!VideoCodec.decodeMp4Meta(bytes.dropRight(3)).ok)
    // box size smaller than a header
    val tiny = bytes.clone(); tiny(3) = 4
    assert(!VideoCodec.decodeMp4Meta(tiny).ok)
    // no moov
    assert(!VideoCodec.decodeMp4Meta(bytes.take(24)).ok)
    assert(!VideoCodec.decodeMp4Meta(Array.emptyByteArray).ok)
    assert(!VideoCodec.decodeMp4Meta(null).ok)
  }

  test("decodeMp4s runs the codec partition-wise over a binary column") {
    val s = spark
    import s.implicits._
    val rows = (0L until 20L).map { id =>
      (id, VideoCodec.encodeMp4Shell(600, (id * 600 + 600).toInt,
        320 + id.toInt * 16, 240))
    }
    val out = VideoCodec.decodeMp4s(rows.toDF("id", "content").repartition(4),
      "id", "content").collect()
    assert(out.length == 20)
    assert(out.forall(_.getAs[Boolean]("ok")))
    assert(out.forall(r => r.getAs[Long]("duration_us") ==
      (r.getAs[Long]("id") + 1) * 1000000L))
  }
}
