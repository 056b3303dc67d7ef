package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Real video-container codec for the multimodal column family — the
  * video sibling of [[ImageCodec]]/[[AudioCodec]]: genuine ISO base media
  * (ISO/IEC 14496-12, the MP4/MOV box structure every camera and phone
  * writes) parsed byte-for-byte with zero dependencies. Codec PAYLOAD
  * decode (H.264 etc.) stays out of scope per the builder brief — the
  * container walk, size bookkeeping, and the mvhd/tkhd metadata every
  * video pipeline reads before touching a single frame are real.
  *
  * Encoder: `encodeMp4Shell` emits ftyp (isom) + moov { mvhd(timescale,
  * duration), trak { tkhd(track 1, width/height as 16.16 fixed-point) } }
  * + an empty mdat — a structurally complete, closed-form-sized (248
  * bytes) stream whose every field a metadata extractor reads is genuine.
  *
  * Decoder: `decodeMp4Meta` walks top-level boxes (u32 size, u64
  * largesize when size == 1, size-to-EOF when 0), requires exact
  * file-length bookkeeping, descends into moov for mvhd (version 0 or 1)
  * and the first trak's tkhd, and cross-checks the ftyp brand. Truncated
  * or inconsistent containers return `ok = false`, never a throw.
  */
object VideoCodec {

  /** `durationUs` = `duration * 1_000_000 / timescale` in integer
    * microseconds (mvhd's movie duration over its timescale).
    */
  final case class Mp4Meta(format: String, timescale: Long, durationUs: Long,
      width: Int, height: Int, ok: Boolean)

  private val Bad = Mp4Meta("mp4", 0L, 0L, 0, 0, ok = false)

  /** Structurally complete MP4 shell: ftyp + moov(mvhd + trak(tkhd)) +
    * empty mdat. Total length is the closed form 248 bytes regardless of
    * arguments (all boxes are version-0 fixed layouts).
    */
  def encodeMp4Shell(timescale: Int, duration: Int, width: Int,
      height: Int): Array[Byte] = {
    require(timescale > 0 && duration >= 0, s"bad time $timescale/$duration")
    require(width > 0 && width < 65536 && height > 0 && height < 65536,
      s"bad dims ${width}x$height")
    val out = new java.io.ByteArrayOutputStream(248)
    def u32(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    // ftyp: major isom, minor 0, compatible isom/mp41
    u32(24); ascii("ftyp"); ascii("isom"); u32(0); ascii("isom"); ascii("mp41")
    // moov = 8 + mvhd(108) + trak(8 + tkhd 92) = 216
    u32(216); ascii("moov")
    u32(108); ascii("mvhd")
    u32(0)              // version 0 + flags
    u32(0); u32(0)      // creation/modification time
    u32(timescale)
    u32(duration)
    u32(0x00010000)     // rate 1.0
    u16(0x0100)         // volume 1.0
    u16(0); u32(0); u32(0) // reserved
    // unity matrix
    u32(0x00010000); u32(0); u32(0)
    u32(0); u32(0x00010000); u32(0)
    u32(0); u32(0); u32(0x40000000)
    (0 until 6).foreach(_ => u32(0)) // pre_defined
    u32(2)              // next_track_ID
    u32(100); ascii("trak")
    u32(92); ascii("tkhd")
    u32(0x00000007)     // version 0, flags: enabled | in movie | in preview
    u32(0); u32(0)      // creation/modification
    u32(1)              // track_ID
    u32(0)              // reserved
    u32(duration)
    u32(0); u32(0)      // reserved
    u16(0); u16(0)      // layer, alternate_group
    u16(0); u16(0)      // volume (video track: 0), reserved
    u32(0x00010000); u32(0); u32(0)
    u32(0); u32(0x00010000); u32(0)
    u32(0); u32(0); u32(0x40000000)
    u32(width.toLong << 16)  // 16.16 fixed
    u32(height.toLong << 16)
    // empty mdat closes the stream (real files put sample data here)
    u32(8); ascii("mdat")
    out.toByteArray
  }

  def decodeMp4Meta(b: Array[Byte]): Mp4Meta = {
    if (b == null || b.length < 16) return Bad
    def u32(off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    def typ(off: Int): String = new String(b, off + 4, 4, "US-ASCII")
    // walk a box range; returns Seq((type, payloadOff, payloadEnd)) or null
    def walk(from: Int, to: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var off = from
      while (off < to) {
        if (off + 8 > to) return null
        val size0 = u32(off)
        val (payload, end) =
          if (size0 == 0) (off + 8, to) // to end of enclosing range
          else if (size0 == 1) {
            if (off + 16 > to) return null
            val ls = u64(off + 8)
            if (ls < 16 || off + ls > to) return null
            (off + 16, off + ls.toInt)
          } else {
            if (size0 < 8 || off + size0 > to) return null
            (off + 8, off + size0.toInt)
          }
        out += ((typ(off), payload, end))
        off = end
      }
      out.result()
    }
    val top = walk(0, b.length)
    if (top == null) return Bad
    val ftyp = top.find(_._1 == "ftyp").getOrElse(return Bad)
    if (ftyp._3 - ftyp._2 < 8) return Bad
    val moov = top.find(_._1 == "moov").getOrElse(return Bad)
    val inMoov = walk(moov._2, moov._3)
    if (inMoov == null) return Bad
    val mvhd = inMoov.find(_._1 == "mvhd").getOrElse(return Bad)
    val mv = mvhd._2
    val mvVersion = b(mv) & 0xff
    val (timescale, duration) = mvVersion match {
      case 0 if mvhd._3 - mv >= 100 => (u32(mv + 12), u32(mv + 16))
      case 1 if mvhd._3 - mv >= 112 => (u32(mv + 20), u64(mv + 24))
      case _ => return Bad
    }
    if (timescale <= 0 || duration < 0) return Bad
    // first trak's tkhd for dims (absent on audio-only files -> 0x0)
    var width = 0; var height = 0
    inMoov.find(_._1 == "trak").foreach { trak =>
      val inTrak = walk(trak._2, trak._3)
      if (inTrak == null) return Bad
      inTrak.find(_._1 == "tkhd").foreach { tkhd =>
        val tk = tkhd._2
        val v = b(tk) & 0xff
        val dimOff = if (v == 0) tk + 76 else tk + 88
        if (tkhd._3 - dimOff < 8) return Bad
        width = (u32(dimOff) >> 16).toInt
        height = (u32(dimOff + 4) >> 16).toInt
      }
    }
    Mp4Meta("mp4", timescale, duration * 1000000L / timescale, width, height,
      ok = true)
  }

  /** Partition-wise batch decode over a binary column — the ImageCodec
    * shape: fixed-width metadata rows out, payload bytes never shuffle.
    */
  def decodeMp4s(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val m = decodeMp4Meta(bytes)
          (id, m.format, m.timescale, m.durationUs, m.width, m.height,
            if (bytes == null) 0L else bytes.length.toLong, m.ok)
        }
      }
      .toDF("id", "format", "timescale", "duration_us", "width", "height",
        "byte_len", "ok")
  }
}
