package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.ImageCodec

/** Multimodal queries over REAL container formats (round 8): the synthetic-
  * header stub pipeline (q30) now has a real-codec sibling — every byte the
  * operator reads or writes is genuine PNG (RFC 2083 + RFC 1950/1951 zlib)
  * or JFIF/JPEG (ITU-T T.81) structure, parsed by `operators.ImageCodec`
  * with nothing beyond `java.util.zip`.
  *
  * Gate design: the encoder derives each fixture's dimensions and payload
  * deterministically from the document row, so the DuckDB oracle replays
  * the DECODED output arithmetically (dims from the source columns, byte
  * sizes from the containers' closed-form layout: stored-block zlib length
  * `raw + 11` for one block, JFIF shell length `59 + comment bytes`). A
  * decoder that mis-parses any header field, skips a marker wrong, fails
  * the IHDR CRC, or inflates to the wrong scanline length diverges from
  * the oracle — the round-trip through real bytes IS the test.
  *
  * Scale shape: encode and decode both run partition-wise (`mapPartitions`
  * — the mapInPandas batch shape) with per-partition codec state; only
  * fixed-width metadata rows leave the scan side, pixel bytes never
  * shuffle. At 100 TB the same plan reads blobs from a binary column and
  * emits ~40-byte rows.
  */
object Media {

  /** Real-codec roundtrip: per document build a genuine PNG (even doc_id;
    * RGB pixels cycled from the utf-8 text bytes) or a JFIF header stream
    * (odd doc_id; COM segment carrying the source string), then decode
    * with the full structural parser — signature, IHDR CRC, zlib inflate
    * + scanline-length check on the PNG side; the marker walk to SOF0 on
    * the JPEG side.
    */
  private val q129 = QueryDef.sql(
    "real PNG/JPEG codec roundtrip: encode from row data, structurally decode")(
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
      |  CAST(n_chars % 32 + 1 AS INT) AS width,
      |  CAST(doc_id % 32 + 1 AS INT) AS height,
      |  CAST(3 AS INT) AS channels,
      |  CAST(CASE WHEN doc_id % 2 = 0
      |    THEN 68 + (doc_id % 32 + 1) * (1 + 3 * (n_chars % 32 + 1))
      |    ELSE 59 + octet_length(encode(source)) END AS BIGINT) AS byte_len,
      |  CAST(1 AS INT) AS ok
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables(s, dir).documentsFanned
      .select($"doc_id", $"n_chars", $"text", $"source")
      .as[(Long, Long, String, String)]
    // partition-wise ENCODE: real containers from deterministic row data
    val packed = docs.mapPartitions { rows =>
      rows.map { case (id, nChars, text, source) =>
        val w = (nChars % 32 + 1).toInt
        val h = (id % 32 + 1).toInt
        val bytes =
          if (id % 2 == 0) {
            val tb0 = text.getBytes("UTF-8")
            val tb = if (tb0.isEmpty) Array[Byte](0) else tb0
            val px = new Array[Byte](w * h * 3)
            var i = 0
            while (i < px.length) { px(i) = tb(i % tb.length); i += 1 }
            ImageCodec.encodePng(w, h, px)
          } else ImageCodec.encodeJpegShell(w, h, 3, source)
        (id, bytes)
      }
    }.toDF("doc_id", "content")
    // partition-wise DECODE through the real structural parser
    ImageCodec.decodeImages(packed, "doc_id", "content")
      .select($"id".as("doc_id"), $"format", $"width", $"height", $"channels",
        $"byte_len", when($"ok", 1).otherwise(0).cast("int").as("ok"))
      .cachedOrdered($"doc_id")
  }

  /** Entropy-coded JPEG gate (round 10, VERDICT r9 #5 — the carried item):
    * per document encode a REAL baseline-sequential grayscale JPEG
    * (Annex K Huffman tables, DC-category/extend/EOB coding, byte
    * stuffing, RSTn restarts every 2 MCUs), then fully Huffman-decode the
    * scan back. Block means derive arithmetically from the row
    * (`(doc_id*31 + n_chars*7 + bx*13 + by*17) % 256`), so the oracle
    * replays the DECODED output — dims, block counts, and the exact sum of
    * reconstructed DC means — without touching a byte: a decoder that
    * mis-reads any Huffman code, extend bit, restart index, or stuffed
    * byte diverges. Byte length is deliberately NOT gated (Huffman output
    * length is data-dependent); completeness is gated instead by the
    * decoder requiring the scan to land exactly on EOI.
    */
  private val q144 = QueryDef.sql(
    "baseline JPEG entropy codec roundtrip: Huffman-coded scan with restarts, decode-verified DC sums")(
    """SELECT d.doc_id, 'jpeg' AS format,
      |  CAST((d.n_chars % 4 + 1) * 8 AS INT) AS width,
      |  CAST((d.doc_id % 4 + 1) * 8 AS INT) AS height,
      |  CAST(1 AS INT) AS channels,
      |  CAST((d.n_chars % 4 + 1) * (d.doc_id % 4 + 1) AS BIGINT) AS blocks,
      |  CAST(list_sum(flatten(list_transform(range(0, d.n_chars % 4 + 1),
      |      bx -> list_transform(range(0, d.doc_id % 4 + 1),
      |        by -> (d.doc_id * 31 + d.n_chars * 7 + bx * 13 + by * 17)
      |              % 256)))) AS BIGINT) AS dc_sum,
      |  CAST(1 AS INT) AS ok
      |FROM documents d ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables(s, dir).documentsFanned
      .select($"doc_id", $"n_chars")
      .as[(Long, Long)]
    val packed = docs.mapPartitions { rows =>
      rows.map { case (id, nChars) =>
        val bw = (nChars % 4 + 1).toInt
        val bh = (id % 4 + 1).toInt
        val means = Array.tabulate(bw * bh) { i =>
          val bx = i % bw; val by = i / bw
          ((id * 31 + nChars * 7 + bx * 13 + by * 17) % 256).toInt
        }
        (id, ImageCodec.encodeJpegGray(bw * 8, bh * 8, means,
          restartInterval = 2))
      }
    }.toDF("doc_id", "content")
    ImageCodec.decodeImages(packed, "doc_id", "content")
      .select($"id".as("doc_id"), $"format", $"width", $"height",
        $"channels", $"blocks", $"dc_sum",
        when($"ok", 1).otherwise(0).cast("int").as("ok"))
      .cachedOrdered($"doc_id")
  }

  /** Real audio-container gate (round 10): per document encode a genuine
    * RIFF/WAVE PCM-16 file (rates 8/16/24 kHz, mono or stereo, a LIST/
    * INFO chunk before fmt so the chunk walk is exercised) whose samples
    * derive arithmetically from the row, then decode through the full
    * structural parser — RIFF size bookkeeping, fmt byte-rate/block-align
    * cross-checks, frame alignment, and the exact int16 sample sum. The
    * oracle replays everything including the closed-form container size
    * (`68 + 2 * frames * channels`) and the integer-microsecond duration.
    * Upgrades the audio member of the multimodal family from
    * `Multimodal`'s synthetic header stub to real bytes, the same step
    * q129 took for images.
    */
  private val q145 = QueryDef.sql(
    "real WAV codec roundtrip: RIFF/PCM-16 encode from row data, structurally decode with sample sums")(
    """SELECT d.doc_id, 'wav' AS format,
      |  CAST(8000 * (d.doc_id % 3 + 1) AS INT) AS sample_rate,
      |  CAST(d.doc_id % 2 + 1 AS INT) AS channels,
      |  CAST(16 AS INT) AS bits,
      |  CAST(d.n_chars % 400 + 25 AS BIGINT) AS frames,
      |  CAST((d.n_chars % 400 + 25) * 1000000
      |       // (8000 * (d.doc_id % 3 + 1)) AS BIGINT) AS duration_us,
      |  CAST(list_sum(list_transform(
      |      range(0, (d.n_chars % 400 + 25) * (d.doc_id % 2 + 1)),
      |      i -> (d.doc_id * 31 + i * 7) % 4096 - 2048)) AS BIGINT)
      |    AS sample_sum,
      |  CAST(68 + 2 * (d.n_chars % 400 + 25) * (d.doc_id % 2 + 1) AS BIGINT)
      |    AS byte_len,
      |  CAST(1 AS INT) AS ok
      |FROM documents d ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables(s, dir).documentsFanned
      .select($"doc_id", $"n_chars")
      .as[(Long, Long)]
    val packed = docs.mapPartitions { rows =>
      rows.map { case (id, nChars) =>
        val rate = 8000 * (id % 3 + 1).toInt
        val channels = (id % 2 + 1).toInt
        val frames = (nChars % 400 + 25).toInt
        val samples = Array.tabulate(frames * channels)(i =>
          ((id * 31 + i * 7) % 4096 - 2048).toShort)
        (id, graft.operators.AudioCodec.encodeWavPcm16(rate, channels, samples))
      }
    }.toDF("doc_id", "content")
    graft.operators.AudioCodec.decodeWavs(packed, "doc_id", "content")
      .select($"id".as("doc_id"), $"format", $"sample_rate", $"channels",
        $"bits", $"frames", $"duration_us", $"sample_sum", $"byte_len",
        when($"ok", 1).otherwise(0).cast("int").as("ok"))
      .cachedOrdered($"doc_id")
  }

  /** Real video-container gate (round 10): per document encode a genuine
    * ISO base media (MP4) shell — ftyp + moov{mvhd, trak{tkhd}} + mdat,
    * every box a real 14496-12 layout — and decode through the full box
    * walk with exact size bookkeeping. The metadata a video pipeline
    * reads before touching any frame (movie timescale, integer-µs
    * duration, track dimensions from 16.16 fixed-point) replays
    * arithmetically in the oracle, including the closed-form 248-byte
    * container size. Completes the image/audio/video triad of real
    * container parsers; codec payloads stay out of scope per the brief.
    */
  private val q146 = QueryDef.sql(
    "real MP4 box-structure roundtrip: mvhd/tkhd metadata decode with size bookkeeping")(
    """SELECT d.doc_id, 'mp4' AS format,
      |  CAST(600 * (d.doc_id % 3 + 1) AS BIGINT) AS timescale,
      |  CAST((d.n_chars % 5000 + 600) * 1000000
      |       // (600 * (d.doc_id % 3 + 1)) AS BIGINT) AS duration_us,
      |  CAST(16 * (d.n_chars % 120 + 2) AS INT) AS width,
      |  CAST(16 * (d.doc_id % 68 + 2) AS INT) AS height,
      |  CAST(248 AS BIGINT) AS byte_len,
      |  CAST(1 AS INT) AS ok
      |FROM documents d ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables(s, dir).documentsFanned
      .select($"doc_id", $"n_chars")
      .as[(Long, Long)]
    val packed = docs.mapPartitions { rows =>
      rows.map { case (id, nChars) =>
        (id, graft.operators.VideoCodec.encodeMp4Shell(
          timescale = 600 * (id % 3 + 1).toInt,
          duration = (nChars % 5000 + 600).toInt,
          width = 16 * (nChars % 120 + 2).toInt,
          height = 16 * (id % 68 + 2).toInt))
      }
    }.toDF("doc_id", "content")
    graft.operators.VideoCodec.decodeMp4s(packed, "doc_id", "content")
      .select($"id".as("doc_id"), $"format", $"timescale", $"duration_us",
        $"width", $"height", $"byte_len",
        when($"ok", 1).otherwise(0).cast("int").as("ok"))
      .cachedOrdered($"doc_id")
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q129_image_codec" -> q129,
    "q144_jpeg_entropy_codec" -> q144,
    "q145_wav_codec" -> q145,
    "q146_mp4_codec" -> q146
  )
}
