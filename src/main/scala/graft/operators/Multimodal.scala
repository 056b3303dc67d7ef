package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (builder brief): image/audio/video as opaque
  * `binary` columns with typed metadata structs, plus the partition-wise
  * decode / feature-extract / resize / frame-sample plumbing a training-data
  * pipeline needs.
  *
  * The container has no media codecs, so the DECODE STEP IS A STUB — a
  * deterministic fake codec over a self-describing synthetic header
  * (`packImage`). Everything Spark-side is real and tested: binary columns
  * flow through parquet scans, expressions (`length`/`md5`/`substring` all
  * operate on BinaryType natively), and the `mapPartitions` batch shape
  * (the Scala analog of mapInPandas: one iterator per partition, so a real
  * decoder would amortize model/codec init across the partition).
  */
object Multimodal {

  /** Typed metadata structs, the schema contract for media tables. */
  val ImageMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  val AudioMetaType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false)))

  /** Synthetic image payload: 6-byte big-endian header (width, height,
    * channels as int16) + payload bytes. Deterministic from any seed
    * column — the test-fixture generator for the binary pipeline.
    */
  def packImage(width: Column, height: Column, channels: Column,
      payload: Column): Column = {
    def int16be(c: Column): Column =
      unhex(lpad(hex(c.cast("int")), 4, "0"))
    concat(int16be(width), int16be(height), int16be(channels),
      payload.cast("binary"))
  }

  /** STUB decode — parses the synthetic header (a real build would replace
    * this one function with an actual codec inside mapPartitions; the
    * surrounding schema/partitioning/batching stays identical).
    * Pure codegen'd expressions: hex/conv/substring work on BinaryType.
    */
  def decodeImageMeta(content: Column): Column = {
    def int16at(pos: Int): Column =
      conv(hex(substring(content, pos, 2)), 16, 10).cast("int")
    struct(
      int16at(1).as("width"),
      int16at(3).as("height"),
      int16at(5).as("channels"))
  }

  /** Payload bytes after the stub header. */
  def imagePayload(content: Column): Column =
    substring(content, 7, Int.MaxValue)

  /** Synthetic audio payload: 12-byte big-endian header (sample_rate int32,
    * n_samples int64) + payload — the audio member of the binary-column
    * family, same stub-codec contract as packImage.
    */
  def packAudio(sampleRate: Column, nSamples: Column, payload: Column): Column = {
    def intBe(c: Column, hexDigits: Int): Column =
      unhex(lpad(hex(c.cast("bigint")), hexDigits, "0"))
    concat(intBe(sampleRate, 8), intBe(nSamples, 16), payload.cast("binary"))
  }

  /** STUB audio decode: header fields back as a typed struct (AudioMetaType
    * shape) via codegen'd hex/conv arithmetic.
    */
  def decodeAudioMeta(content: Column): Column =
    struct(
      conv(hex(substring(content, 1, 4)), 16, 10).cast("int").as("sample_rate"),
      conv(hex(substring(content, 5, 8)), 16, 10).cast("long").as("n_samples"))

  /** Payload bytes after the audio stub header. */
  def audioPayload(content: Column): Column =
    substring(content, 13, Int.MaxValue)

  /** Frame sampling: byte-range slices at a fixed stride — the binary
    * analog of taking every k-th video frame. Returns array<binary> of
    * `frames` slices of `frameSize` bytes each.
    */
  def sampleFrames(content: Column, frameSize: Int, frames: Int): Column =
    transform(sequence(lit(0), lit(frames - 1)),
      i => content.substr(i * lit(frameSize) + 1, lit(frameSize)))

  /** "Feature extraction" over the binary payload: 16-bucket byte histogram
    * (high nibble) — a deterministic stand-in for an embedding model,
    * computed with codegen'd expressions over the hex string (2 chars per
    * byte, bucket = first nibble).
    */
  def byteHistogram(content: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, ByteHistogram}
    Bridge.column(ByteHistogram(Bridge.expression(content)))
  }

  /** "Resize" stub: truncate/pad payload to the target byte size and
    * rewrite the header — shape-correct, codec-free.
    */
  def resizeImage(content: Column, newWidth: Int, newHeight: Int): Column = {
    val meta = decodeImageMeta(content)
    packImage(lit(newWidth), lit(newHeight), meta.getField("channels"),
      rpad(substring(imagePayload(content), 1, newWidth * newHeight),
        newWidth * newHeight, " "))
  }

  /** Decoded-image record produced by the partition-wise stub decoder. */
  final case class DecodedImage(id: Long, width: Int, height: Int,
      channels: Int, payloadBytes: Int)

  /** Partition-wise batch decode (the mapInPandas shape): one closure call
    * per PARTITION, not per row — a real codec/model would init once per
    * partition here. The stub extracts (id, width, height, channels,
    * payload_bytes) from the packed binary. Typed Dataset API: binary
    * arrives as Array[Byte], results re-enter SQL with a case-class
    * encoder.
    */
  def decodePartitionwise(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init happens HERE (codec/model handle in a real build)
        rows.map { case (id, bytes) =>
          def int16(pos: Int): Int =
            ((bytes(pos) & 0xFF) << 8) | (bytes(pos + 1) & 0xFF)
          DecodedImage(id, int16(0), int16(2), int16(4), bytes.length - 6)
        }
      }
      .toDF("id", "width", "height", "channels", "payload_bytes")
  }
}
