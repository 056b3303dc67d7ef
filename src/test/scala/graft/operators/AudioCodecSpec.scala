package graft.operators

import javax.sound.sampled.AudioSystem

import graft.SparkSpec

class AudioCodecSpec extends SparkSpec {

  private def testSamples(frames: Int, channels: Int): Array[Short] =
    Array.tabulate(frames * channels)(i => ((i * 131 + 17) % 4096 - 2048).toShort)

  test("encodeWavPcm16 emits a WAV javax.sound reads back sample-exactly") {
    val (rate, channels, frames) = (16000, 2, 301)
    val samples = testSamples(frames, channels)
    val bytes = AudioCodec.encodeWavPcm16(rate, channels, samples)
    val in = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getSampleRate == rate.toFloat)
    assert(fmt.getChannels == channels)
    assert(fmt.getSampleSizeInBits == 16)
    assert(in.getFrameLength == frames)
    val pcm = in.readAllBytes()
    assert(pcm.length == frames * channels * 2)
    for (i <- samples.indices) {
      val got = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort
      assert(got == samples(i), s"sample $i: $got != ${samples(i)}")
    }
  }

  test("decodeWavMeta verifies structure and sums samples exactly") {
    val (rate, channels, frames) = (8000, 1, 123)
    val samples = testSamples(frames, channels)
    val bytes = AudioCodec.encodeWavPcm16(rate, channels, samples)
    val m = AudioCodec.decodeWavMeta(bytes)
    assert(m.ok && m.format == "wav")
    assert(m.sampleRate == rate && m.channels == channels && m.bitsPerSample == 16)
    assert(m.frames == frames)
    assert(m.durationUs == frames * 1000000L / rate)
    assert(m.sampleSum == samples.map(_.toLong).sum)
    assert(bytes.length == 68 + 2 * frames * channels)
  }

  test("decodeWavMeta fails closed on corruption") {
    val bytes = AudioCodec.encodeWavPcm16(8000, 2, testSamples(50, 2))
    assert(AudioCodec.decodeWavMeta(bytes).ok)
    // truncation: RIFF size no longer matches the container
    assert(!AudioCodec.decodeWavMeta(bytes.dropRight(3)).ok)
    // torn final frame: fix the RIFF and data sizes to a non-frame-aligned
    // length so ONLY the alignment check can reject it
    val torn = bytes.dropRight(2)
    val riffLen = torn.length - 8
    torn(4) = (riffLen & 0xff).toByte; torn(5) = ((riffLen >> 8) & 0xff).toByte
    torn(6) = ((riffLen >> 16) & 0xff).toByte
    torn(7) = ((riffLen >> 24) & 0xff).toByte
    // data length field sits 4 bytes before the payload; find "data"
    var dp = 12
    while (!(torn(dp) == 'd' && torn(dp + 1) == 'a' && torn(dp + 2) == 't' &&
      torn(dp + 3) == 'a')) dp += 1
    val dlen = torn.length - (dp + 8)
    torn(dp + 4) = (dlen & 0xff).toByte
    torn(dp + 5) = ((dlen >> 8) & 0xff).toByte
    torn(dp + 6) = ((dlen >> 16) & 0xff).toByte
    torn(dp + 7) = ((dlen >> 24) & 0xff).toByte
    val tm = AudioCodec.decodeWavMeta(torn)
    assert(!tm.ok && tm.sampleRate == 8000, "torn frame must fail with format intact")
    // inconsistent fmt arithmetic: corrupt byte rate
    val badRate = bytes.clone()
    var fp = 12
    while (!(badRate(fp) == 'f' && badRate(fp + 1) == 'm' &&
      badRate(fp + 2) == 't')) fp += 1
    badRate(fp + 8 + 8) = (badRate(fp + 8 + 8) ^ 1).toByte
    assert(!AudioCodec.decodeWavMeta(badRate).ok, "bad byte rate undetected")
    // wrong magic
    val notRiff = bytes.clone(); notRiff(0) = 'X'.toByte
    assert(!AudioCodec.decodeWavMeta(notRiff).ok)
    assert(!AudioCodec.decodeWavMeta(Array.emptyByteArray).ok)
    assert(AudioCodec.decodeWavMeta(null).ok == false)
  }

  test("decodeWavMeta parses a FOREIGN WAV (javax.sound-encoded)") {
    val (rate, channels, frames) = (22050, 1, 777)
    val samples = testSamples(frames, channels)
    val pcm = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val m = AudioCodec.decodeWavMeta(out.toByteArray)
    assert(m.ok, s"foreign WAV failed: $m")
    assert(m.sampleRate == rate && m.channels == channels && m.frames == frames)
    assert(m.sampleSum == samples.map(_.toLong).sum)
  }

  test("decodeWavs runs the codec partition-wise over a binary column") {
    val s = spark
    import s.implicits._
    val rows = (0L until 24L).map { id =>
      val channels = (id % 2 + 1).toInt
      val frames = (id % 7 + 3).toInt
      (id, AudioCodec.encodeWavPcm16(8000, channels,
        testSamples(frames, channels)))
    }
    val df = rows.toDF("id", "content").repartition(4)
    val out = AudioCodec.decodeWavs(df, "id", "content").collect()
    assert(out.length == 24)
    assert(out.forall(_.getAs[Boolean]("ok")))
    assert(out.forall(r => r.getAs[Long]("frames") ==
      r.getAs[Long]("id") % 7 + 3))
  }
}
