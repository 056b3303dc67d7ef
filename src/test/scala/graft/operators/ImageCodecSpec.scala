package graft.operators

import javax.imageio.ImageIO

import graft.SparkSpec

class ImageCodecSpec extends SparkSpec {

  private def testPixels(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 31 + 7) & 0xff).toByte)

  test("encodePng emits a PNG that javax.imageio decodes pixel-exactly") {
    val (w, h) = (13, 7)
    val px = testPixels(w, h)
    val bytes = ImageCodec.encodePng(w, h, px)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not parse the encoded PNG")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val base = (y * w + x) * 3
      assert(((rgb >> 16) & 0xff) == (px(base) & 0xff), s"R at ($x,$y)")
      assert(((rgb >> 8) & 0xff) == (px(base + 1) & 0xff), s"G at ($x,$y)")
      assert((rgb & 0xff) == (px(base + 2) & 0xff), s"B at ($x,$y)")
    }
  }

  test("decodeMeta parses own PNG, verifies CRC and inflated payload length") {
    val bytes = ImageCodec.encodePng(32, 17, testPixels(32, 17))
    val m = ImageCodec.decodeMeta(bytes)
    assert(m == ImageCodec.ImageMeta("png", 32, 17, 3, ok = true))
    // closed-form container size: 68 + height * (1 + 3 * width) at one block
    assert(bytes.length == 68 + 17 * (1 + 3 * 32))
  }

  test("decodeMeta parses a foreign PNG (ImageIO-encoded, real deflate)") {
    // round the other way: a PNG produced by the JDK's own encoder (dynamic
    // deflate, different chunking) must decode identically — the parser
    // handles PNGs it didn't produce
    val img = new java.awt.image.BufferedImage(21, 9,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 9; x <- 0 until 21) img.setRGB(x, y, (x * 13 + y) << 8)
    val out = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    val m = ImageCodec.decodeMeta(out.toByteArray)
    assert(m.format == "png" && m.width == 21 && m.height == 9 && m.ok)
  }

  test("decodeMeta handles sub-byte depth and Adam7-interlaced PNGs") {
    // 1-bit grayscale from the JDK encoder: scanlines are packed bits
    val img = new java.awt.image.BufferedImage(100, 10,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until 10; x <- 0 until 100)
      img.setRGB(x, y, if ((x + y) % 2 == 0) 0xffffff else 0)
    val out = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    val m = ImageCodec.decodeMeta(out.toByteArray)
    assert(m.format == "png" && m.width == 100 && m.height == 10 && m.ok,
      s"1-bit PNG must verify ok, got $m")

    // synthetic Adam7 RGB 8-bit: hand-built chunks with the correct
    // per-pass filtered stream length (zeros are valid filter-0 rows)
    def chunk(ty: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def be(v: Int): Unit =
        out.write(Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
          ((v >> 8) & 0xff).toByte, (v & 0xff).toByte), 0, 4)
      be(data.length)
      val tb = ty.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb, 0, 4); crc.update(data, 0, data.length)
      be(crc.getValue.toInt)
      out.toByteArray
    }
    val (w, h) = (13, 9)
    val passes = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val adam7Len = passes.map { case (x0, y0, xs, ys) =>
      val cols = if (w > x0) (w - x0 + xs - 1) / xs else 0
      val rows = if (h > y0) (h - y0 + ys - 1) / ys else 0
      if (cols > 0 && rows > 0) rows * (1 + cols * 3) else 0
    }.sum
    val ihdr = new Array[Byte](13)
    ihdr(0) = 0; ihdr(1) = 0; ihdr(2) = 0; ihdr(3) = w.toByte
    ihdr(7) = h.toByte; ihdr(8) = 8; ihdr(9) = 2; ihdr(12) = 1 // interlace
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val png = sig ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", ImageCodec.zlibStored(new Array[Byte](adam7Len))) ++
      chunk("IEND", Array.emptyByteArray)
    val mi = ImageCodec.decodeMeta(png)
    assert(mi == ImageCodec.ImageMeta("png", w, h, 3, ok = true),
      s"Adam7 PNG must verify ok, got $mi")
    // a one-byte-short Adam7 stream fails the length check
    val short = sig ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", ImageCodec.zlibStored(new Array[Byte](adam7Len - 1))) ++
      chunk("IEND", Array.emptyByteArray)
    assert(!ImageCodec.decodeMeta(short).ok)
  }

  test("corrupted PNG fails closed, not with a throw") {
    val bytes = ImageCodec.encodePng(8, 8, testPixels(8, 8))
    val flippedCrc = bytes.clone(); flippedCrc(30) = (flippedCrc(30) ^ 0x01).toByte
    assert(!ImageCodec.decodeMeta(flippedCrc).ok, "IHDR CRC flip must fail")
    val truncated = bytes.take(bytes.length - 30)
    assert(!ImageCodec.decodeMeta(truncated).ok, "truncated IDAT must fail")
    val garbage = Array.fill[Byte](64)(0x42)
    assert(ImageCodec.decodeMeta(garbage).format == "unknown")
    assert(!ImageCodec.decodeMeta(Array.emptyByteArray).ok)
  }

  test("out-of-spec PNG bit depths fail closed") {
    // bitDepth=0 would collapse the expected inflated length to `height`
    // bytes — a malformed container must never report ok=true. Flip the
    // IHDR depth byte (offset 24) and re-stamp the IHDR CRC so only the
    // depth check can reject it.
    def withDepth(depth: Int): Array[Byte] = {
      val b = ImageCodec.encodePng(8, 8, testPixels(8, 8)).clone()
      b(24) = depth.toByte
      val crc = new java.util.zip.CRC32()
      crc.update(b, 12, 17)
      val v = crc.getValue
      b(29) = (v >>> 24).toByte; b(30) = (v >>> 16).toByte
      b(31) = (v >>> 8).toByte; b(32) = v.toByte
      b
    }
    // encodePng emits color type 2 (truecolor): legal depths are 8/16 only
    for (d <- Seq(0, 1, 2, 3, 4, 7, 32, 255))
      assert(!ImageCodec.decodeMeta(withDepth(d)).ok, s"depth $d must fail")
    assert(ImageCodec.decodeMeta(withDepth(8)).ok, "re-stamped CRC is valid")
  }

  test("encodeJpegShell emits a marker stream the walker and ImageIO agree on") {
    val bytes = ImageCodec.encodeJpegShell(640, 480, 3, "hello jpeg")
    val m = ImageCodec.decodeMeta(bytes)
    assert(m == ImageCodec.ImageMeta("jpeg", 640, 480, 3, ok = true))
    assert(bytes.length == 59 + "hello jpeg".getBytes("UTF-8").length)
    // ImageIO's JPEG reader parses dimensions from the header without a scan
    val iis = ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val readers = ImageIO.getImageReaders(iis)
    assert(readers.hasNext, "no ImageIO JPEG reader recognized the stream")
    val r = readers.next()
    r.setInput(iis)
    assert(r.getWidth(0) == 640 && r.getHeight(0) == 480)
    r.dispose()
  }

  test("decodeMeta parses a foreign GIF (ImageIO-encoded)") {
    val img = new java.awt.image.BufferedImage(33, 14,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 14; x <- 0 until 33) img.setRGB(x, y, (x * 7 + y) << 16)
    val out = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "gif", out)
    val m = ImageCodec.decodeMeta(out.toByteArray)
    assert(m == ImageCodec.ImageMeta("gif", 33, 14, 1, ok = true))
    // truncation loses the 0x3B trailer -> fails closed with dims intact
    val torn = out.toByteArray.dropRight(5)
    val mt = ImageCodec.decodeMeta(torn)
    assert(mt.format == "gif" && mt.width == 33 && !mt.ok)
  }

  test("jpeg walker tolerates 0xFF fill bytes before markers") {
    val base = ImageCodec.encodeJpegShell(64, 32, 3, "x")
    // inject three fill bytes before the COM marker (after SOI+APP0 = 20)
    val padded = (base.take(20) :+ 0xff.toByte :+ 0xff.toByte :+ 0xff.toByte) ++
      base.drop(20)
    val m = ImageCodec.decodeMeta(padded.toArray)
    assert(m == ImageCodec.ImageMeta("jpeg", 64, 32, 3, ok = true))
  }

  test("jpeg walker skips padded/multi-segment streams and rejects scanless EOI") {
    // insert an extra COM before SOF: the walk must skip it by length
    val base = ImageCodec.encodeJpegShell(100, 50, 1, "abc")
    assert(ImageCodec.decodeMeta(base).channels == 1)
    // EOI with no SOF at all
    val noSof = Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)
    assert(!ImageCodec.decodeMeta(noSof).ok)
  }

  test("zlibStored spans multiple blocks past 65535 bytes and still inflates") {
    val data = Array.tabulate(150000)(i => (i % 251).toByte)
    val z = ImageCodec.zlibStored(data)
    assert(z.length == 2 + data.length + 5 * 3 + 4) // ceil(150000/65535) = 3
    val inf = new java.util.zip.Inflater()
    inf.setInput(z)
    val out = new Array[Byte](data.length + 1)
    val n = inf.inflate(out)
    assert(inf.finished() && n == data.length)
    assert(out.take(n).sameElements(data))
  }

  test("encodeJpegGray: ImageIO reconstructs every flat block's mean " +
    "exactly; decodeMeta fully Huffman-decodes the scan") {
    val (bw, bh) = (5, 3)
    val means = Array.tabulate(bw * bh)(i => (i * 37 + 3) % 256)
    val bytes = ImageCodec.encodeJpegGray(bw * 8, bh * 8, means,
      restartInterval = 2)
    // a conforming third-party decoder agrees pixel-for-pixel (flat
    // blocks: DC-only data IS the exact encoding)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not parse the entropy-coded JPEG")
    assert(img.getWidth == bw * 8 && img.getHeight == bh * 8)
    for (by <- 0 until bh; bx <- 0 until bw) {
      val got = img.getRaster.getSample(bx * 8 + 4, by * 8 + 4, 0)
      assert(got == means(by * bw + bx),
        s"block ($bx,$by): decoded $got != mean ${means(by * bw + bx)}")
    }
    // our decoder verifies the whole scan: block count + exact DC sums
    val m = ImageCodec.decodeMeta(bytes)
    assert(m.format == "jpeg" && m.ok)
    assert(m.width == bw * 8 && m.height == bh * 8 && m.channels == 1)
    assert(m.blocks == bw * bh)
    assert(m.dcSum == means.map(_.toLong).sum)
  }

  test("jpeg entropy decode fails closed on corruption: flipped scan bit, " +
    "wrong restart index, truncation, tables stripped") {
    val means = Array.tabulate(8)(i => (i * 53 + 11) % 256)
    val bytes = ImageCodec.encodeJpegGray(32, 16, means, restartInterval = 2)
    assert(ImageCodec.decodeMeta(bytes).ok)
    // find the SOS segment; scan data starts after its 10-byte segment
    def findMarker(b: Array[Byte], m: Int): Int = {
      var i = 2
      while (i + 1 < b.length &&
        !((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == m)) i += 1
      i
    }
    val scanStart = findMarker(bytes, 0xda) + 2 + 8 + 2
    // flip one bit mid-scan: the Huffman stream desynchronizes -> not ok
    // (flip several independent positions; at least the code structure
    // must break for each — a flip can also land in extend bits and
    // change dcSum instead, so assert meta != original in all cases)
    val orig = ImageCodec.decodeMeta(bytes)
    for (p <- scanStart until math.min(scanStart + 4, bytes.length - 2)) {
      val mut = bytes.clone()
      mut(p) = (mut(p) ^ 0x40).toByte
      assert(ImageCodec.decodeMeta(mut) != orig, s"bit flip at $p undetected")
    }
    // corrupt a restart marker's index (RST0 -> RST5): resync check fails
    val rstPos = findMarker(bytes, 0xd0)
    assert(rstPos + 1 < bytes.length, "no RST0 in a 2-MCU-interval stream")
    val badRst = bytes.clone()
    badRst(rstPos + 1) = 0xd5.toByte
    assert(!ImageCodec.decodeMeta(badRst).ok, "wrong RST index undetected")
    // truncate mid-scan: no EOI -> not ok
    assert(!ImageCodec.decodeMeta(bytes.dropRight(6)).ok)
    // strip the DHT segments: entropy data with no tables must fail
    val dhtPos = findMarker(bytes, 0xc4)
    val dhtLen = ((bytes(dhtPos + 2) & 0xff) << 8) | (bytes(dhtPos + 3) & 0xff)
    val noDht1 = bytes.take(dhtPos) ++ bytes.drop(dhtPos + 2 + dhtLen)
    val dhtPos2 = findMarker(noDht1, 0xc4)
    val dhtLen2 = ((noDht1(dhtPos2 + 2) & 0xff) << 8) | (noDht1(dhtPos2 + 3) & 0xff)
    val noDht = noDht1.take(dhtPos2) ++ noDht1.drop(dhtPos2 + 2 + dhtLen2)
    assert(!ImageCodec.decodeMeta(noDht).ok, "tableless scan undetected")
  }

  test("decodeMeta fully decodes a FOREIGN entropy-coded JPEG (ImageIO, " +
    "3 components, real DCT/quantization)") {
    val img = new java.awt.image.BufferedImage(41, 27,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 27; x <- 0 until 41)
      img.setRGB(x, y, ((x * 9) << 16) | ((y * 11) << 8) | (x + y))
    val out = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    val m = ImageCodec.decodeMeta(out.toByteArray)
    assert(m.format == "jpeg" && m.ok, s"foreign JPEG failed: $m")
    assert(m.width == 41 && m.height == 27 && m.channels == 3)
    // the scan was actually decoded: component-0 blocks were counted
    assert(m.blocks > 0, "foreign scan not entropy-decoded")
    // and truncating its entropy data must fail closed
    assert(!ImageCodec.decodeMeta(out.toByteArray.dropRight(10)).ok)
  }

  test("decodeImages runs the codec partition-wise over a binary column") {
    val s = spark
    import s.implicits._
    val rows = (0L until 40L).map { id =>
      val w = (id % 5 + 2).toInt; val h = (id % 3 + 2).toInt
      val bytes =
        if (id % 2 == 0) ImageCodec.encodePng(w, h, testPixels(w, h))
        else ImageCodec.encodeJpegShell(w, h, 3, s"doc $id")
      (id, bytes)
    }
    val df = rows.toDF("id", "content").repartition(4)
    val got = ImageCodec.decodeImages(df, "id", "content")
      .orderBy("id").collect()
    assert(got.length == 40)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == (if (id % 2 == 0) "png" else "jpeg"))
      assert(r.getInt(2) == (id % 5 + 2).toInt)
      assert(r.getInt(3) == (id % 3 + 2).toInt)
      assert(r.getInt(4) == 3)
      assert(r.getBoolean(6))
    }
  }
}
