package graft

import graft.functions.{JpegCodec, PngCodec}
import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG codec correctness. Three independent angles:
  * exact round trips through our own encoder (block-constant images are
  * DC-only, hence lossless at Q(0,0)=8), CROSS-VALIDATION against the
  * JDK's own ImageIO JPEG implementation in both directions (our encoder's
  * streams must decode correctly in a third-party reader, and
  * third-party-encoded streams must decode correctly in our reader — the
  * MP4 lesson: self-consistent codecs pass their own round trips while
  * misparsing the world), and loud rejection of everything outside the
  * baseline subset.
  */
class JpegCodecSpec extends AnyFunSuite {

  private def grayBlocks(bw: Int, bh: Int, v: (Int, Int) => Int): (Int, Int, Array[Byte]) = {
    val w = bw * 8; val h = bh * 8
    val pix = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      pix(y * w + x) = v(x / 8, y / 8).toByte
    (w, h, pix)
  }

  test("block-constant grayscale round-trips EXACTLY (DC-only blocks, Q00=8)") {
    val (w, h, pix) = grayBlocks(4, 3, (i, j) => (i * 37 + j * 101 + 13) % 256)
    val jpg = JpegCodec.encodeGray(w, h, pix)
    val img = JpegCodec.decode(jpg).getOrElse(fail("decode failed"))
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val expected = pix(y * w + x) & 0xFF
      for (c <- 0 until 3)
        assert((img.rgb((y * w + x) * 3 + c) & 0xFF) == expected,
          s"pixel ($x,$y) channel $c")
    }
  }

  test("restart intervals: RST markers emitted and consumed, DC predictors reset, still exact") {
    val (w, h, pix) = grayBlocks(5, 4, (i, j) => (i * 53 + j * 19 + 200) % 256)
    for (interval <- Seq(1, 3, 7)) {
      val jpg = JpegCodec.encodeGray(w, h, pix, restartInterval = interval)
      assert((2 until jpg.length - 1).exists(i =>
        (jpg(i - 1) & 0xFF) == 0xFF && (jpg(i) & 0xFF) >= 0xD0 && (jpg(i) & 0xFF) <= 0xD7),
        s"interval $interval produced no RST markers")
      val img = JpegCodec.decode(jpg).getOrElse(fail(s"decode failed at interval $interval"))
      for (y <- 0 until h; x <- 0 until w)
        assert((img.rgb((y * w + x) * 3) & 0xFF) == (pix(y * w + x) & 0xFF),
          s"interval $interval pixel ($x,$y)")
    }
  }

  test("non-multiple-of-8 dims: edge blocks replicate, constant image stays exact") {
    val w = 21; val h = 13
    val pix = Array.fill[Byte](w * h)(77.toByte)
    val img = JpegCodec.decode(JpegCodec.encodeGray(w, h, pix)).getOrElse(fail("decode failed"))
    assert(img.width == w && img.height == h)
    assert(img.rgb.forall(b => (b & 0xFF) == 77))
  }

  test("arbitrary-content grayscale round trip stays within quantization error") {
    val rnd = new scala.util.Random(42)
    val w = 32; val h = 24
    // smooth-ish content (quantization error on white noise is unbounded by
    // design; a gradient plus mild noise is the honest fixture)
    val pix = Array.tabulate[Byte](w * h)(i => ((i % w) * 4 + (i / w) * 3 + rnd.nextInt(8)).toByte)
    val img = JpegCodec.decode(JpegCodec.encodeGray(w, h, pix)).getOrElse(fail("decode failed"))
    var maxErr = 0
    for (i <- 0 until w * h)
      maxErr = math.max(maxErr, math.abs((img.rgb(i * 3) & 0xFF) - (pix(i) & 0xFF)))
    assert(maxErr <= 24, s"max reconstruction error $maxErr exceeds quantizer bound")
  }

  test("ycc444 color: block-constant planes round-trip through the exact fixed-point transform") {
    val w = 16; val h = 16
    val yP = Array.fill[Byte](w * h)(120.toByte)
    val cb = Array.fill[Byte](w * h)(90.toByte)
    val cr = Array.fill[Byte](w * h)(170.toByte)
    val img = JpegCodec.decode(JpegCodec.encodeYcc444(w, h, yP, cb, cr))
      .getOrElse(fail("decode failed"))
    // the exact libjpeg fixed-point formulas our decoder implements
    def cl(v: Int) = math.max(0, math.min(255, v))
    val r = cl(120 + ((91881 * (170 - 128) + 32768) >> 16))
    val g = cl(120 - ((22554 * (90 - 128) + 46802 * (170 - 128) + 32768) >> 16))
    val b = cl(120 + ((116130 * (90 - 128) + 32768) >> 16))
    for (i <- 0 until w * h) {
      assert((img.rgb(i * 3) & 0xFF) == r, s"R at $i")
      assert((img.rgb(i * 3 + 1) & 0xFF) == g, s"G at $i")
      assert((img.rgb(i * 3 + 2) & 0xFF) == b, s"B at $i")
    }
  }

  // ---- progressive (SOF2) cross-validation vs ImageIO ----------------------

  /** ImageIO progressive encode (SOF2, spectral selection + successive
    * approximation, its standard scan script).
    */
  private def imageIoProgressive(bi: java.awt.image.BufferedImage): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    writer.dispose(); ios.close()
    val jpg = bos.toByteArray
    // make sure ImageIO really produced SOF2 — otherwise the test is vacuous
    val hasSof2 = (2 until jpg.length - 1).exists(i =>
      (jpg(i) & 0xFF) == 0xFF && (jpg(i + 1) & 0xFF) == 0xC2)
    assert(hasSof2, "ImageIO did not emit a progressive stream")
    jpg
  }

  test("progressive grayscale (ImageIO SOF2 scan script) decodes within IDCT tolerance") {
    val w = 48; val h = 32
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val rnd = new scala.util.Random(11)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, math.min(255, x * 4 + y * 3 + rnd.nextInt(8)))
    val jpg = imageIoProgressive(bi)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    val img = JpegCodec.decode(jpg).getOrElse(fail("our decoder rejected ImageIO progressive"))
    assert(img.width == w && img.height == h)
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w)
      maxErr = math.max(maxErr,
        math.abs((img.rgb((y * w + x) * 3) & 0xFF) - ref.getRaster.getSample(x, y, 0)))
    assert(maxErr <= 16, s"progressive decoder divergence $maxErr vs ImageIO")
  }

  test("progressive COLOR (4:2:0, successive approximation) matches ImageIO's own decode") {
    val w = 64; val h = 48
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255) / w; val g = (y * 255) / h; val b = ((x + y) * 255) / (w + h)
      bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val jpg = imageIoProgressive(bi)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    val img = JpegCodec.decode(jpg).getOrElse(fail("our decoder rejected ImageIO progressive color"))
    assert(img.width == w && img.height == h)
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rgbRef = ref.getRGB(x, y)
      val refC = c match {
        case 0 => (rgbRef >> 16) & 0xFF
        case 1 => (rgbRef >> 8) & 0xFF
        case _ => rgbRef & 0xFF
      }
      maxErr = math.max(maxErr, math.abs((img.rgb((y * w + x) * 3 + c) & 0xFF) - refC))
    }
    // 4:2:0 upsampling differs legitimately (box here vs fancy in ImageIO);
    // bound the divergence on smooth gradients
    assert(maxErr <= 24, s"progressive color divergence $maxErr vs ImageIO")
  }

  test("progressive hard content (text-like edges) stays within bound and never throws") {
    val w = 80; val h = 40
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = if ((x / 3 + y / 5) % 2 == 0) 255 else 0 // harsh checker = max AC energy
      bi.getRaster.setSample(x, y, 0, v)
    }
    val jpg = imageIoProgressive(bi)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    val img = JpegCodec.decode(jpg).getOrElse(fail("our decoder rejected hard progressive"))
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w)
      maxErr = math.max(maxErr,
        math.abs((img.rgb((y * w + x) * 3) & 0xFF) - ref.getRaster.getSample(x, y, 0)))
    assert(maxErr <= 16, s"hard-content divergence $maxErr vs ImageIO")
  }

  test("progressive truncation at every scan boundary fails cleanly, never fabricates") {
    val w = 32; val h = 32
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) bi.getRaster.setSample(x, y, 0, (x * 8 + y) % 256)
    val jpg = imageIoProgressive(bi)
    for (cut <- Seq(4, 20, jpg.length / 4, jpg.length / 2, jpg.length - 4, jpg.length - 1))
      assert(JpegCodec.decode(jpg.take(cut)).isEmpty, s"truncated progressive at $cut decoded")
    // random mid-stream corruption: fail or emit a right-sized image, never throw
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 40) {
      val bad = jpg.clone()
      val at = 2 + rnd.nextInt(bad.length - 4)
      bad(at) = (bad(at) ^ (1 + rnd.nextInt(255))).toByte
      JpegCodec.decode(bad).foreach(i => assert(i.width == w && i.height == h))
    }
  }

  // ---- third-party cross-validation (JDK ImageIO) --------------------------

  test("our encoder's streams decode in ImageIO with the same pixels (gray, exact)") {
    val (w, h, pix) = grayBlocks(3, 2, (i, j) => (i * 91 + j * 57 + 40) % 256)
    val jpg = JpegCodec.encodeGray(w, h, pix, restartInterval = 2)
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(bi != null, "ImageIO rejected our stream")
    assert(bi.getWidth == w && bi.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val expected = pix(y * w + x) & 0xFF
      // raw raster sample — getRGB would push gray through a nonlinear
      // sRGB colorspace conversion and compare the wrong number
      val got = bi.getRaster.getSample(x, y, 0)
      assert(got == expected, s"ImageIO pixel ($x,$y): $got != $expected")
    }
  }

  test("ImageIO-encoded grayscale decodes in our reader within IDCT tolerance") {
    val w = 40; val h = 24
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val rnd = new scala.util.Random(7)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.min(255, x * 5 + y * 2 + rnd.nextInt(6))
      bi.getRaster.setSample(x, y, 0, v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpg", bos))
    val img = JpegCodec.decode(bos.toByteArray).getOrElse(fail("our decoder rejected an ImageIO stream"))
    assert(img.width == w && img.height == h)
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w) {
      val ref = bi.getRaster.getSample(x, y, 0)
      // compare against the ROUND-TRIPPED reference (ImageIO decode of its
      // own stream), not the pre-compression pixels: isolates decoder
      // divergence from quantization loss
      maxErr = math.max(maxErr, math.abs((img.rgb((y * w + x) * 3) & 0xFF) - ref))
    }
    // quantization loss + legal IDCT variance; both decoders must agree
    // closely on smooth content
    assert(maxErr <= 16, s"decoder divergence $maxErr vs ImageIO")
  }

  test("ImageIO-encoded solid COLOR (4:2:0 subsampled) decodes to the right color") {
    val w = 32; val h = 32
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g2 = bi.createGraphics()
    g2.setColor(new java.awt.Color(180, 60, 110))
    g2.fillRect(0, 0, w, h)
    g2.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpg", bos))
    val img = JpegCodec.decode(bos.toByteArray)
      .getOrElse(fail("our decoder rejected an ImageIO color stream"))
    assert(img.width == w && img.height == h)
    // solid color: subsampling filter choice is irrelevant, only color
    // transform rounding differs
    for (i <- 0 until w * h) {
      assert(math.abs((img.rgb(i * 3) & 0xFF) - 180) <= 4, s"R at $i: ${img.rgb(i * 3) & 0xFF}")
      assert(math.abs((img.rgb(i * 3 + 1) & 0xFF) - 60) <= 4, s"G at $i")
      assert(math.abs((img.rgb(i * 3 + 2) & 0xFF) - 110) <= 4, s"B at $i")
    }
  }

  // ---- rejection of the out-of-subset and the malformed --------------------

  test("out-of-subset and malformed streams return None, never throw or half-decode") {
    val (w, h, pix) = grayBlocks(2, 2, (i, j) => 100 + i + j)
    val jpg = JpegCodec.encodeGray(w, h, pix)
    // truncations at every prefix length must fail cleanly
    for (cut <- Seq(1, 2, 10, 30, jpg.length / 2, jpg.length - 3))
      assert(JpegCodec.decode(jpg.take(cut)).isEmpty, s"truncation at $cut decoded")
    // a baseline stream whose SOF is flipped to SOF2 routes to the
    // progressive decoder and dies there LOUDLY: its full-band sequential
    // scan header (Ss=0, Se=63) is illegal for a progressive DC scan
    val prog = jpg.clone()
    val sofAt = (2 until prog.length - 1).find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sofAt + 1) = 0xC2.toByte
    assert(JpegCodec.decode(prog).isEmpty, "forged progressive header must be rejected")
    // not a JPEG at all
    assert(JpegCodec.decode(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(JpegCodec.decode(PngCodec.encode(PngCodec.Image(8, 8, new Array[Byte](192)))).isEmpty)
    // corrupted entropy data: flip bytes mid-scan; must fail or produce a
    // valid-size image, never throw
    val sosAt = (2 until jpg.length - 1).find(i =>
      (jpg(i) & 0xFF) == 0xFF && (jpg(i + 1) & 0xFF) == 0xDA).get
    for (off <- sosAt + 14 until math.min(sosAt + 20, jpg.length - 2)) {
      val bad = jpg.clone()
      bad(off) = (bad(off) ^ 0x55).toByte
      JpegCodec.decode(bad).foreach(img => assert(img.width == w && img.height == h))
    }
  }

  /** Walks the marker segments of a JPEG up to (excluding) the first SOS
    * and returns the (start, end) byte range of every segment with the
    * given marker code.
    */
  private def segmentsBeforeSos(jpg: Array[Byte], marker: Int): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var i = 2 // past SOI
    var done = false
    while (!done && i + 3 < jpg.length) {
      if ((jpg(i) & 0xFF) != 0xFF) done = true
      else {
        val m = jpg(i + 1) & 0xFF
        if (m == 0xDA) done = true
        else {
          val len = ((jpg(i + 2) & 0xFF) << 8) | (jpg(i + 3) & 0xFF)
          if (m == marker) out += ((i, i + 2 + len))
          i += 2 + len
        }
      }
    }
    out.result()
  }

  test("progressive DC scan with its DHT stripped is rejected, never an NPE") {
    // ADVICE r5 (medium): a DC-first SOS whose Huffman table never arrived
    // crashed dcFirst with a NullPointerException instead of honoring the
    // documented None contract
    val w = 32; val h = 24
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) bi.getRaster.setSample(x, y, 0, (x * 5 + y * 3) % 256)
    val jpg = imageIoProgressive(bi)
    val dhts = segmentsBeforeSos(jpg, 0xC4)
    assert(dhts.nonEmpty, "test vacuous: no DHT before first SOS")
    val keep = jpg.indices.filterNot(i => dhts.exists { case (s, e) => i >= s && i < e })
    val stripped = keep.map(jpg).toArray
    assert(JpegCodec.decode(stripped).isEmpty, "table-less DC scan must reject, not crash")
  }

  test("a second SOF2 marker mid-stream is rejected like every other repeated frame") {
    // ADVICE r5 (low): a duplicate SOF2 silently reallocated component
    // state and discarded accumulated coefficients
    val w = 32; val h = 24
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) bi.getRaster.setSample(x, y, 0, (x * 7 + y) % 256)
    val jpg = imageIoProgressive(bi)
    val sofs = segmentsBeforeSos(jpg, 0xC2)
    assert(sofs.nonEmpty, "test vacuous: no SOF2 before first SOS")
    val (s, e) = sofs.head
    val doubled = jpg.slice(0, e) ++ jpg.slice(s, e) ++ jpg.slice(e, jpg.length)
    assert(JpegCodec.decode(doubled).isEmpty, "duplicate SOF2 must be rejected")
  }
}
