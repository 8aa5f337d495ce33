package graft

import graft.functions.PngCodec
import graft.functions.PngCodec.Image
import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The pure-JDK PNG codec: lossless round trip under every scanline filter,
  * loud failure on corruption, and pixel-feature sanity.
  */
class PngCodecSpec extends AnyFunSuite {

  private def randomImage(w: Int, h: Int, seed: Long): Image = {
    val rnd = new scala.util.Random(seed)
    val rgb = new Array[Byte](w * h * 3)
    rnd.nextBytes(rgb)
    Image(w, h, rgb)
  }

  test("encode/decode round trip is lossless for every filter mode and odd geometry") {
    for {
      (w, h) <- Seq((1, 1), (3, 2), (17, 9), (64, 64), (8, 31))
      mode <- Seq(0, 1, 2, 3, 4, -1)
    } {
      val img = randomImage(w, h, seed = w * 1000L + h * 10L + mode)
      val decoded = PngCodec.decode(PngCodec.encode(img, mode))
      assert(decoded.isDefined, s"decode failed at ${w}x$h mode $mode")
      assert(decoded.get.width == w && decoded.get.height == h)
      assert(decoded.get.rgb.sameElements(img.rgb), s"pixels differ at ${w}x$h mode $mode")
    }
  }

  test("corruption is detected, never silently decoded") {
    val img = randomImage(16, 16, 7L)
    val png = PngCodec.encode(img, filterMode = -1)
    // flip one byte inside the IDAT payload: chunk CRC must catch it
    val mid = png.length / 2
    val bad = png.clone(); bad(mid) = (bad(mid) ^ 0x5A).toByte
    assert(PngCodec.decode(bad).isEmpty, "bit flip must fail the CRC")
    // truncated stream
    assert(PngCodec.decode(png.take(png.length - 10)).isEmpty)
    // forged chunk length near Int.MaxValue must return None, not throw
    val evil = png.clone()
    evil(8) = 0x7F; evil(9) = -1; evil(10) = -1; evil(11) = -16
    assert(PngCodec.decode(evil).isEmpty)
    // a header-only PNG (no IDAT) has dims but no pixels
    assert(PngCodec.decode(Multimodal.makePng(20, 10)).isEmpty)
    assert(Multimodal.decodePng(Multimodal.makePng(20, 10)).contains((20, 10)))
    // chunk-order-malformed: IDAT before IHDR must fail (spec: IHDR first),
    // built by swapping the two chunks' byte ranges with CRCs intact
    val ihdrLen = 12 + 13
    val idatLen = {
      val l = ((png(8 + ihdrLen) & 0xFF) << 24) | ((png(9 + ihdrLen) & 0xFF) << 16) |
        ((png(10 + ihdrLen) & 0xFF) << 8) | (png(11 + ihdrLen) & 0xFF)
      12 + l
    }
    val swapped = png.take(8) ++
      png.slice(8 + ihdrLen, 8 + ihdrLen + idatLen) ++
      png.slice(8, 8 + ihdrLen) ++
      png.drop(8 + ihdrLen + idatLen)
    assert(swapped.length == png.length)
    assert(PngCodec.decode(swapped).isEmpty, "IDAT before IHDR must not decode")
  }

  test("header decoders and the full decoder agree; featurize uses real pixels") {
    val img = randomImage(24, 12, 11L)
    val png = PngCodec.encode(img)
    assert(Multimodal.decodePng(png).contains((24, 12)))
    assert(Multimodal.decode(png) == ("png", 24, 12))
    // solid image: every pooled feature equals the solid color's luminance
    val rgbSolid = Array.fill(24 * 12)(Array(100.toByte, 150.toByte, 200.toByte)).flatten
    val solid = PngCodec.encode(Image(24, 12, rgbSolid), filterMode = -1)
    val lum = PngCodec.lumNum(100, 150, 200) / 255000.0
    val feats = Multimodal.featurize(solid)
    assert(feats.length == Multimodal.FeatureDim)
    feats.foreach(f => assert(math.abs(f - lum) < 1e-6, s"$f vs $lum"))
    // sumLuminance matches the closed form
    assert(PngCodec.sumLuminance(PngCodec.decode(solid).get) ==
      24L * 12L * PngCodec.lumNum(100, 150, 200))
  }

  test("aHash64: solid images are all-ones; half-dark/half-bright has the expected bit pattern") {
    val solidRgb = Array.fill(16 * 16 * 3)(55.toByte)
    assert(PngCodec.aHash64(Image(16, 16, solidRgb)) == -1L)
    // left half dark, right half bright, 16x16 -> 8x8 blocks: block cols
    // 0-3 dark (below mean), 4-7 bright (above) -> bits set where bx >= 4
    val rgb = new Array[Byte](16 * 16 * 3)
    for (y <- 0 until 16; x <- 0 until 16) {
      val v = if (x < 8) 10 else 240
      val i = (y * 16 + x) * 3
      rgb(i) = v.toByte; rgb(i + 1) = v.toByte; rgb(i + 2) = v.toByte
    }
    val hash = PngCodec.aHash64(Image(16, 16, rgb))
    var expected = 0L
    for (by <- 0 until 8; bx <- 4 until 8) expected |= 1L << (by * 8 + bx)
    assert(hash == expected, f"hash $hash%016x expected $expected%016x")
    // near-dup property: one flipped pixel moves the hash by at most a few bits
    val rgb2 = rgb.clone(); rgb2(0) = 240.toByte; rgb2(1) = 240.toByte; rgb2(2) = 240.toByte
    val d = java.lang.Long.bitCount(hash ^ PngCodec.aHash64(Image(16, 16, rgb2)))
    assert(d <= 2, s"one-pixel change moved $d hash bits")
  }

  test("resizeBox: truncated block means, ragged edges, identity and degenerate guards") {
    // 3x3 -> factor 2: four blocks of sizes 2x2, 2x1, 1x2, 1x1 with
    // hand-computed truncated means on the red channel (green/blue 0)
    val r = Array(10, 20, 5, 30, 41, 7, 100, 200, 255)
    val rgb = new Array[Byte](27)
    for (i <- 0 until 9) rgb(i * 3) = r(i).toByte
    val out = PngCodec.resizeBox(Image(3, 3, rgb), 2)
    assert(out.width == 2 && out.height == 2)
    def red(img: Image, x: Int, y: Int): Int = img.rgb((y * img.width + x) * 3) & 0xFF
    assert(red(out, 0, 0) == (10 + 20 + 30 + 41) / 4) // 25 (101/4 truncates)
    assert(red(out, 1, 0) == (5 + 7) / 2)
    assert(red(out, 0, 1) == (100 + 200) / 2)
    assert(red(out, 1, 1) == 255)
    // factor 1 is the identity
    val id1 = PngCodec.resizeBox(Image(3, 3, rgb), 1)
    assert(id1.width == 3 && id1.height == 3 && id1.rgb.toSeq == rgb.toSeq)
    // a factor covering the whole image yields the 1x1 global truncated mean
    val one = PngCodec.resizeBox(Image(3, 3, rgb), 5)
    assert(one.width == 1 && one.height == 1 && red(one, 0, 0) == r.sum / 9)
    intercept[IllegalArgumentException](PngCodec.resizeBox(Image(3, 3, rgb), 0))
  }
}
