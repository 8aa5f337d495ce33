package graft

import graft.functions.{GifCodec, PngCodec}
import graft.functions.PngCodec.Image
import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The pure-JDK GIF codec: lossless LZW round trip (sequential and
  * interlaced), dictionary-growth stress across code-size boundaries,
  * a hand-packed reference stream, and loud failure on malformed input.
  */
class GifCodecSpec extends AnyFunSuite {

  /** Palette-bounded pseudo-random image: nColors distinct colors. */
  private def palImage(w: Int, h: Int, nColors: Int, seed: Long): Image = {
    val rnd = new scala.util.Random(seed)
    val colors = Array.fill(nColors)(rnd.nextInt(1 << 24))
    val rgb = new Array[Byte](w * h * 3)
    var p = 0
    while (p < w * h) {
      val c = colors(rnd.nextInt(nColors))
      rgb(p * 3) = ((c >> 16) & 0xFF).toByte
      rgb(p * 3 + 1) = ((c >> 8) & 0xFF).toByte
      rgb(p * 3 + 2) = (c & 0xFF).toByte
      p += 1
    }
    Image(w, h, rgb)
  }

  test("encode/decode round trip is lossless across geometry, palette size, and interlace") {
    for {
      (w, h) <- Seq((1, 1), (3, 2), (17, 9), (64, 64), (8, 31), (13, 1), (1, 13))
      nColors <- Seq(1, 2, 5, 17, 256)
      interlaced <- Seq(false, true)
    } {
      val img = palImage(w, h, math.min(nColors, w * h), seed = w * 10000L + h * 100L + nColors + (if (interlaced) 7 else 0))
      val decoded = GifCodec.decode(GifCodec.encode(img, interlaced))
      assert(decoded.isDefined, s"decode failed at ${w}x$h colors=$nColors interlaced=$interlaced")
      assert(decoded.get.width == w && decoded.get.height == h)
      assert(decoded.get.rgb.sameElements(img.rgb), s"pixels differ at ${w}x$h colors=$nColors interlaced=$interlaced")
    }
  }

  test("dictionary growth crosses every code-size boundary and the 4096 clear, losslessly") {
    // 256 colors + long non-repeating-then-repeating runs force the dict
    // through 9, 10, 11, 12-bit codes and a mid-stream clear/reset.
    val img = palImage(256, 96, 256, seed = 42L)
    val decoded = GifCodec.decode(GifCodec.encode(img))
    assert(decoded.isDefined)
    assert(decoded.get.rgb.sameElements(img.rgb))
  }

  test("single-color image compresses to runs and round trips") {
    val rgb = Array.fill(40 * 30 * 3)(0x7F.toByte)
    val img = Image(40, 30, rgb)
    val bytes = GifCodec.encode(img)
    // long identical runs must compress well below 1 byte/pixel
    assert(bytes.length < 40 * 30 / 2, s"run compression missing: ${bytes.length} bytes")
    assert(GifCodec.decode(bytes).get.rgb.sameElements(rgb))
  }

  test("hand-packed reference stream decodes (values a conformant encoder would plant)") {
    // 2x2 two-color image, palette {black, white}, pixels 0,1,1,0.
    // minCodeSize=2: clear=4, eoi=5. Spec algorithm trace: emit clear,
    // 0, 1, 1 at 3 bits; the third miss inserts entry 8, pushing the next
    // free slot past 2^3, so the final data code 0 and the EOI pack at
    // 4 bits. LSB-first packing, exactly what a conformant encoder emits.
    val codes = Seq((4, 3), (0, 3), (1, 3), (1, 3), (0, 4), (5, 4))
    var acc = 0L; var n = 0
    val data = collection.mutable.ArrayBuffer.empty[Byte]
    for ((c, sz) <- codes) { acc |= c.toLong << n; n += sz; while (n >= 8) { data += (acc & 0xFF).toByte; acc >>>= 8; n -= 8 } }
    if (n > 0) data += (acc & 0xFF).toByte
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(Array[Byte](2, 0, 2, 0)) // screen 2x2
    out.write(0x80 | 0x00) // GCT present, size field 0 -> 2 entries
    out.write(0); out.write(0)
    out.write(Array[Byte](0, 0, 0)) // palette[0] black
    out.write(Array[Byte](-1, -1, -1)) // palette[1] white
    out.write(0x2C)
    out.write(Array[Byte](0, 0, 0, 0, 2, 0, 2, 0, 0)) // descriptor 2x2, no flags
    out.write(2) // min code size
    out.write(data.length); out.write(data.toArray, 0, data.length)
    out.write(0); out.write(0x3B)
    val img = GifCodec.decode(out.toByteArray)
    assert(img.isDefined, "hand-packed stream must decode")
    val px = img.get.rgb.grouped(3).map(p => if (p(0) == 0) 0 else 1).toSeq
    assert(px == Seq(0, 1, 1, 0))
  }

  test("extension blocks are skipped; animated first frame decodes") {
    val img = palImage(9, 7, 4, seed = 9L)
    val bytes = GifCodec.encode(img)
    // splice a graphic-control extension between the tables and descriptor
    val descIx = bytes.indexOf(0x2C.toByte)
    val ext = Array[Byte](0x21, 0xF9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = bytes.take(descIx) ++ ext ++ bytes.drop(descIx)
    val decoded = GifCodec.decode(spliced)
    assert(decoded.isDefined && decoded.get.rgb.sameElements(img.rgb))
  }

  test("malformed inputs fail loudly, never fabricate pixels") {
    val good = GifCodec.encode(palImage(6, 6, 3, seed = 3L))
    assert(GifCodec.decode("NOTGIF".getBytes ++ good.drop(6)).isEmpty, "bad signature")
    assert(GifCodec.decode(good.take(good.length / 2)).isEmpty, "truncation")
    assert(GifCodec.decode(Array.emptyByteArray).isEmpty, "empty")
    // corrupt the LZW payload: flip bits mid-stream -> out-of-range code,
    // wrong pixel count, or (rarely) a same-length decode; never a crash
    val corrupt = good.clone()
    corrupt(corrupt.length - 10) = (corrupt(corrupt.length - 10) ^ 0xFF).toByte
    GifCodec.decode(corrupt) // must not throw
  }

  test("encode rejects >256 colors and oversized dims") {
    val rnd = new scala.util.Random(1L)
    val rgb = new Array[Byte](32 * 32 * 3)
    rnd.nextBytes(rgb) // ~1024 distinct colors at 32x32 random
    assertThrows[IllegalArgumentException](GifCodec.encode(Image(32, 32, rgb)))
  }

  test("Multimodal dispatch: gif dims, pixel decode, and features flow") {
    val img = palImage(24, 16, 8, seed = 5L)
    val gif = GifCodec.encode(img)
    assert(Multimodal.decode(gif) == (("gif", 24, 16)))
    val px = Multimodal.decodePixels(gif)
    assert(px.isDefined && px.get.rgb.sameElements(img.rgb))
    assert(Multimodal.featurize(gif).length == Multimodal.FeatureDim)
    // PNG of the same pixels decodes to the identical buffer through the
    // shared Image type -> cross-codec pixel agreement
    val png = PngCodec.encode(img, filterMode = -1)
    assert(Multimodal.decodePixels(png).get.rgb.sameElements(px.get.rgb))
  }
}
