package graft

import graft.fixtures.PhashGen
import graft.functions.PngCodec
import org.scalatest.funsuite.AnyFunSuite

/** DCT perceptual hash + the DCT-domain family generator. The full-
  * enumeration tests here are what make the m_phash_neardup oracle exact
  * at EVERY scale factor: the generator is a pure function of famid, so
  * asserting all 127 families once pins the property for any corpus size.
  */
class PhashSpec extends AnyFunSuite {

  test("all 127 family images decode to exactly their code hash (rounding never flips a sign)") {
    for (f <- 1 to 127) {
      assert(PngCodec.pHash64(PhashGen.image(f)) == PhashGen.expectedHash(f), s"famid $f")
    }
  }

  test("constant weight 31 for every family; inter-family hamming >= 8 for all pairs") {
    val pats = (1 to 127).map(PhashGen.pattern)
    pats.foreach(p => assert(p.sum == 31))
    for (a <- 0 until 127; b <- a + 1 until 127) {
      val h = pats(a).zip(pats(b)).count { case (x, y) => x != y }
      assert(h >= 8, s"famids ${a + 1},${b + 1} hamming $h")
    }
  }

  test("pHash is exactly invariant to 2x pixel-duplication upscale") {
    for (f <- Seq(1, 37, 85, 127)) {
      val img = PhashGen.image(f)
      assert(PngCodec.pHash64(PhashGen.upscale2x(img)) == PngCodec.pHash64(img))
    }
  }

  test("pHash survives the PNG round trip under all five scanline filters") {
    val img = PhashGen.image(42)
    val want = PngCodec.pHash64(img)
    for (fm <- 0 to 4) {
      val dec = PngCodec.decode(PngCodec.encode(img, filterMode = fm))
      assert(dec.isDefined && PngCodec.pHash64(dec.get) == want, s"filter $fm")
    }
  }

  test("pHash ignores a one-pixel change (margin argument: dcoef <= 2/N << Amp)") {
    val img = PhashGen.image(9)
    val rgb = img.rgb.clone()
    rgb(3 * (5 * 32 + 7)) = (((rgb(3 * (5 * 32 + 7)) & 0xFF) + 1) & 0xFF).toByte
    assert(PngCodec.pHash64(PngCodec.Image(32, 32, rgb)) == PngCodec.pHash64(img))
  }

  test("pHash differs from aHash in what it sees: families share the aHash-blind mean") {
    // two different families have very different pHashes by construction
    val h1 = PngCodec.pHash64(PhashGen.image(3))
    val h2 = PngCodec.pHash64(PhashGen.image(96))
    assert(java.lang.Long.bitCount(h1 ^ h2) >= 8)
  }
}
