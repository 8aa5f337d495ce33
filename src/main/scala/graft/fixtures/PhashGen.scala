package graft.fixtures

import graft.functions.PngCodec

/** Deterministic image families for the pHash near-dup query, constructed
  * IN THE DCT DOMAIN so the expected hash is the family code itself:
  * family `famid` (1..127) plants ±Amp at the 63 low-frequency slots
  * pHash reads, signs given by a constant-weight spread of famid's 7
  * bits, then inverse-DCTs to pixels. Three guarantees, each load-bearing
  * for the exact oracle and each machine-checked in PhashSpec:
  *
  *   1. No clipping, provably: |pixel − 128| ≤ 63·Amp·(2/N) = 110.25 at
  *      Amp 28, N 32 — rounding to [18, 238] never saturates, so the
  *      planted spectrum survives encode/decode exactly as constructed
  *      (rounding perturbs each recovered coefficient by ≪ Amp in
  *      practice; PhashSpec enumerates ALL 127 families and asserts
  *      hash == code, which pins it for every scale factor since the
  *      generator is a pure function of famid alone).
  *   2. Constant weight: the 63-slot pattern always has exactly 31 ones
  *      (slots 0..31 carry bit(k%8) of famid < 128 — bit 7 is always 0 —
  *      and slots 32..62 carry the complement of bit((k−32)%8)), so the
  *      median threshold in pHash64 always sits on a −Amp coefficient
  *      and the hash equals the pattern — no family can saturate the
  *      median the way an unbalanced code would.
  *   3. Distance: famids differing in one bit b ≤ 6 differ in 4 direct +
  *      4 complement slots, so inter-family pHash hamming ≥ 8 — a
  *      hammingPairs64 run at maxHamming 7 returns EXACTLY the
  *      intra-family pairs.
  */
object PhashGen {

  val Amp = 28.0
  private val N = PngCodec.DctN

  /** 63-slot 0/1 sign pattern for famid ∈ 1..127 (constant weight 31). */
  def pattern(famid: Int): Array[Int] = {
    require(famid >= 1 && famid <= 127, s"famid must be in 1..127, got $famid")
    Array.tabulate(63) { k =>
      if (k < 32) (famid >> (k % 8)) & 1
      else 1 - ((famid >> ((k - 32) % 8)) & 1)
    }
  }

  /** The pHash this family decodes to: bit k = pattern(k). */
  def expectedHash(famid: Int): Long =
    pattern(famid).zipWithIndex.foldLeft(0L) { case (acc, (b, k)) =>
      if (b == 1) acc | (1L << k) else acc
    }

  /** 32×32 grayscale family image: IDCT of (DC=128·N, slot k = ±Amp). */
  def image(famid: Int): PngCodec.Image = {
    val pat = pattern(famid)
    // coefficient grid: u-major 8x8 corner, DC then the 63 coded slots
    val coef = new Array[Double](64)
    coef(0) = 128.0 * N
    var k = 0
    while (k < 63) { coef(k + 1) = if (pat(k) == 1) Amp else -Amp; k += 1 }
    val rgb = new Array[Byte](N * N * 3)
    var y = 0
    while (y < N) {
      var x = 0
      while (x < N) {
        var p = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            p += coef(u * 8 + v) * PngCodec.dctTable(u)(y) * PngCodec.dctTable(v)(x)
            v += 1
          }
          u += 1
        }
        val g = math.round(p).toInt
        val i = (y * N + x) * 3
        rgb(i) = g.toByte; rgb(i + 1) = g.toByte; rgb(i + 2) = g.toByte
        x += 1
      }
      y += 1
    }
    PngCodec.Image(N, N, rgb)
  }

  /** 2× nearest-neighbor upscale: pixel duplication, so the 32×32
    * block-mean fold inside pHash recovers the original plane EXACTLY —
    * scale-invariance with zero tolerance, used by the query to vary
    * member geometry without touching the hash.
    */
  def upscale2x(img: PngCodec.Image): PngCodec.Image = {
    val w = img.width; val h = img.height
    val out = new Array[Byte](w * h * 4 * 3)
    var y = 0
    while (y < 2 * h) {
      var x = 0
      while (x < 2 * w) {
        val si = ((y / 2) * w + (x / 2)) * 3
        val di = (y * 2 * w + x) * 3
        out(di) = img.rgb(si); out(di + 1) = img.rgb(si + 1); out(di + 2) = img.rgb(si + 2)
        x += 1
      }
      y += 1
    }
    PngCodec.Image(2 * w, 2 * h, out)
  }
}
