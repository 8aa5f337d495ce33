package graft

import graft.functions.Mp4Meta
import graft.functions.Mp4Meta.Meta
import org.scalatest.funsuite.AnyFunSuite

/** ISO-BMFF box walker: round trip, unknown-box tolerance, loud failure. */
class Mp4MetaSpec extends AnyFunSuite {

  test("encode/decode round trip recovers dims and duration") {
    for (m <- Seq(Meta(16, 16, 1000), Meta(1920, 1080, 3599999), Meta(640, 480, 1))) {
      assert(Mp4Meta.decode(Mp4Meta.encode(m)).contains(m))
    }
  }

  test("unknown sibling boxes are skipped; truncation and bad sizes fail") {
    val good = Mp4Meta.encode(Meta(320, 240, 5000))
    // append a trailing unknown box (e.g. mdat): still parses
    val mdat = Array[Byte](0, 0, 0, 12) ++ "mdat".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4)
    assert(Mp4Meta.decode(good ++ mdat).contains(Meta(320, 240, 5000)))
    // truncated buffer
    assert(Mp4Meta.decode(good.take(good.length - 5)).isEmpty)
    // box size pointing past the buffer
    val bad = good.clone(); bad(0) = 0x7F
    assert(Mp4Meta.decode(bad).isEmpty)
    // garbage
    assert(Mp4Meta.decode(Array.fill[Byte](32)(0x41)).isEmpty)
    assert(Mp4Meta.decode(Array.emptyByteArray).isEmpty)
  }

  test("crafted near-Int.MaxValue box sizes return None, never index out of bounds") {
    val good = Mp4Meta.encode(Meta(320, 240, 5000))
    // a trailing box whose declared size wraps pos+size negative in Int math
    val evil = good ++ Array[Byte](0x7F, -1, -1, -16) ++ "free".getBytes("US-ASCII")
    assert(Mp4Meta.decode(evil).isEmpty)
  }

  test("mvhd field layout is spec-exact (parses a hand-built conformant header)") {
    // a third-party file would carry nonzero creation/modification times;
    // the walker must still land on timescale/duration (caught a real
    // off-by-4 where both encode and decode used shifted offsets)
    val wav = Mp4Meta.encode(Meta(100, 50, 7000))
    // locate mvhd payload and plant fake timestamps in the fields a
    // spec-conformant writer would populate
    val idx = wav.indexOfSlice("mvhd".getBytes("US-ASCII"))
    assert(idx > 0)
    val payload = idx + 4
    for (off <- Seq(4, 8); i <- 0 until 4) wav(payload + off + i) = 0x5A.toByte
    assert(Mp4Meta.decode(wav).contains(Meta(100, 50, 7000)),
      "nonzero creation/modification timestamps must not disturb timescale/duration")
  }

  test("durations beyond 32 bits are rejected loudly, not truncated") {
    intercept[IllegalArgumentException](Mp4Meta.encode(Meta(640, 480, 5000000000L)))
  }

  test("dimensions past 16.16 fixed point are rejected, not truncated mod 2^16") {
    intercept[IllegalArgumentException](Mp4Meta.encode(Meta(65536, 480, 1000L)))
    intercept[IllegalArgumentException](Mp4Meta.encode(Meta(640, 70000, 1000L)))
    intercept[IllegalArgumentException](Mp4Meta.encode(Meta(0, 480, 1000L)))
    assert(Mp4Meta.decode(Mp4Meta.encode(Meta(65535, 65535, 1000L)))
      .contains(Meta(65535, 65535, 1000L)))
  }

  test("framePlan: inclusive-of-zero schedule bounded by duration, loud on bad interval") {
    assert(Mp4Meta.framePlan(Meta(640, 480, 3500L), 1000L).toSeq ==
      Seq(0L, 1000L, 2000L, 3000L))
    // an exact-multiple duration includes its last boundary
    assert(Mp4Meta.framePlan(Meta(640, 480, 1000L), 1000L).toSeq == Seq(0L, 1000L))
    // sub-interval clips still sample frame 0
    assert(Mp4Meta.framePlan(Meta(640, 480, 999L), 1000L).toSeq == Seq(0L))
    intercept[IllegalArgumentException](Mp4Meta.framePlan(Meta(640, 480, 1000L), 0L))
  }
}
