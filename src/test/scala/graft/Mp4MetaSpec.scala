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
}
