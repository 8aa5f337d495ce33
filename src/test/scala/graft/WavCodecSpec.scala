package graft

import graft.functions.WavCodec
import graft.functions.WavCodec.Clip
import org.scalatest.funsuite.AnyFunSuite

/** The pure-JDK WAV codec: lossless PCM round trip, ancillary-chunk
  * tolerance, loud failure on malformed input, exact waveform features.
  */
class WavCodecSpec extends AnyFunSuite {

  test("encode/decode round trip is lossless including extreme sample values") {
    val rnd = new scala.util.Random(42)
    val samples = Array.fill(777)(rnd.nextInt().toShort)
    samples(0) = Short.MinValue; samples(1) = Short.MaxValue; samples(2) = 0
    val clip = Clip(44100, samples)
    val back = WavCodec.decode(WavCodec.encode(clip))
    assert(back.isDefined)
    assert(back.get.sampleRate == 44100)
    assert(back.get.samples.sameElements(samples))
    // empty clip round-trips too
    assert(WavCodec.decode(WavCodec.encode(Clip(8000, Array.empty))).get.samples.isEmpty)
  }

  test("chunk walk skips ancillary chunks between fmt and data") {
    val clip = Clip(16000, Array[Short](5, -5, 7))
    val wav = WavCodec.encode(clip)
    // splice a LIST chunk (odd-length body: exercises word alignment)
    // between fmt (ends at 36) and data
    val listBody = "INFOx".getBytes("US-ASCII")
    val list = new java.io.ByteArrayOutputStream()
    list.write("LIST".getBytes("US-ASCII"))
    list.write(Array[Byte](listBody.length.toByte, 0, 0, 0))
    list.write(listBody)
    list.write(0) // pad to word boundary
    val spliced = wav.take(36) ++ list.toByteArray ++ wav.drop(36)
    // fix the RIFF length
    val total = spliced.length - 8
    spliced(4) = (total & 0xFF).toByte; spliced(5) = ((total >> 8) & 0xFF).toByte
    spliced(6) = ((total >> 16) & 0xFF).toByte; spliced(7) = ((total >> 24) & 0xFF).toByte
    val back = WavCodec.decode(spliced)
    assert(back.isDefined, "LIST chunk must be skipped")
    assert(back.get.samples.toSeq == Seq[Short](5, -5, 7))
  }

  test("malformed input fails loudly") {
    val wav = WavCodec.encode(Clip(16000, Array[Short](1, 2, 3)))
    assert(WavCodec.decode(wav.take(30)).isEmpty, "truncated header")
    assert(WavCodec.decode(wav.take(wav.length - 2)).isEmpty, "truncated data")
    val stereo = wav.clone(); stereo(22) = 2 // channels = 2
    assert(WavCodec.decode(stereo).isEmpty, "only mono PCM is supported")
    val notRiff = wav.clone(); notRiff(0) = 'X'
    assert(WavCodec.decode(notRiff).isEmpty)
    // forged chunk length near Int.MaxValue must return None, not throw
    val evil = wav.clone()
    evil(16) = -16; evil(17) = -1; evil(18) = -1; evil(19) = 0x7F // fmt clen LE
    assert(WavCodec.decode(evil).isEmpty)
  }

  test("audioHash64: energy-profile bits exact, jitter-invariant, degenerate cases") {
    // 128 samples = 64 windows x 2; odd windows loud (1000), even quiet
    // (100): every odd window's energy*64 exceeds the total, no even
    // window's does -> sig is exactly the odd-bit mask
    def profile(hi: Int): Array[Short] =
      (0 until 128).map { i =>
        val amp = if ((i / 2) % 2 == 1) hi else 100
        (if (i % 2 == 0) amp else -amp).toShort
      }.toArray
    assert(WavCodec.audioHash64(Clip(8000, profile(1000))) == 0xAAAAAAAAAAAAAAAAL)
    // amplitude jitter that preserves the energy ORDER preserves the hash
    assert(WavCodec.audioHash64(Clip(8000, profile(1003))) ==
      WavCodec.audioHash64(Clip(8000, profile(1000))))
    // constant-energy clips have no above-mean window (strict >), empty is 0
    assert(WavCodec.audioHash64(Clip(8000, Array.fill[Short](128)(500))) == 0L)
    assert(WavCodec.audioHash64(Clip(8000, Array.empty[Short])) == 0L)
    // non-multiple-of-64 lengths: deterministic and encode/decode-stable
    val odd = Clip(8000, (0 until 100).map(i => (i * 37 % 201 - 100).toShort).toArray)
    assert(WavCodec.decode(WavCodec.encode(odd)).map(WavCodec.audioHash64)
      .contains(WavCodec.audioHash64(odd)))
  }

  test("waveform features are exact on a known square wave") {
    // half-period 3, amplitude 100, 4 cycles -> 24 samples
    val samples = (0 until 24).map(i => (if ((i / 3) % 2 == 0) 100 else -100).toShort).toArray
    val clip = Clip(16000, samples)
    assert(WavCodec.sumSquares(clip) == 24L * 100 * 100)
    assert(WavCodec.zeroCrossings(clip) == 2 * 4 - 1)
    assert(WavCodec.peak(clip) == 100)
    // zero samples break a strict crossing
    assert(WavCodec.zeroCrossings(Clip(8000, Array[Short](5, 0, -5))) == 0L)
    assert(WavCodec.zeroCrossings(Clip(8000, Array[Short](5, -5))) == 1L)
  }

  test("resample: identity, exact 2:1 decimation, interpolation midpoints, edge clamp") {
    // identity: same rate returns every sample unchanged
    val c = Clip(16000, Array[Short](10, -20, 30, -40))
    assert(WavCodec.resample(c, 16000).samples.toSeq === Seq[Short](10, -20, 30, -40))
    // 2:1 decimation lands exactly on even input samples (frac always 0)
    assert(WavCodec.resample(c, 8000).samples.toSeq === Seq[Short](10, 30))
    // 2x upsample: odd outputs are exact midpoints (truncating division)
    val up = WavCodec.resample(Clip(8000, Array[Short](0, 100)), 16000)
    assert(up.samples.toSeq === Seq[Short](0, 50, 100, 100)) // last clamps
    assert(up.sampleRate == 16000)
    // negative midpoint truncates toward zero, matching SQL `//`
    val neg = WavCodec.resample(Clip(8000, Array[Short](0, -101)), 16000)
    assert(neg.samples(1) == ((16000 - 8000) * 0 + 8000 * -101) / 16000)
    assert(neg.samples(1) == -50) // -50.5 truncates toward zero
    // empty clip stays empty; rejects nonsense rates
    assert(WavCodec.resample(Clip(8000, Array.empty[Short]), 16000).samples.isEmpty)
    intercept[IllegalArgumentException](WavCodec.resample(c, 0))
  }

  test("resample matches a sequential rational-arithmetic reference on random clips") {
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 20) {
      val n = 1 + rnd.nextInt(50)
      val inR = 4000 + rnd.nextInt(20000)
      val outR = 4000 + rnd.nextInt(20000)
      val s = Array.fill(n)((rnd.nextInt(20001) - 10000).toShort)
      val got = WavCodec.resample(Clip(inR, s), outR).samples
      val nOut = (n.toLong * outR / inR).toInt
      assert(got.length == nOut)
      for (j <- 0 until nOut) {
        val num = j.toLong * inR
        val i0 = math.min((num / outR).toInt, n - 1)
        val i1 = math.min(i0 + 1, n - 1)
        val frac = num % outR
        val want = (((outR - frac) * s(i0) + frac * s(i1)) / outR).toShort
        assert(got(j) == want, s"j=$j inR=$inR outR=$outR")
      }
    }
  }
}
