package graft.functions

/** Pure-JDK WAV (RIFF/WAVE) codec for 16-bit PCM mono — the audio leg of
  * the multimodal tier, same philosophy as [[PngCodec]]: payload bytes in,
  * SAMPLES out, zero external libraries, loud failure on malformed input.
  * PCM needs no entropy decode, so this path is complete: the features
  * (energy, zero crossings, peak) are exact integer statistics of the
  * decoded waveform, which the m_audio_features oracle recomputes in
  * closed form.
  */
object WavCodec {

  final case class Clip(sampleRate: Int, samples: Array[Short])

  // ---- encode --------------------------------------------------------------

  /** Standard 44-byte RIFF/fmt/data layout, PCM mono 16-bit little-endian. */
  def encode(clip: Clip): Array[Byte] = {
    val dataLen = clip.samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    putAscii(out, 0, "RIFF")
    putLe32(out, 4, 36 + dataLen)
    putAscii(out, 8, "WAVE")
    putAscii(out, 12, "fmt ")
    putLe32(out, 16, 16) // PCM fmt chunk length
    putLe16(out, 20, 1) // audio format: PCM
    putLe16(out, 22, 1) // channels: mono
    putLe32(out, 24, clip.sampleRate)
    putLe32(out, 28, clip.sampleRate * 2) // byte rate
    putLe16(out, 32, 2) // block align
    putLe16(out, 34, 16) // bits per sample
    putAscii(out, 36, "data")
    putLe32(out, 40, dataLen)
    var i = 0
    while (i < clip.samples.length) {
      val s = clip.samples(i)
      out(44 + 2 * i) = (s & 0xFF).toByte
      out(44 + 2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    out
  }

  // ---- decode --------------------------------------------------------------

  /** Chunk-walking decode (fmt and data may be separated by ancillary
    * chunks, e.g. LIST). None for anything but complete PCM mono 16-bit.
    */
  def decode(b: Array[Byte]): Option[Clip] = {
    if (b.length < 44) return None
    if (!hasAscii(b, 0, "RIFF") || !hasAscii(b, 8, "WAVE")) return None
    val riffLen = le32(b, 4)
    if (riffLen < 36 || 8L + riffLen > b.length) return None
    var sampleRate = -1
    var ok = false
    var data: Array[Short] = null
    var pos = 12
    while (pos + 8 <= b.length && data == null) {
      val clen = le32(b, pos + 4)
      // Long arithmetic: forged chunk lengths must fail here, not wrap
      // negative and walk pos off the buffer
      if (clen < 0 || pos.toLong + 8L + clen > b.length) return None
      if (hasAscii(b, pos, "fmt ")) {
        if (clen < 16) return None
        val fmt = le16(b, pos + 8)
        val channels = le16(b, pos + 10)
        val bits = le16(b, pos + 22)
        if (fmt != 1 || channels != 1 || bits != 16) return None
        sampleRate = le32(b, pos + 12)
        if (sampleRate <= 0) return None
        ok = true
      } else if (hasAscii(b, pos, "data")) {
        if (!ok || clen % 2 != 0) return None // fmt must precede data
        val n = clen / 2
        val s = new Array[Short](n)
        var i = 0
        while (i < n) {
          s(i) = ((b(pos + 8 + 2 * i) & 0xFF) | (b(pos + 8 + 2 * i + 1) << 8)).toShort
          i += 1
        }
        data = s
      }
      pos += 8 + clen + (clen & 1) // chunks are word-aligned
    }
    if (data == null) None else Some(Clip(sampleRate, data))
  }

  // ---- exact waveform features ---------------------------------------------

  /** Linear-interpolation PCM resample in EXACT integer arithmetic — the
    * rate-normalization step an audio-training pipeline runs before
    * feature extraction (models expect one rate; crawled audio arrives at
    * many). Output sample j sits at input position j*inRate/outRate held
    * as the exact rational (i0 = truncated quotient, frac = remainder):
    *
    *   out[j] = ((outRate - frac)*s[i0] + frac*s[min(i0+1, n-1)]) / outRate
    *
    * with TRUNCATING integer division (Scala Long `/`, same semantics as
    * SQL's `//` and Spark's `div`) — no floats anywhere, so the result is
    * bit-identical across engines and partitionings, and a SQL mirror can
    * replay it term by term. nOut = n*outRate/inRate (truncated). The last
    * input sample is held for interpolation past the end (standard edge
    * clamp). Values stay in Short range: out[j] is a convex combination of
    * two Shorts up to the 1-unit truncation.
    */
  def resample(clip: Clip, outRate: Int): Clip = {
    require(outRate >= 1, s"outRate must be >= 1, got $outRate")
    val n = clip.samples.length
    val inRate = clip.sampleRate
    require(inRate >= 1, s"clip sampleRate must be >= 1, got $inRate")
    if (n == 0) return Clip(outRate, new Array[Short](0))
    val nOut = (n.toLong * outRate / inRate).toInt
    val out = new Array[Short](nOut)
    var j = 0
    while (j < nOut) {
      val num = j.toLong * inRate
      val i0 = math.min((num / outRate).toInt, n - 1)
      val frac = num % outRate
      val i1 = math.min(i0 + 1, n - 1)
      out(j) = (((outRate - frac) * clip.samples(i0) + frac * clip.samples(i1))
        / outRate).toShort
      j += 1
    }
    Clip(outRate, out)
  }

  /** Sum of squared sample values — the RMS numerator, exact in a Long
    * (32767^2 * 2^31 samples still fits).
    */
  def sumSquares(clip: Clip): Long = {
    var s = 0L
    var i = 0
    while (i < clip.samples.length) { val v = clip.samples(i).toLong; s += v * v; i += 1 }
    s
  }

  /** Strict sign changes between consecutive samples (zero samples break a
    * crossing — deterministic, no epsilon).
    */
  def zeroCrossings(clip: Clip): Long = {
    var n = 0L
    var i = 1
    while (i < clip.samples.length) {
      val a = clip.samples(i - 1)
      val b = clip.samples(i)
      if ((a < 0 && b > 0) || (a > 0 && b < 0)) n += 1
      i += 1
    }
    n
  }

  /** Perceptual 64-bit energy-profile hash — the audio analog of
    * [[PngCodec.aHash64]], feeding the same hamming-banding near-dup
    * core ([[graft.operators.Dedup.hammingPairs64]]): the clip splits
    * into 64 equal windows (integer boundaries w*n/64, remainder spread
    * by construction), bit w set iff window w's energy is strictly above
    * the clip mean (`energy(w) * 64 > totalEnergy`). All arithmetic is
    * exact long sums of squares (s^2 <= 2^30, so a window under ~2^26
    * samples cannot overflow the *64 compare), so the hash is
    * deterministic across engines and partitionings. Re-encodings and
    * small amplitude jitter preserve the energy ORDER, hence the hash;
    * different program material flips profile bits.
    */
  def audioHash64(clip: Clip): Long = {
    val s = clip.samples
    val n = s.length
    if (n == 0) return 0L
    var total = 0L
    val win = new Array[Long](64)
    var w = 0
    while (w < 64) {
      val from = (w.toLong * n / 64).toInt
      val to = ((w + 1).toLong * n / 64).toInt
      var e = 0L
      var i = from
      while (i < to) { e += s(i).toLong * s(i); i += 1 }
      win(w) = e
      total += e
      w += 1
    }
    var sig = 0L
    w = 0
    while (w < 64) {
      if (win(w) * 64 > total) sig |= (1L << w)
      w += 1
    }
    sig
  }

  def peak(clip: Clip): Int = {
    var p = 0
    var i = 0
    while (i < clip.samples.length) {
      val v = math.abs(clip.samples(i).toInt)
      if (v > p) p = v
      i += 1
    }
    p
  }

  // ---- byte helpers --------------------------------------------------------

  @inline private def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  @inline private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
  @inline private def putLe16(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xFF).toByte; b(i + 1) = ((v >> 8) & 0xFF).toByte
  }
  @inline private def putLe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xFF).toByte; b(i + 1) = ((v >> 8) & 0xFF).toByte
    b(i + 2) = ((v >> 16) & 0xFF).toByte; b(i + 3) = ((v >> 24) & 0xFF).toByte
  }
  @inline private def putAscii(b: Array[Byte], i: Int, s: String): Unit = {
    var j = 0
    while (j < s.length) { b(i + j) = s.charAt(j).toByte; j += 1 }
  }
  @inline private def hasAscii(b: Array[Byte], i: Int, s: String): Boolean = {
    var j = 0
    while (j < s.length) { if (b(i + j) != s.charAt(j).toByte) return false; j += 1 }
    true
  }
}
