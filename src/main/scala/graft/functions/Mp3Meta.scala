package graft.functions

/** MP3 container metadata for the audio-corpus curation tier — pure-JDK
  * ID3v2 tag walk + MPEG audio frame-header walk, the audio analog of
  * [[ExifMeta]] (images) and [[Mp4Meta]] (video): title/artist/album for
  * provenance and diversity audits, codec parameters and a frame-counted
  * duration for budget accounting — all without any audio decode (codec
  * payloads stay out of scope exactly like JPEG entropy data did before
  * the decoder landed; the frame WALK is real parsing, the PCM is not
  * needed for curation).
  *
  * Format (ID3v2.3/2.4 + MPEG-1/2 audio framing):
  *  - ID3v2 header: "ID3", version, flags, 28-bit SYNCSAFE tag size.
  *    Frames: 4-char id, size (v2.3 plain big-endian; v2.4 syncsafe),
  *    2 flag bytes, payload. Text frames (TIT2/TPE1/TALB) start with an
  *    encoding byte: 0 latin-1, 1 UTF-16 with BOM, 2 UTF-16BE, 3 UTF-8.
  *  - Audio: frames begin at an 11-bit sync (0xFFE); the header's
  *    (version, layer, bitrate index, samplerate index, padding) give the
  *    frame length, so frames can be COUNTED by walking lengths — no
  *    decode. Duration = frames × samples-per-frame / sample rate
  *    (integer ms; exact for CBR, the honest estimate for VBR).
  *
  * Totality: bounds-checked reads, frame-count caps, None on any
  * structural violation (fuzz-tested with the other codecs).
  */
object Mp3Meta {

  final case class Mp3(
      title: Option[String],
      artist: Option[String],
      album: Option[String],
      version: Int, // 1 or 2 (MPEG-1 / MPEG-2)
      layer: Int, // 1..3
      bitrateKbps: Int,
      sampleRate: Int,
      nFrames: Int,
      durationMs: Long)

  private final val MaxFrames = 1 << 20

  // MPEG-1 Layer III bitrates (kbps), index 1..14; MPEG-2 halves most
  private val BitrateV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val BitrateV2L3 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
  private val SampleRateV1 = Array(44100, 48000, 32000, 0)
  private val SampleRateV2 = Array(22050, 24000, 16000, 0)

  private def syncsafe(b: Array[Byte], off: Int): Int =
    ((b(off) & 0x7F) << 21) | ((b(off + 1) & 0x7F) << 14) | ((b(off + 2) & 0x7F) << 7) | (b(off + 3) & 0x7F)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) | ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  private def textFrame(b: Array[Byte], off: Int, len: Int): Option[String] = {
    if (len < 1) return None
    val enc = b(off) & 0xFF
    val (cs, skip) = enc match {
      case 0 => (java.nio.charset.StandardCharsets.ISO_8859_1, 1)
      case 1 => (java.nio.charset.StandardCharsets.UTF_16, 1) // BOM-aware
      case 2 => (java.nio.charset.StandardCharsets.UTF_16BE, 1)
      case 3 => (java.nio.charset.StandardCharsets.UTF_8, 1)
      case _ => return None
    }
    var end = off + len
    // Trim the trailing NUL terminator in code-unit-sized steps: UTF-16
    // (enc 1/2) terminates with 00 00 and its text bytes may legitimately
    // end in a single 0x00 (any ASCII char in UTF-16LE), so byte-wise
    // trimming there would eat half a code unit and corrupt the last char.
    if (enc == 1 || enc == 2) {
      while (end - 2 >= off + skip && b(end - 1) == 0 && b(end - 2) == 0) end -= 2
    } else {
      while (end > off + skip && b(end - 1) == 0) end -= 1
    }
    Some(new String(b, off + skip, end - (off + skip), cs))
  }

  /** Parse an MP3 payload: optional ID3v2 tag, then the audio frame walk.
    * None when neither a tag nor a single valid audio frame is found.
    */
  def parse(b: Array[Byte]): Option[Mp3] = {
    if (b == null || b.length < 4) return None
    var title: Option[String] = None
    var artist: Option[String] = None
    var album: Option[String] = None
    var audioStart = 0
    // --- ID3v2 tag ---
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val major = b(3) & 0xFF
      val tagSize = syncsafe(b, 6)
      if (tagSize < 0 || 10 + tagSize > b.length) return None
      if (major == 3 || major == 4) {
        var p = 10
        val tagEnd = 10 + tagSize
        var ok = true
        while (ok && p + 10 <= tagEnd) {
          if (b(p) == 0) ok = false // NUL: tag padding area reached
          else {
            val id = new String(b, p, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
            val fsize = if (major == 4) syncsafe(b, p + 4) else be32(b, p + 4)
            if (fsize < 0 || p + 10 + fsize > tagEnd) ok = false
            else {
              id match {
                case "TIT2" => title = textFrame(b, p + 10, fsize)
                case "TPE1" => artist = textFrame(b, p + 10, fsize)
                case "TALB" => album = textFrame(b, p + 10, fsize)
                case _      => ()
              }
              p += 10 + fsize
            }
          }
        }
      }
      audioStart = 10 + tagSize
    }
    // --- audio frame walk ---
    var p = audioStart
    var nFrames = 0
    var ver = 0
    var layer = 0
    var kbps = 0
    var rate = 0
    var walking = true
    while (walking && p + 4 <= b.length && nFrames < MaxFrames) {
      val h0 = b(p) & 0xFF
      val h1 = b(p + 1) & 0xFF
      if (h0 != 0xFF || (h1 & 0xE0) != 0xE0) walking = false
      else {
        val verBits = (h1 >> 3) & 3 // 3 = MPEG-1, 2 = MPEG-2
        val layerBits = (h1 >> 1) & 3 // 1 = Layer III
        val brIdx = (b(p + 2) & 0xFF) >> 4
        val srIdx = ((b(p + 2) & 0xFF) >> 2) & 3
        val padding = ((b(p + 2) & 0xFF) >> 1) & 1
        if ((verBits != 3 && verBits != 2) || layerBits != 1 ||
            brIdx == 0 || brIdx == 15 || srIdx == 3) walking = false
        else {
          val v1 = verBits == 3
          val kb = if (v1) BitrateV1L3(brIdx) else BitrateV2L3(brIdx)
          val sr = if (v1) SampleRateV1(srIdx) else SampleRateV2(srIdx)
          val coef = if (v1) 144 else 72 // Layer III: 144 (MPEG-1) / 72 (MPEG-2)
          val flen = coef * kb * 1000 / sr + padding
          if (flen < 4 || p + flen > b.length) walking = false
          else {
            if (nFrames == 0) { ver = if (v1) 1 else 2; layer = 3; kbps = kb; rate = sr }
            nFrames += 1
            p += flen
          }
        }
      }
    }
    if (nFrames == 0 && title.isEmpty && artist.isEmpty && album.isEmpty) None
    else {
      val spf = if (ver == 2) 576L else 1152L // samples per Layer III frame
      val durMs = if (rate > 0) nFrames.toLong * spf * 1000L / rate else 0L
      Some(Mp3(title, artist, album, ver, layer, kbps, rate, nFrames, durMs))
    }
  }

  /** Build a conformant MP3: ID3v2.3 tag (latin-1 TIT2/TPE1/TALB) +
    * `nFrames` valid MPEG-1 Layer III frames (128 kbps, 44100 Hz,
    * no padding → 417-byte frames, header + zero payload). Fixtures and
    * oracles derive every parsed value closed-form from the arguments.
    */
  def encode(title: String, artist: String, album: String, nFrames: Int): Array[Byte] = {
    require(nFrames >= 1 && nFrames <= 10000, s"bad nFrames $nFrames")
    def frame(id: String, text: String): Array[Byte] = {
      val payload = Array[Byte](0) ++ text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val h = new Array[Byte](10)
      id.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1).copyToArray(h, 0)
      h(4) = ((payload.length >> 24) & 0xFF).toByte
      h(5) = ((payload.length >> 16) & 0xFF).toByte
      h(6) = ((payload.length >> 8) & 0xFF).toByte
      h(7) = (payload.length & 0xFF).toByte
      h ++ payload
    }
    val frames = frame("TIT2", title) ++ frame("TPE1", artist) ++ frame("TALB", album)
    val tagSize = frames.length
    require(tagSize < (1 << 28), "tag too large")
    val hdr = new Array[Byte](10)
    hdr(0) = 'I'; hdr(1) = 'D'; hdr(2) = '3'; hdr(3) = 3; hdr(4) = 0; hdr(5) = 0
    hdr(6) = ((tagSize >> 21) & 0x7F).toByte
    hdr(7) = ((tagSize >> 14) & 0x7F).toByte
    hdr(8) = ((tagSize >> 7) & 0x7F).toByte
    hdr(9) = (tagSize & 0x7F).toByte
    // MPEG-1 Layer III, 128 kbps (idx 9), 44100 Hz (idx 0), no padding:
    // frame length = 144 * 128000 / 44100 = 417 bytes
    val flen = 144 * 128000 / 44100
    val audio = new Array[Byte](flen * nFrames)
    var i = 0
    while (i < nFrames) {
      val o = i * flen
      audio(o) = 0xFF.toByte
      audio(o + 1) = 0xFB.toByte // MPEG-1 (11), Layer III (01), no CRC (1)
      audio(o + 2) = 0x90.toByte // bitrate idx 9, samplerate idx 0, no padding
      audio(o + 3) = 0x00
      i += 1
    }
    hdr ++ frames ++ audio
  }
}
