package graft.functions

/** ISO base-media (MP4) metadata codec — the video leg of the multimodal
  * tier. Codec payloads (H.264 et al.) are out of scope like JPEG entropy
  * data, but the CONTAINER is pure structured bytes: nested length-prefixed
  * boxes (ISO/IEC 14496-12). This builds and walks real box trees —
  * `ftyp` + `moov[mvhd + trak[tkhd]]` — so dimension/duration extraction
  * over a video column is genuine container parsing, oracle-checked by
  * closed-form arithmetic in m_video_meta.
  */
object Mp4Meta {

  final case class Meta(width: Int, height: Int, durationMs: Long)

  // ---- encode --------------------------------------------------------------

  /** Minimal spec-shaped MP4: ftyp(isom) + moov[mvhd(timescale 1000) +
    * trak[tkhd(track 1, fixed-point dims)]].
    */
  def encode(meta: Meta): Array[Byte] = {
    // duration is stored as an unsigned 32-bit value (version-0 boxes)
    require(meta.durationMs >= 0 && meta.durationMs <= 0xFFFFFFFFL,
      s"durationMs ${meta.durationMs} does not fit a version-0 box")
    // tkhd dims are 16.16 fixed point: values past 65535 would silently
    // truncate mod 2^16 into a corrupt-but-parseable file
    require(meta.width > 0 && meta.width <= 0xFFFF,
      s"width ${meta.width} does not fit 16.16 fixed point")
    require(meta.height > 0 && meta.height <= 0xFFFF,
      s"height ${meta.height} does not fit 16.16 fixed point")
    // mvhd v0 payload offsets (ISO/IEC 14496-12 §8.2.2): version+flags 0,
    // creation_time 4, modification_time 8, timescale 12, duration 16,
    // rate 20, volume 24, reserved 26/28, matrix 36, pre_defined 72,
    // next_track_ID 96
    val mvhd = {
      val b = new Array[Byte](100)
      putBe32(b, 12, 1000) // timescale: 1000 -> duration is in ms
      putBe32(b, 16, meta.durationMs.toInt)
      putBe32(b, 20, 0x00010000) // rate 1.0
      b(24) = 0x01; b(25) = 0x00 // volume 1.0
      unitMatrix(b, 36)
      putBe32(b, 96, 2) // next track id
      b
    }
    val tkhd = {
      val b = new Array[Byte](84)
      b(3) = 0x03 // flags: enabled + in movie
      putBe32(b, 12, 1) // track id
      putBe32(b, 20, meta.durationMs.toInt)
      unitMatrix(b, 40)
      putBe32(b, 76, meta.width << 16) // 16.16 fixed point
      putBe32(b, 80, meta.height << 16)
      b
    }
    val trak = box("trak", box("tkhd", tkhd))
    val moov = box("moov", box("mvhd", mvhd) ++ trak)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32bytes(0x200) ++
      "isomiso2".getBytes("US-ASCII"))
    ftyp ++ moov
  }

  // ---- decode --------------------------------------------------------------

  /** Walk the box tree for mvhd (timescale/duration) and the first tkhd
    * (fixed-point dims). None unless both are present and well-formed —
    * truncated boxes or declared sizes past the buffer fail loudly.
    */
  def decode(b: Array[Byte]): Option[Meta] = {
    var timescale = 0L
    var duration = -1L
    var w = -1
    var h = -1
    def walk(from: Int, to: Int, depth: Int): Boolean = {
      var pos = from
      while (pos < to) {
        if (pos + 8 > to) return false
        val size = be32(b, pos)
        val tpe = new String(b, pos + 4, 4, "US-ASCII")
        // Long arithmetic: a crafted size near Int.MaxValue must fail the
        // bound, not wrap negative and index out of the buffer
        if (size < 8 || pos.toLong + size > to) return false
        tpe match {
          case "moov" | "trak" =>
            if (depth < 4 && !walk(pos + 8, pos + size, depth + 1)) return false
          case "mvhd" =>
            if (size < 8 + 100 || (b(pos + 8) & 0xFF) != 0) return false // version 0 only
            timescale = be32(b, pos + 8 + 12).toLong & 0xFFFFFFFFL
            duration = be32(b, pos + 8 + 16).toLong & 0xFFFFFFFFL
          case "tkhd" =>
            if (size < 8 + 84 || (b(pos + 8) & 0xFF) != 0) return false
            if (w < 0) { // first video track wins
              w = be32(b, pos + 8 + 76) >>> 16
              h = be32(b, pos + 8 + 80) >>> 16
            }
          case _ => () // ftyp, free, mdat, ...: skip
        }
        pos += size
      }
      pos == to
    }
    if (b.length < 16 || !walk(0, b.length, 0)) return None
    if (timescale <= 0 || duration < 0 || w <= 0 || h <= 0) return None
    Some(Meta(w, h, duration * 1000L / timescale))
  }

  // ---- helpers -------------------------------------------------------------

  /** Frame-sampling plan from parsed container metadata: the timestamps
    * (ms) a decoder would be asked to seek to at one frame per
    * `intervalMs`, starting at 0, last at or before the duration. This
    * is the Spark-side PLUMBING of multimodal frame extraction — the
    * schedule is pure container arithmetic and needs no codec; the
    * decode step itself is out of scope like JPEG entropy data was
    * before the baseline decoder landed.
    */
  def framePlan(meta: Meta, intervalMs: Long): Array[Long] = {
    require(intervalMs > 0, s"intervalMs must be positive, got $intervalMs")
    val n = (meta.durationMs / intervalMs + 1).toInt
    Array.tabulate(n)(i => i * intervalMs)
  }

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + payload.length)
    putBe32(out, 0, out.length)
    var i = 0
    while (i < 4) { out(4 + i) = tpe.charAt(i).toByte; i += 1 }
    System.arraycopy(payload, 0, out, 8, payload.length)
    out
  }

  private def unitMatrix(b: Array[Byte], at: Int): Unit = {
    putBe32(b, at, 0x00010000)
    putBe32(b, at + 16, 0x00010000)
    putBe32(b, at + 32, 0x40000000)
  }

  @inline private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) | ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)

  @inline private def putBe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }

  private def be32bytes(v: Int): Array[Byte] = {
    val b = new Array[Byte](4); putBe32(b, 0, v); b
  }
}
