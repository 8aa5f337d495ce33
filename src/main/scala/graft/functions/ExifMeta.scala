package graft.functions

/** EXIF metadata for the image-corpus curation tier — pure-JDK TIFF/IFD
  * walking inside a JPEG's APP1 segment, plus the privacy scrub that
  * DELETES the segment.
  *
  * Why a corpus pipeline needs it:
  *  - `orientation` gates correct decode/resize (a rotated thumbnail is a
  *    different training image),
  *  - `DateTimeOriginal` is capture provenance (recrawl dedup, temporal
  *    splits),
  *  - `make`/`model` distributions audit corpus diversity,
  *  - GPS PRESENCE is a PII flag: published corpora strip location EXIF —
  *    [[stripExif]] is that scrub, the image analog of
  *    [[graft.functions.PiiScrub]].
  *
  * Reference analog: the reference treats images as first-class inputs and
  * routes them by MIME (combined_pipeline.py:178-206); metadata extraction
  * is the deterministic replacement for its vision-model description stage
  * (disabled there — config.py:34).
  *
  * Format (ISO/IEC 10918 + TIFF 6.0 + EXIF 2.3):
  *  - JPEG APP1 marker 0xFFE1 with payload `Exif\0\0` + TIFF stream.
  *  - TIFF header: `II`/`MM` byte order, magic 42, offset to IFD0. Both
  *    byte orders parsed (the MP4 third-party-layout lesson: conformant
  *    writers differ, so the walker follows offsets, never writer layout).
  *  - IFD: u16 count, then 12-byte entries (tag, type, count,
  *    value-or-offset; values ≤ 4 bytes inline). IFD0 carries Make
  *    (0x010F), Model (0x0110), Orientation (0x0112), and the EXIF
  *    (0x8769) / GPS (0x8825) sub-IFD pointers; the EXIF IFD carries
  *    DateTimeOriginal (0x9003) and the pixel dimensions (0xA002/0xA003,
  *    SHORT or LONG per spec).
  *
  * Totality: every read is bounds-checked, IFD entry counts are capped,
  * and any structural violation yields None — never a throw (fuzz-tested
  * like the other codecs).
  */
object ExifMeta {

  final case class Exif(
      bigEndian: Boolean,
      orientation: Option[Int],
      make: Option[String],
      model: Option[String],
      dateTimeOriginal: Option[String],
      pixelX: Option[Long],
      pixelY: Option[Long],
      hasGps: Boolean)

  private final val MaxIfdEntries = 512

  /** Parse the first Exif APP1 segment of a JPEG; None when absent or
    * structurally invalid.
    */
  def parseJpeg(b: Array[Byte]): Option[Exif] = {
    if (b == null || b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return None
    var pos = 2
    while (pos + 4 <= b.length && (b(pos) & 0xFF) == 0xFF) {
      val marker = b(pos + 1) & 0xFF
      if (marker == 0xD9 || marker == 0xDA) return None // EOI / SOS: no EXIF seen
      val segLen = ((b(pos + 2) & 0xFF) << 8) | (b(pos + 3) & 0xFF)
      if (segLen < 2 || pos + 2 + segLen > b.length) return None
      if (marker == 0xE1 && segLen >= 8 &&
          b(pos + 4) == 'E' && b(pos + 5) == 'x' && b(pos + 6) == 'i' &&
          b(pos + 7) == 'f' && b(pos + 8) == 0 && b(pos + 9) == 0) {
        return parseTiff(b, pos + 10, segLen - 8)
      }
      pos += 2 + segLen
    }
    None
  }

  /** Parse a TIFF stream at b[base until base+len). */
  def parseTiff(b: Array[Byte], base: Int, len: Int): Option[Exif] = {
    if (len < 8 || base < 0 || base + len > b.length) return None
    val big =
      if (b(base) == 'M' && b(base + 1) == 'M') true
      else if (b(base) == 'I' && b(base + 1) == 'I') false
      else return None

    def u16(off: Int): Int = {
      if (off < 0 || off + 2 > len) return -1
      val p = base + off
      if (big) ((b(p) & 0xFF) << 8) | (b(p + 1) & 0xFF)
      else ((b(p + 1) & 0xFF) << 8) | (b(p) & 0xFF)
    }
    def u32(off: Int): Long = {
      if (off < 0 || off + 4 > len) return -1L
      val p = base + off
      if (big)
        ((b(p) & 0xFFL) << 24) | ((b(p + 1) & 0xFFL) << 16) | ((b(p + 2) & 0xFFL) << 8) | (b(p + 3) & 0xFFL)
      else
        ((b(p + 3) & 0xFFL) << 24) | ((b(p + 2) & 0xFFL) << 16) | ((b(p + 1) & 0xFFL) << 8) | (b(p) & 0xFFL)
    }

    if (u16(2) != 42) return None
    val ifd0 = u32(4)
    if (ifd0 < 8 || ifd0 > len - 2) return None

    // one IFD pass: collect the tags we surface. Entries are
    // (tag, type, count, valueField@entryOff+8).
    final case class Entry(tag: Int, typ: Int, count: Long, valOff: Int)
    def readIfd(off: Long): Seq[Entry] = {
      if (off < 0 || off + 2 > len) return Nil
      val n = u16(off.toInt)
      if (n < 0 || n > MaxIfdEntries) return Nil
      (0 until n).flatMap { i =>
        val e = off.toInt + 2 + i * 12
        if (e + 12 > len) None
        else Some(Entry(u16(e), u16(e + 2), u32(e + 4), e + 8))
      }
    }
    def valueSize(typ: Int): Int = typ match {
      case 1 | 2 | 6 | 7 => 1 // BYTE/ASCII/SBYTE/UNDEFINED
      case 3 | 8         => 2 // SHORT/SSHORT
      case 4 | 9 | 11    => 4 // LONG/SLONG/FLOAT
      case 5 | 10 | 12   => 8 // RATIONAL/SRATIONAL/DOUBLE
      case _             => 0
    }
    // offset (within the TIFF stream) of an entry's value bytes
    def valuePos(e: Entry): Int = {
      val sz = valueSize(e.typ)
      if (sz == 0 || e.count < 0 || e.count > Int.MaxValue / 8) return -1
      val total = sz * e.count
      if (total <= 4) e.valOff else {
        val off = u32(e.valOff)
        if (off < 0 || off + total > len) -1 else off.toInt
      }
    }
    def shortOrLong(e: Entry): Option[Long] = {
      if (e.count != 1) return None
      val p = valuePos(e)
      if (p < 0) None
      else if (e.typ == 3) { val v = u16(p); if (v < 0) None else Some(v.toLong) }
      else if (e.typ == 4) { val v = u32(p); if (v < 0) None else Some(v) }
      else None
    }
    def ascii(e: Entry): Option[String] = {
      if (e.typ != 2 || e.count <= 0 || e.count > 4096) return None
      val p = valuePos(e)
      if (p < 0) None
      else {
        var end = p + e.count.toInt
        // trim the spec's trailing NUL(s)
        while (end > p && b(base + end - 1) == 0) end -= 1
        Some(new String(b, base + p, end - p, java.nio.charset.StandardCharsets.US_ASCII))
      }
    }

    val ifd0Entries = readIfd(ifd0)
    def tag0(t: Int): Option[Entry] = ifd0Entries.find(_.tag == t)
    val exifPtr = tag0(0x8769).flatMap(shortOrLong)
    val gpsPtr = tag0(0x8825).flatMap(shortOrLong)
    val exifEntries = exifPtr.map(readIfd).getOrElse(Nil)
    def tagE(t: Int): Option[Entry] = exifEntries.find(_.tag == t)

    Some(Exif(
      bigEndian = big,
      orientation = tag0(0x0112).flatMap(shortOrLong).map(_.toInt),
      make = tag0(0x010F).flatMap(ascii),
      model = tag0(0x0110).flatMap(ascii),
      dateTimeOriginal = tagE(0x9003).flatMap(ascii),
      pixelX = tagE(0xA002).flatMap(shortOrLong),
      pixelY = tagE(0xA003).flatMap(shortOrLong),
      hasGps = gpsPtr.exists(p => p >= 8 && p < len)
    ))
  }

  /** Privacy scrub: return the JPEG with every Exif APP1 segment REMOVED
    * (XMP APP1 and all other segments pass through byte-identically);
    * idempotent; non-JPEG input returned unchanged. Segments after SOS
    * are entropy data and are copied verbatim.
    */
  def stripExif(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return b
    val out = new java.io.ByteArrayOutputStream(b.length)
    out.write(b, 0, 2)
    var pos = 2
    var inSegments = true
    while (inSegments && pos + 4 <= b.length && (b(pos) & 0xFF) == 0xFF) {
      val marker = b(pos + 1) & 0xFF
      if (marker == 0xDA || marker == 0xD9) inSegments = false
      else {
        val segLen = ((b(pos + 2) & 0xFF) << 8) | (b(pos + 3) & 0xFF)
        if (segLen < 2 || pos + 2 + segLen > b.length) inSegments = false
        else {
          val isExif = marker == 0xE1 && segLen >= 8 &&
            b(pos + 4) == 'E' && b(pos + 5) == 'x' && b(pos + 6) == 'i' &&
            b(pos + 7) == 'f' && b(pos + 8) == 0 && b(pos + 9) == 0
          if (!isExif) out.write(b, pos, 2 + segLen)
          pos += 2 + segLen
        }
      }
    }
    out.write(b, pos, b.length - pos)
    out.toByteArray
  }

  /** Build a minimal conformant JPEG carrying an Exif APP1 (little-endian
    * TIFF): SOI + APP1 + SOF0 stub + EOI — enough structure for any
    * segment walker; fixtures and oracles derive field values closed-form.
    * `withGps` plants a minimal GPS IFD (GPSVersionID only): presence is
    * the PII flag, coordinates stay out of the synthetic corpus.
    */
  def encode(
      make: String,
      model: String,
      orientation: Int,
      dateTimeOriginal: String,
      pixelX: Int,
      pixelY: Int,
      withGps: Boolean
  ): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, s"bad orientation $orientation")
    require(dateTimeOriginal.length == 19, "EXIF datetime must be 'YYYY:MM:DD HH:MM:SS'")
    val makeB = (make + "\u0000").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val modelB = (model + "\u0000").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val dtoB = (dateTimeOriginal + "\u0000").getBytes(java.nio.charset.StandardCharsets.US_ASCII)

    // TIFF layout (all offsets from TIFF base):
    //   8:       IFD0 (n entries + next ptr)
    //   after:   EXIF IFD, then GPS IFD (optional), then the value area
    val n0 = 4 + (if (withGps) 1 else 0) // Make, Model, Orientation, ExifPtr [, GpsPtr]
    val ifd0Off = 8
    val ifd0Size = 2 + n0 * 12 + 4
    val exifOff = ifd0Off + ifd0Size
    val nE = 3 // DateTimeOriginal, PixelX, PixelY
    val exifSize = 2 + nE * 12 + 4
    val gpsOff = exifOff + exifSize
    val gpsSize = if (withGps) 2 + 1 * 12 + 4 else 0
    // TIFF 6.0: values of <= 4 bytes are stored INLINE in the value field;
    // only longer values go to the value area
    var valOff = gpsOff + gpsSize
    def alloc(n: Int): Int = if (n <= 4) -1 else { val o = valOff; valOff += n; o }
    val makeOff = alloc(makeB.length)
    val modelOff = alloc(modelB.length)
    val dtoOff = alloc(dtoB.length)
    val tiff = new Array[Byte](valOff)

    def w16(off: Int, v: Int): Unit = { tiff(off) = (v & 0xFF).toByte; tiff(off + 1) = ((v >> 8) & 0xFF).toByte }
    def w32(off: Int, v: Long): Unit = {
      tiff(off) = (v & 0xFF).toByte; tiff(off + 1) = ((v >> 8) & 0xFF).toByte
      tiff(off + 2) = ((v >> 16) & 0xFF).toByte; tiff(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    def entry(off: Int, tag: Int, typ: Int, count: Long, value: Long): Unit = {
      w16(off, tag); w16(off + 2, typ); w32(off + 4, count); w32(off + 8, value)
    }
    // ASCII entry: inline when <= 4 bytes (dataOff == -1), offset otherwise
    def asciiEntry(off: Int, tag: Int, bytes: Array[Byte], dataOff: Int): Unit = {
      w16(off, tag); w16(off + 2, 2); w32(off + 4, bytes.length)
      if (dataOff < 0) System.arraycopy(bytes, 0, tiff, off + 8, bytes.length)
      else { w32(off + 8, dataOff); System.arraycopy(bytes, 0, tiff, dataOff, bytes.length) }
    }
    // header
    tiff(0) = 'I'; tiff(1) = 'I'; w16(2, 42); w32(4, ifd0Off)
    // IFD0 — tags must be ascending per TIFF 6.0
    w16(ifd0Off, n0)
    var e = ifd0Off + 2
    asciiEntry(e, 0x010F, makeB, makeOff); e += 12
    asciiEntry(e, 0x0110, modelB, modelOff); e += 12
    entry(e, 0x0112, 3, 1, orientation); e += 12
    entry(e, 0x8769, 4, 1, exifOff); e += 12
    if (withGps) { entry(e, 0x8825, 4, 1, gpsOff); e += 12 }
    w32(e, 0) // next IFD: none
    // EXIF IFD
    w16(exifOff, nE)
    e = exifOff + 2
    asciiEntry(e, 0x9003, dtoB, dtoOff); e += 12
    entry(e, 0xA002, 4, 1, pixelX); e += 12
    entry(e, 0xA003, 4, 1, pixelY); e += 12
    w32(e, 0)
    // GPS IFD: GPSVersionID = 2.3.0.0, inline BYTE[4]
    if (withGps) {
      w16(gpsOff, 1)
      entry(gpsOff + 2, 0x0000, 1, 4, 0x00000302L)
      w32(gpsOff + 2 + 12, 0)
    }

    val app1Payload = Array[Byte]('E', 'x', 'i', 'f', 0, 0) ++ tiff
    val out = new java.io.ByteArrayOutputStream(app1Payload.length + 64)
    out.write(0xFF); out.write(0xD8) // SOI
    out.write(0xFF); out.write(0xE1) // APP1
    val segLen = app1Payload.length + 2
    out.write((segLen >> 8) & 0xFF); out.write(segLen & 0xFF)
    out.write(app1Payload, 0, app1Payload.length)
    // minimal SOF0 stub (1x1 gray) so the file reads as a JPEG skeleton
    val sof = Array[Int](0xFF, 0xC0, 0x00, 0x0B, 0x08, 0x00, 0x01, 0x00, 0x01, 0x01, 0x01, 0x11, 0x00)
    sof.foreach(out.write)
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }
}
