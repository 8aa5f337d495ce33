package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ExifMeta

class ExifMetaSpec extends AnyFunSuite {

  private val dto = "2026:08:20 09:15:00"

  test("encode -> parseJpeg round-trip: every surfaced field exact, GPS flag both ways") {
    val withGps = ExifMeta.encode("CamX", "M7", 6, dto, 640, 480, withGps = true)
    val e = ExifMeta.parseJpeg(withGps).get
    assert(!e.bigEndian)
    assert(e.make.contains("CamX") && e.model.contains("M7"))
    assert(e.orientation.contains(6))
    assert(e.dateTimeOriginal.contains(dto))
    assert(e.pixelX.contains(640L) && e.pixelY.contains(480L))
    assert(e.hasGps)
    val noGps = ExifMeta.parseJpeg(ExifMeta.encode("a", "b", 1, dto, 1, 1, withGps = false)).get
    assert(!noGps.hasGps)
  }

  test("third-party layout: big-endian TIFF, out-of-order value area, unknown tags, SHORT dims") {
    // hand-built MM stream: value area placed BEFORE the EXIF IFD and an
    // unknown tag interleaved — a conformant reader follows offsets, not
    // the writer layout our encoder happens to use (the MP4 lesson)
    val buf = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = buf.write(v & 0xFF)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def w32(v: Long): Unit = { w8((v >> 24).toInt); w8((v >> 16).toInt); w8((v >> 8).toInt); w8(v.toInt) }
    // header: MM 42, IFD0 at 26 (value area FIRST — before the IFD)
    w8('M'); w8('M'); w16(42); w32(26)
    // value area at 8: Make "Zebra\0" (6 bytes > 4 -> offset-stored); slack
    buf.write("Zebra".getBytes); w8(0) // off 8..13
    while (buf.size() < 26) w8(0xEE)
    // IFD0 at 26: 4 entries
    w16(4)
    // unknown vendor tag first (must be skipped gracefully)
    w16(0x9999); w16(3); w32(1); w16(777); w16(0)
    // Make: ASCII count 6 at offset 8
    w16(0x010F); w16(2); w32(6); w32(8)
    // Orientation SHORT inline
    w16(0x0112); w16(3); w32(1); w16(3); w16(0)
    // EXIF pointer -> IFD at (26 + 2 + 4*12 + 4) = 80
    w16(0x8769); w16(4); w32(1); w32(80)
    w32(0) // next IFD
    // EXIF IFD at 80: pixel dims as SHORTs (type 3 — the other spec'd type)
    w16(2)
    w16(0xA002); w16(3); w32(1); w16(123); w16(0)
    w16(0xA003); w16(3); w32(1); w16(45); w16(0)
    w32(0)
    val tiff = buf.toByteArray
    val e = ExifMeta.parseTiff(tiff, 0, tiff.length).get
    assert(e.bigEndian)
    assert(e.make.contains("Zebra"))
    assert(e.orientation.contains(3))
    assert(e.pixelX.contains(123L) && e.pixelY.contains(45L))
    assert(e.model.isEmpty && e.dateTimeOriginal.isEmpty && !e.hasGps)
  }

  test("stripExif removes only the Exif APP1; other segments byte-identical; idempotent") {
    val jpeg = ExifMeta.encode("CamX", "M7", 2, dto, 10, 20, withGps = true)
    // splice an APP0 (JFIF) before and an XMP APP1 after the Exif segment
    val app0 = Array[Byte](0xFF.toByte, 0xE0.toByte, 0, 4, 0x4A, 0x46)
    val xmpPayload = "http://ns.adobe.com/xap/1.0/".getBytes
    val xmpLen = xmpPayload.length + 2
    val xmp = Array[Byte](0xFF.toByte, 0xE1.toByte, (xmpLen >> 8).toByte, (xmpLen & 0xFF).toByte) ++ xmpPayload
    val spliced = jpeg.take(2) ++ app0 ++ jpeg.slice(2, jpeg.length - 2) ++ xmp ++ jpeg.takeRight(2)
    assert(ExifMeta.parseJpeg(spliced).isDefined)
    val stripped = ExifMeta.stripExif(spliced)
    assert(ExifMeta.parseJpeg(stripped).isEmpty, "EXIF must be gone after strip")
    // APP0 and XMP APP1 survive byte-identically; only the Exif APP1 is gone
    assert(stripped.containsSlice(app0))
    assert(stripped.containsSlice(xmp))
    val exifSegLen = ((jpeg(4) & 0xFF) << 8) | (jpeg(5) & 0xFF)
    assert(stripped.length == spliced.length - (2 + exifSegLen))
    assert(ExifMeta.stripExif(stripped).sameElements(stripped), "strip must be idempotent")
    // non-JPEG passes through untouched
    val notJpeg = Array[Byte](1, 2, 3)
    assert(ExifMeta.stripExif(notJpeg) eq notJpeg)
  }

  test("fuzz totality: truncations and byte flips never throw; parse is None or a value") {
    val jpeg = ExifMeta.encode("CamX", "M7", 5, dto, 99, 77, withGps = true)
    (0 until jpeg.length).foreach { cut =>
      ExifMeta.parseJpeg(jpeg.take(cut)) // must not throw
      ExifMeta.stripExif(jpeg.take(cut))
    }
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val m = jpeg.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      ExifMeta.parseJpeg(m)
      ExifMeta.stripExif(m)
    }
  }

  test("encoder guards: orientation range and datetime shape are loud") {
    intercept[IllegalArgumentException] { ExifMeta.encode("a", "b", 0, dto, 1, 1, withGps = false) }
    intercept[IllegalArgumentException] { ExifMeta.encode("a", "b", 9, dto, 1, 1, withGps = false) }
    intercept[IllegalArgumentException] { ExifMeta.encode("a", "b", 1, "2026-08-20", 1, 1, withGps = false) }
  }
}
