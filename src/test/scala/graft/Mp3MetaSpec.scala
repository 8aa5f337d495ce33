package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Mp3Meta

class Mp3MetaSpec extends AnyFunSuite {

  test("encode -> parse round-trip: tag fields, codec params, frame count, duration") {
    val b = Mp3Meta.encode("Title X", "Artist Y", "Album Z", nFrames = 10)
    val m = Mp3Meta.parse(b).get
    assert(m.title.contains("Title X") && m.artist.contains("Artist Y") && m.album.contains("Album Z"))
    assert(m.version == 1 && m.layer == 3 && m.bitrateKbps == 128 && m.sampleRate == 44100)
    assert(m.nFrames == 10)
    assert(m.durationMs == 10L * 1152 * 1000 / 44100) // 261 ms
  }

  test("third-party layout: v2.4 syncsafe sizes, UTF-8 text, unknown frame, padding, MPEG-2 audio") {
    val buf = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = buf.write(v & 0xFF)
    def frame24(id: String, payload: Array[Byte]): Unit = {
      id.getBytes("ISO-8859-1").foreach(c => w8(c))
      // v2.4 syncsafe size
      w8((payload.length >> 21) & 0x7F); w8((payload.length >> 14) & 0x7F)
      w8((payload.length >> 7) & 0x7F); w8(payload.length & 0x7F)
      w8(0); w8(0)
      buf.write(payload, 0, payload.length)
    }
    val t = Array[Byte](3) ++ "Tïtle".getBytes("UTF-8") // enc 3 = UTF-8
    frame24("TIT2", t)
    frame24("XXXX", Array[Byte](1, 2, 3)) // unknown frame skipped
    frame24("TPE1", Array[Byte](0) ++ "A".getBytes("ISO-8859-1"))
    (1 to 12).foreach(_ => w8(0)) // tag padding
    val tagBody = buf.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'); out.write('D'); out.write('3'); out.write(4); out.write(0); out.write(0)
    out.write((tagBody.length >> 21) & 0x7F); out.write((tagBody.length >> 14) & 0x7F)
    out.write((tagBody.length >> 7) & 0x7F); out.write(tagBody.length & 0x7F)
    out.write(tagBody, 0, tagBody.length)
    // MPEG-2 Layer III, 64 kbps (idx 8), 24000 Hz (idx 1): 192-byte frames
    val flen = 72 * 64 * 1000 / 24000
    (1 to 3).foreach { _ =>
      val f = new Array[Byte](flen)
      f(0) = 0xFF.toByte; f(1) = 0xF3.toByte; f(2) = 0x84.toByte
      out.write(f, 0, flen)
    }
    val m = Mp3Meta.parse(out.toByteArray).get
    assert(m.title.contains("Tïtle") && m.artist.contains("A") && m.album.isEmpty)
    assert(m.version == 2 && m.bitrateKbps == 64 && m.sampleRate == 24000)
    assert(m.nFrames == 3)
    assert(m.durationMs == 3L * 576 * 1000 / 24000) // 72 ms
  }

  test("tag-only and audio-only payloads both parse; truncated tail stops the walk cleanly") {
    val full = Mp3Meta.encode("T", "A", "B", 4)
    val tagLen = full.length - 4 * 417
    val tagOnly = full.take(tagLen)
    val mTag = Mp3Meta.parse(tagOnly).get
    assert(mTag.title.contains("T") && mTag.nFrames == 0 && mTag.durationMs == 0L)
    val audioOnly = full.drop(tagLen)
    val mAud = Mp3Meta.parse(audioOnly).get
    assert(mAud.title.isEmpty && mAud.nFrames == 4 && mAud.bitrateKbps == 128)
    // truncating mid-frame drops only the partial frame
    val cut = Mp3Meta.parse(full.dropRight(10)).get
    assert(cut.nFrames == 3)
  }

  test("UTF-16 text frames: ASCII-final chars survive terminator trimming (2-byte-unit trim)") {
    // 'Abba' in UTF-16LE ends ...61 00 — a byte-wise NUL trim would eat the
    // final char's high byte, leaving an odd byte count that decodes the
    // last char to U+FFFD. The trim must step in code units for enc 1/2.
    def tag(frames: Array[Byte]*): Array[Byte] = {
      val body = frames.flatMap { p =>
        val hdr = new java.io.ByteArrayOutputStream()
        hdr.write('T'); hdr.write('I'); hdr.write('T'); hdr.write('2')
        hdr.write((p.length >> 24) & 0xFF); hdr.write((p.length >> 16) & 0xFF)
        hdr.write((p.length >> 8) & 0xFF); hdr.write(p.length & 0xFF)
        hdr.write(0); hdr.write(0)
        hdr.toByteArray ++ p
      }.toArray
      val out = new java.io.ByteArrayOutputStream()
      out.write('I'); out.write('D'); out.write('3'); out.write(3); out.write(0); out.write(0)
      out.write((body.length >> 21) & 0x7F); out.write((body.length >> 14) & 0x7F)
      out.write((body.length >> 7) & 0x7F); out.write(body.length & 0x7F)
      out.write(body, 0, body.length)
      out.toByteArray
    }
    // enc 1 = UTF-16 with BOM (LE here), terminated by 00 00
    val utf16le = Array[Byte](1, 0xFF.toByte, 0xFE.toByte) ++
      "Abba".getBytes("UTF-16LE") ++ Array[Byte](0, 0)
    assert(Mp3Meta.parse(tag(utf16le)).get.title.contains("Abba"))
    // same payload without a terminator must also round-trip untouched
    val utf16leNoTerm = Array[Byte](1, 0xFF.toByte, 0xFE.toByte) ++ "Abba".getBytes("UTF-16LE")
    assert(Mp3Meta.parse(tag(utf16leNoTerm)).get.title.contains("Abba"))
    // enc 2 = UTF-16BE (no BOM): 'Ab' ends 00 62 — safe — but terminator
    // 00 00 plus a leading-zero-byte char exercises the BE trim path
    val utf16be = Array[Byte](2) ++ "Abba".getBytes("UTF-16BE") ++ Array[Byte](0, 0)
    assert(Mp3Meta.parse(tag(utf16be)).get.title.contains("Abba"))
    // latin-1 single-byte trim unchanged
    val lat = Array[Byte](0) ++ "Abba".getBytes("ISO-8859-1") ++ Array[Byte](0)
    assert(Mp3Meta.parse(tag(lat)).get.title.contains("Abba"))
  }

  test("garbage and guards: None on junk, loud encoder bounds") {
    assert(Mp3Meta.parse(Array[Byte](1, 2, 3, 4, 5)).isEmpty)
    assert(Mp3Meta.parse(null).isEmpty)
    assert(Mp3Meta.parse("ID3junk".getBytes("ISO-8859-1")).isEmpty)
    intercept[IllegalArgumentException] { Mp3Meta.encode("t", "a", "b", 0) }
  }
}
