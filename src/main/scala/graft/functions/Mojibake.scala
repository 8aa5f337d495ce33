package graft.functions

import java.nio.charset.StandardCharsets
import java.nio.charset.{CharacterCodingException, CodingErrorAction}

/** Mojibake repair — undo the classic web-corpus encoding accident where
  * UTF-8 bytes were decoded as Windows-1252/Latin-1 and re-saved as UTF-8
  * ("café" → "cafÃ©", "it's" → "itâ€™s"), including the double- and
  * triple-encoded variants a multi-hop pipeline produces (ftfy's core
  * `fix_encoding` loop, Speer 2019, re-expressed as a pure JDK scalar).
  *
  * The reverse transform re-encodes the TEXT as "sloppy cp1252" —
  * Windows-1252 with its five undefined bytes (0x81 0x8D 0x8F 0x90 0x9D)
  * mapped to the matching C1 control points, exactly ftfy's
  * `sloppy-windows-1252` — and strictly re-decodes the bytes as UTF-8.
  * That byte↔char table is a BIJECTION on 0x00-0xFF, so one repair pass
  * inverts one corruption pass exactly, and k stacked corruptions peel
  * off in k passes.
  *
  * A pass is accepted only if (a) every char of the line maps back to a
  * byte (chars outside Latin-1 + the 27 cp1252 specials prove the line
  * was never byte-decoded, so there is nothing to undo), (b) the whole
  * byte string is STRICTLY valid UTF-8 — the all-or-nothing guard that
  * keeps legitimately accented text untouched ("é" alone is a lone
  * continuation-less lead byte, never valid — while real mojibake, being
  * a re-decoded UTF-8 byte image, always passes), and (c) the decode
  * changed something. Repair runs PER LINE (ftfy's granularity): a doc
  * with one corrupted line and one clean accented line repairs only the
  * broken one.
  *
  * Scale shape: a pure scalar — map-only, no state, no shuffle; registered
  * on the SQL surface as `fix_mojibake` ([[SqlFunctions]]). Reference
  * analog: the charset-cascade tier ([[Charsets]], enhanced_extract.py's
  * decode fallbacks) handles bytes not yet decoded; this repairs text a
  * previous system already decoded WRONG — the web-scale corpus reality
  * the reference never meets because it reads original bytes.
  */
object Mojibake {

  /** cp1252 bytes 0x80-0x9F as chars; the five holes keep their C1 code
    * points (the "sloppy" part — a bijection needs every byte mapped).
    */
  private val HighTable: Array[Char] = Array(
    0x20AC, 0x0081, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008D, 0x017D, 0x008F,
    0x0090, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x009D, 0x017E, 0x0178)
    .map(_.toChar)

  private val CharToByte: Map[Char, Byte] = {
    val base = (0 until 256).filter(c => c < 0x80 || c > 0x9F).map(c => (c.toChar, c.toByte))
    val high = HighTable.zipWithIndex.map { case (ch, i) => (ch, (0x80 + i).toByte) }
    (base ++ high).toMap
  }

  /** One corruption step: the string's UTF-8 bytes mis-decoded as sloppy
    * cp1252 (what a cp1252 reader shows for UTF-8 input). Public because
    * tests and the oracle query synthesize known damage with it; it is the
    * exact inverse of one repair pass.
    */
  def corrupt(s: String): String = {
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    val out = new StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      out.append(if (b >= 0x80 && b <= 0x9F) HighTable(b - 0x80) else b.toChar)
      i += 1
    }
    out.toString
  }

  /** One repair pass over one line; None when the line is not a decodable
    * byte image (see acceptance rules in the scaladoc).
    */
  def fixOnce(line: String): Option[String] = {
    if (line.isEmpty) return None
    val bytes = new Array[Byte](line.length)
    var i = 0
    while (i < line.length) {
      CharToByte.get(line.charAt(i)) match {
        case Some(b) => bytes(i) = b
        case None    => return None
      }
      i += 1
    }
    val dec = StandardCharsets.UTF_8
      .newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try {
      val decoded = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (decoded == line) None else Some(decoded)
    } catch {
      case _: CharacterCodingException => None
    }
  }

  /** Repair a document: per line, peel corruption passes until the line
    * stops decoding (or `maxPasses`). Returns (repaired text, depth) where
    * depth = the MAX passes any line needed — the document's corruption
    * depth (an ASCII line is a fixed point of the corruption, so depth
    * reads through mixed docs correctly).
    */
  def fix(s: String, maxPasses: Int = 3): (String, Int) = {
    if (s == null) return (null, 0)
    var depth = 0
    val lines = s.split("\n", -1)
    var li = 0
    while (li < lines.length) {
      var cur = lines(li)
      var p = 0
      var continue = true
      while (continue && p < maxPasses) {
        fixOnce(cur) match {
          case Some(next) => cur = next; p += 1
          case None       => continue = false
        }
      }
      lines(li) = cur
      if (p > depth) depth = p
      li += 1
    }
    (lines.mkString("\n"), depth)
  }
}
