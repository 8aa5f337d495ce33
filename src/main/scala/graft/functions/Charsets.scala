package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}

/** Charset / encoding detection kernel (SURVEY.md §2.7 F2).
  *
  * Reference semantics: try UTF-8, fall back to latin-1, which is total and
  * never fails (simple_extract.py:239-250, enhanced_extract.py:421-432).
  * We extend the contract with BOM sniffing (UTF-8 / UTF-16LE / UTF-16BE)
  * and, for HTML payloads, a `<meta charset=...>` sniff in the first 1024
  * bytes — deterministic, pure functions over Array[Byte].
  */
object Charsets {

  final case class Decoded(charset: String, text: String)

  /** Detect + decode. `isHtml` enables the meta-charset sniff. */
  def decode(bytes: Array[Byte], isHtml: Boolean = false): Decoded = {
    if (bytes.isEmpty) return Decoded("utf-8", "")
    sniffBom(bytes) match {
      case Some(("utf-8", skip)) =>
        Decoded("utf-8-bom", new String(bytes, skip, bytes.length - skip, StandardCharsets.UTF_8))
      case Some(("utf-16le", skip)) =>
        Decoded("utf-16le", new String(bytes, skip, bytes.length - skip, StandardCharsets.UTF_16LE))
      case Some(("utf-16be", skip)) =>
        Decoded("utf-16be", new String(bytes, skip, bytes.length - skip, StandardCharsets.UTF_16BE))
      case _ =>
        val meta = if (isHtml) sniffMetaCharset(bytes) else None
        meta match {
          case Some("iso-8859-1") | Some("latin-1") | Some("latin1") =>
            Decoded("iso-8859-1", new String(bytes, StandardCharsets.ISO_8859_1))
          case Some("windows-1252") =>
            Decoded("windows-1252", new String(bytes, java.nio.charset.Charset.forName("windows-1252")))
          case _ =>
            // strict UTF-8, latin-1 total fallback (simple_extract.py:239-250)
            strictUtf8(bytes) match {
              case Some(s) => Decoded("utf-8", s)
              case None    => Decoded("iso-8859-1", new String(bytes, StandardCharsets.ISO_8859_1))
            }
        }
    }
  }

  /** BOM sniff → (charset, bytes to skip). */
  def sniffBom(b: Array[Byte]): Option[(String, Int)] = {
    if (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte && b(2) == 0xBF.toByte)
      Some(("utf-8", 3))
    else if (b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xFE.toByte)
      Some(("utf-16le", 2))
    else if (b.length >= 2 && b(0) == 0xFE.toByte && b(1) == 0xFF.toByte)
      Some(("utf-16be", 2))
    else None
  }

  /** Find charset=NAME inside the first 1024 bytes (meta tag / content-type
    * attribute), ASCII-case-insensitively. Quotes optional.
    */
  def sniffMetaCharset(b: Array[Byte]): Option[String] = {
    val n = math.min(b.length, 1024)
    val head = new String(b, 0, n, StandardCharsets.ISO_8859_1).toLowerCase
    val i = head.indexOf("charset=")
    if (i < 0) None
    else {
      var j = i + "charset=".length
      if (j < head.length && (head.charAt(j) == '"' || head.charAt(j) == '\'')) j += 1
      val start = j
      while (j < head.length && (head.charAt(j).isLetterOrDigit || head.charAt(j) == '-' || head.charAt(j) == '_')) j += 1
      if (j > start) Some(head.substring(start, j)) else None
    }
  }

  /** Strict UTF-8 decode; None on any malformed sequence. */
  def strictUtf8(b: Array[Byte]): Option[String] = {
    val dec = StandardCharsets.UTF_8
      .newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try Some(dec.decode(ByteBuffer.wrap(b)).toString)
    catch { case _: CharacterCodingException => None }
  }
}
