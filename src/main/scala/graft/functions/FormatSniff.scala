package graft.functions

import java.nio.charset.StandardCharsets

/** Content-based format detection — the Spark analog of the reference's
  * MIME-first `detect_file_type` (combined_pipeline.py:178-206): magic bytes
  * first, structural sniff second, extension is unavailable (rows carry no
  * file name). This is the format-dispatch operator of the north rule
  * (SURVEY.md §2.1 S2).
  */
object FormatSniff {

  final val Pdf = "pdf"
  final val Html = "html"
  final val Txt = "txt"
  final val Empty = "empty"
  final val Binary = "binary"

  def sniff(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.isEmpty) return Empty
    if (startsWith(bytes, "%PDF-")) return Pdf
    // UTF-16 BOMs are plain-text payloads in our corpus (HTML is 8-bit)
    Charsets.sniffBom(bytes) match {
      case Some(("utf-16le", _)) | Some(("utf-16be", _)) => return Txt
      case _                                             => ()
    }
    val n = math.min(bytes.length, 1024)
    val head = new String(bytes, 0, n, StandardCharsets.ISO_8859_1)
    val lower = head.toLowerCase
    if (
      lower.contains("<!doctype html") || lower.contains("<html") ||
      lower.contains("<head") || lower.contains("<body")
    ) return Html
    // binary garbage: NUL bytes or a high ratio of non-printables
    var nonPrintable = 0
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xFF
      if (b == 0) return Binary
      if (b < 0x09 || (b > 0x0D && b < 0x20)) nonPrintable += 1
      i += 1
    }
    if (nonPrintable * 10 > n) Binary else Txt
  }

  private def startsWith(b: Array[Byte], s: String): Boolean = {
    if (b.length < s.length) return false
    var i = 0
    while (i < s.length) {
      if (b(i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }
}
