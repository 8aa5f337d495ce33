package graft.functions

import java.io.ByteArrayInputStream
import java.util.zip.GZIPInputStream

/** Gzip envelope handling for crawl payloads. Real web corpora carry
  * compressed bodies everywhere — HTTP `Content-Encoding: gzip` responses
  * and per-record-gzipped WARC archives — so the extraction tier must see
  * through the envelope without trusting it: the decompressor is BOUNDED
  * (a 10 KB zip bomb must not allocate 10 GB on an executor) and total
  * (corrupt streams return None, never throw into the task).
  */
object Codecs {

  /** RFC 1952 magic. */
  def isGzip(b: Array[Byte]): Boolean =
    b != null && b.length >= 2 && (b(0) & 0xFF) == 0x1F && (b(1) & 0xFF) == 0x8B

  /** Decompress one-or-more concatenated gzip members (GZIPInputStream
    * handles multi-member streams per RFC 1952). None on corrupt input or
    * when the inflated size exceeds `maxOut` — the caller decides whether
    * an oversized payload is an error or needs a streaming path.
    */
  def gunzip(bytes: Array[Byte], maxOut: Int = 64 << 20): Option[Array[Byte]] = {
    if (!isGzip(bytes)) return None
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      try {
        val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 4, 1 << 16))
        val buf = new Array[Byte](8192)
        var total = 0L
        var n = in.read(buf)
        while (n >= 0) {
          total += n
          if (total > maxOut) return None // bomb guard
          out.write(buf, 0, n)
          n = in.read(buf)
        }
        Some(out.toByteArray)
      } finally in.close()
    } catch {
      case _: java.io.IOException => None // corrupt header/CRC/truncated
    }
  }

  /** Compress (single member). Test/generator helper and WARC writer leg. */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(math.max(64, bytes.length / 2))
    val out = new java.util.zip.GZIPOutputStream(bos)
    out.write(bytes)
    out.close()
    bos.toByteArray
  }
}
