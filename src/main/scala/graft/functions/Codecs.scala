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

  /** Boundaries of the concatenated RFC 1952 members in a gzip stream:
    * (byte offset, compressed length) per member, in order. This is what
    * makes the per-record-gzipped WARC layout (Common Crawl's) seekable —
    * each member inflates independently, so member file coordinates are
    * random-access record coordinates. None on any malformation
    * (truncated header/stream, bad magic, non-deflate method). Member
    * payloads are inflated into a scratch buffer to find the stream end
    * (constant memory; output discarded), so cost is one decompression
    * pass — the same work an indexer does anyway.
    */
  def gzipMemberBounds(bytes: Array[Byte]): Option[Seq[(Long, Long)]] = {
    if (!isGzip(bytes)) return None
    val out = Seq.newBuilder[(Long, Long)]
    var pos = 0
    while (pos < bytes.length) {
      val start = pos
      if (bytes.length - pos < 10) return None
      if ((bytes(pos) & 0xFF) != 0x1F || (bytes(pos + 1) & 0xFF) != 0x8B ||
        bytes(pos + 2) != 8) return None // deflate is the only defined method
      val flg = bytes(pos + 3) & 0xFF
      pos += 10
      if ((flg & 4) != 0) { // FEXTRA: 2-byte little-endian length + payload
        if (bytes.length - pos < 2) return None
        val xlen = (bytes(pos) & 0xFF) | ((bytes(pos + 1) & 0xFF) << 8)
        pos += 2 + xlen
      }
      if ((flg & 8) != 0) { // FNAME: zero-terminated
        while (pos < bytes.length && bytes(pos) != 0) pos += 1
        pos += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT: zero-terminated
        while (pos < bytes.length && bytes(pos) != 0) pos += 1
        pos += 1
      }
      if ((flg & 2) != 0) pos += 2 // FHCRC
      if (pos >= bytes.length) return None
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(bytes, pos, bytes.length - pos)
        val scratch = new Array[Byte](8192)
        try {
          while (!inf.finished()) {
            if (inf.inflate(scratch) == 0 && (inf.needsInput() || inf.needsDictionary()))
              return None // truncated or preset-dictionary stream
          }
        } catch { case _: java.util.zip.DataFormatException => return None }
        pos += inf.getBytesRead.toInt + 8 // deflate stream + CRC32 + ISIZE
      } finally inf.end()
      if (pos > bytes.length) return None
      out += ((start.toLong, (pos - start).toLong))
    }
    Some(out.result())
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
