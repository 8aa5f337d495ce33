package graft.functions

import scala.collection.mutable

/** Complete pure-JDK GIF codec for palette (<= 256 color) RGB images:
  * variable-length-code LZW on both the encode and decode path (GIF89a
  * Appendix F), global color table, sub-block framing, and the four-pass
  * interlace row order (spec Appendix E). Completes the codec family next
  * to [[PngCodec]] (zlib + scanline filters) and [[JpegCodec]] (baseline
  * Huffman + IDCT): payload bytes in, pixel values out, zero external
  * libraries. Reference analog: image MIME routing in the reference
  * pipeline (combined_pipeline.py:178-206) treats GIF as a first-class
  * image type; here the decode is real.
  *
  * Scope (spec-subset discipline, like the PDF parser): the FIRST image
  * of a file is decoded; extensions (graphic control, comment,
  * application) are walked and skipped; animated GIFs therefore decode to
  * their first frame only, and a frame smaller than the logical screen
  * decodes to that frame's own w x h. Malformed input returns None —
  * never a fabricated image.
  */
object GifCodec {

  import PngCodec.Image // 8-bit RGB pixel buffer shared across the codecs

  private final val MaxCodeBits = 12
  private final val MaxDictSize = 1 << MaxCodeBits // 4096

  // ---- encode --------------------------------------------------------------

  /** Encode an RGB image with at most 256 distinct colors as a spec-valid
    * GIF89a file (global color table, real growing-dictionary LZW,
    * optional interlace). Colors beyond 256 are a caller error — GIF is a
    * palette format and silent quantization would break pixel oracles.
    */
  def encode(img: Image, interlaced: Boolean = false): Array[Byte] = {
    require(img.width > 0 && img.width <= 0xFFFF && img.height > 0 && img.height <= 0xFFFF,
      s"GIF dims must fit u16: ${img.width} x ${img.height}")
    // palette in first-appearance raster order; indices per pixel
    val paletteIx = mutable.LinkedHashMap.empty[Int, Int]
    val nPix = img.width * img.height
    val indices = new Array[Byte](nPix)
    var p = 0
    while (p < nPix) {
      val rgb = ((img.rgb(p * 3) & 0xFF) << 16) | ((img.rgb(p * 3 + 1) & 0xFF) << 8) | (img.rgb(p * 3 + 2) & 0xFF)
      val ix = paletteIx.getOrElseUpdate(rgb, paletteIx.size)
      require(ix < 256, "GIF encode: more than 256 distinct colors")
      indices(p) = ix.toByte
      p += 1
    }
    // color table size: power of two >= max(2, nColors); field stores log2-1
    var tableBits = 1
    while ((1 << tableBits) < paletteIx.size) tableBits += 1
    val tableSize = 1 << tableBits

    val out = new java.io.ByteArrayOutputStream(64 + nPix / 2)
    out.write("GIF89a".getBytes("US-ASCII"))
    writeU16(out, img.width); writeU16(out, img.height)
    out.write(0x80 | ((tableBits - 1) << 4) | (tableBits - 1)) // GCT flag, color res, GCT size
    out.write(0) // background color index
    out.write(0) // pixel aspect ratio
    val pal = paletteIx.keys.toArray
    var c = 0
    while (c < tableSize) {
      val rgb = if (c < pal.length) pal(c) else 0
      out.write((rgb >> 16) & 0xFF); out.write((rgb >> 8) & 0xFF); out.write(rgb & 0xFF)
      c += 1
    }
    // image descriptor at (0,0), full size, no local table
    out.write(0x2C)
    writeU16(out, 0); writeU16(out, 0); writeU16(out, img.width); writeU16(out, img.height)
    out.write(if (interlaced) 0x40 else 0x00)

    val rowOrder = if (interlaced) interlaceRows(img.height) else (0 until img.height).toArray
    val stream = new Array[Byte](nPix)
    var o = 0
    var r = 0
    while (r < rowOrder.length) {
      System.arraycopy(indices, rowOrder(r) * img.width, stream, o, img.width)
      o += img.width
      r += 1
    }
    val minCodeSize = math.max(2, tableBits)
    out.write(minCodeSize)
    writeSubBlocks(out, lzwCompress(stream, minCodeSize))
    out.write(0x00) // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** GIF variable-length-code LZW. Encoder widens the code size when the
    * next free slot passes 2^codeSize (one step after the decoder, which
    * widens AT 2^codeSize — the off-by-one exists because the decoder's
    * first data code inserts nothing); at 4096 entries a Clear code resets
    * both sides. Bits pack LSB-first.
    */
  private def lzwCompress(data: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val bits = new BitWriter
    var codeSize = minCodeSize + 1
    // dictionary: (prefix code, next byte) -> code, keyed as prefix<<8|byte
    var dict = mutable.HashMap.empty[Int, Int]
    var next = eoi + 1
    bits.write(clear, codeSize)
    if (data.isEmpty) { bits.write(eoi, codeSize); return bits.result() }
    var cur = data(0) & 0xFF
    var i = 1
    while (i < data.length) {
      val k = data(i) & 0xFF
      val key = (cur << 8) | k
      dict.get(key) match {
        case Some(code) => cur = code
        case None =>
          bits.write(cur, codeSize)
          if (next < MaxDictSize) {
            dict(key) = next
            next += 1
            if (next > (1 << codeSize) && codeSize < MaxCodeBits) codeSize += 1
          } else {
            bits.write(clear, codeSize)
            dict = mutable.HashMap.empty[Int, Int]
            next = eoi + 1
            codeSize = minCodeSize + 1
          }
          cur = k
      }
      i += 1
    }
    bits.write(cur, codeSize)
    bits.write(eoi, codeSize)
    bits.result()
  }

  // ---- decode --------------------------------------------------------------

  /** Decode the first image of a GIF87a/89a file to 8-bit RGB. Returns
    * None on anything malformed: bad signature, truncated tables or
    * sub-blocks, LZW codes out of range, or a pixel stream that does not
    * cover the frame.
    */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 13) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    var pos = 6
    pos += 4 // logical screen w/h (frame uses its own descriptor dims)
    val packed = bytes(pos) & 0xFF; pos += 3 // packed, bg index, aspect
    var palette: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (pos + 3 * n > bytes.length) return None
      palette = readPalette(bytes, pos, n)
      pos += 3 * n
    }
    while (pos < bytes.length) {
      (bytes(pos) & 0xFF) match {
        case 0x3B => return None // trailer before any image
        case 0x21 => // extension: label byte + sub-blocks
          pos += 2
          var len = if (pos < bytes.length) bytes(pos) & 0xFF else return None
          while (len != 0) {
            pos += 1 + len
            if (pos >= bytes.length) return None
            len = bytes(pos) & 0xFF
          }
          pos += 1
        case 0x2C =>
          if (pos + 10 > bytes.length) return None
          val w = u16(bytes, pos + 5); val h = u16(bytes, pos + 7)
          val ipacked = bytes(pos + 9) & 0xFF
          pos += 10
          var framePal = palette
          if ((ipacked & 0x80) != 0) { // local color table overrides
            val n = 2 << (ipacked & 7)
            if (pos + 3 * n > bytes.length) return None
            framePal = readPalette(bytes, pos, n)
            pos += 3 * n
          }
          if (framePal == null || w <= 0 || h <= 0) return None
          if (pos >= bytes.length) return None
          val minCodeSize = bytes(pos) & 0xFF; pos += 1
          if (minCodeSize < 2 || minCodeSize > 11) return None
          // concatenate data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var len = if (pos < bytes.length) bytes(pos) & 0xFF else return None
          while (len != 0) {
            if (pos + 1 + len > bytes.length) return None
            data.write(bytes, pos + 1, len)
            pos += 1 + len
            if (pos >= bytes.length) return None
            len = bytes(pos) & 0xFF
          }
          val indices = lzwDecompress(data.toByteArray, minCodeSize, w * h).getOrElse(return None)
          val rowOrder = if ((ipacked & 0x40) != 0) interlaceRows(h) else (0 until h).toArray
          val rgb = new Array[Byte](w * h * 3)
          var r = 0
          while (r < h) {
            val destRow = rowOrder(r)
            var x = 0
            while (x < w) {
              val ix = indices(r * w + x) & 0xFF
              if (ix >= framePal.length) return None
              val c = framePal(ix)
              val o = (destRow * w + x) * 3
              rgb(o) = ((c >> 16) & 0xFF).toByte
              rgb(o + 1) = ((c >> 8) & 0xFF).toByte
              rgb(o + 2) = (c & 0xFF).toByte
              x += 1
            }
            r += 1
          }
          return Some(Image(w, h, rgb))
        case _ => return None
      }
    }
    None
  }

  /** LZW decode to exactly `expected` indices. Dictionary entries are
    * (prefix code, tail byte) pairs materialized by back-walking — no
    * per-entry byte-array copies, so a 4096-entry dictionary costs two
    * flat int/byte arrays.
    */
  private def lzwDecompress(data: Array[Byte], minCodeSize: Int, expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](MaxDictSize)
    val tail = new Array[Byte](MaxDictSize)
    val out = new Array[Byte](expected)
    var outPos = 0
    var codeSize = minCodeSize + 1
    var next = eoi + 1
    var prev = -1
    val bits = new BitReader(data)
    val entryBuf = new Array[Byte](MaxDictSize)

    // expand `code` into out (via entryBuf reversal); returns first byte
    def emit(code: Int): Int = {
      var n = 0
      var c = code
      while (c >= clear + 2) { entryBuf(n) = tail(c); n += 1; c = prefix(c) }
      val first = c // a root code < clear
      if (outPos + n + 1 > expected) return -1
      out(outPos) = first.toByte; outPos += 1
      var i = n - 1
      while (i >= 0) { out(outPos) = entryBuf(i); outPos += 1; i -= 1 }
      first
    }

    var done = false
    while (!done) {
      val code = bits.read(codeSize)
      if (code < 0) return None // truncated stream
      if (code == clear) {
        next = eoi + 1; codeSize = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev == -1) {
        if (code >= clear) return None
        if (emit(code) < 0) return None
        prev = code
      } else {
        if (code > next || (code == next && next >= MaxDictSize)) return None
        val first =
          if (code < next) emit(code)
          else { // code == next: prev's expansion + its own first byte
            val f = emit(prev)
            if (f < 0 || outPos >= expected) return None
            out(outPos) = f.toByte; outPos += 1
            f
          }
        if (first < 0) return None
        if (next < MaxDictSize) {
          prefix(next) = prev; tail(next) = first.toByte
          next += 1
          if (next == (1 << codeSize) && codeSize < MaxCodeBits) codeSize += 1
        }
        prev = code
      }
      // pixels complete -> stop without insisting on reading the EOI:
      // the decoder's final insert can land exactly on a power of two and
      // widen the code size when the encoder (which made no insert after
      // its final emit) did not, so the EOI's bit width is ambiguous by
      // spec; real decoders stop at a full frame (giflib DGifGetLine).
      if (outPos == expected) done = true
    }
    if (outPos != expected) None else Some(out)
  }

  // ---- shared helpers --------------------------------------------------------

  /** Interlace pass order (GIF89a Appendix E): the r-th transmitted row
    * lands on returned row index. Passes: 0,8,16.. / 4,12.. / 2,6.. / 1,3..
    */
  def interlaceRows(h: Int): Array[Int] = {
    val rows = new Array[Int](h)
    var i = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < h) { rows(i) = y; i += 1; y += step }
    }
    rows
  }

  private def readPalette(b: Array[Byte], pos: Int, n: Int): Array[Int] = {
    val pal = new Array[Int](n)
    var i = 0
    while (i < n) {
      pal(i) = ((b(pos + i * 3) & 0xFF) << 16) | ((b(pos + i * 3 + 1) & 0xFF) << 8) | (b(pos + i * 3 + 2) & 0xFF)
      i += 1
    }
    pal
  }

  @inline private def u16(b: Array[Byte], i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def writeU16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
  }

  private def writeSubBlocks(out: java.io.ByteArrayOutputStream, data: Array[Byte]): Unit = {
    var i = 0
    while (i < data.length) {
      val n = math.min(255, data.length - i)
      out.write(n)
      out.write(data, i, n)
      i += n
    }
  }

  /** LSB-first bit packer (GIF LZW bit order). */
  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nBits = 0
    def write(code: Int, size: Int): Unit = {
      acc |= code << nBits
      nBits += size
      while (nBits >= 8) { buf.write(acc & 0xFF); acc >>>= 8; nBits -= 8 }
    }
    def result(): Array[Byte] = {
      if (nBits > 0) { buf.write(acc & 0xFF); acc = 0; nBits = 0 }
      buf.toByteArray
    }
  }

  /** LSB-first bit reader; returns -1 past end-of-stream. */
  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var acc = 0L
    private var nBits = 0
    def read(size: Int): Int = {
      while (nBits < size) {
        if (pos >= data.length) return -1
        acc |= (data(pos) & 0xFFL) << nBits
        pos += 1
        nBits += 8
      }
      val v = (acc & ((1L << size) - 1)).toInt
      acc >>>= size
      nBits -= size
      v
    }
  }
}
