package graft.functions

/** Pure-JDK baseline JPEG codec — the last image leg of the multimodal
  * tier, completing what [[PngCodec]] started: payload bytes in, pixel
  * values out, zero external libraries.
  *
  * Decode supports exactly the baseline subset (ITU-T T.81): SOF0/SOF1
  * Huffman sequential, 8-bit precision, 1 (grayscale) or 3 (YCbCr)
  * components with sampling factors 1 or 2 (4:4:4 / 4:2:2 / 4:4:0 /
  * 4:2:0), 8-bit quantization tables, restart intervals (DRI/RSTn), byte
  * stuffing, and multi-segment DQT/DHT — plus PROGRESSIVE (SOF2, Annex G
  * Huffman: spectral selection + successive approximation, any scan
  * script, cross-validated against ImageIO's progressive encoder).
  * Everything else — arithmetic coding, 12-bit, hierarchical — returns
  * None loudly
  * (the PDF-parser discipline: reject what you don't implement, never
  * half-decode it). Chroma upsampling is box/nearest; the YCbCr→RGB
  * transform uses the libjpeg 16-bit fixed-point constants so every output
  * pixel is integer-exact and mirrorable in oracle SQL.
  *
  * Encode writes conformant baseline streams third-party decoders read
  * (asserted against the JDK's own ImageIO reader in JpegCodecSpec):
  * full FDCT + quantization + the spec's Annex-K Huffman tables, grayscale
  * or YCbCr 4:4:4, optional restart intervals. The luma quantizer pins
  * Q(0,0)=8, which makes block-constant images round-trip EXACTLY
  * (FDCT of a constant block is DC-only with S00 = 8*(v-128), so the
  * quantized DC is v-128 with zero error and the IDCT reconstructs v at
  * every pixel) — the closed-form pixel oracle trick behind m_jpeg_pixels.
  *
  * Reference analog: image payloads are first-class pipeline inputs
  * (combined_pipeline.py:178-206 routes image MIME types).
  */
object JpegCodec {

  import PngCodec.Image

  // ---- public decode -------------------------------------------------------

  /** Full pixel decode of a baseline JPEG into 8-bit RGB (grayscale
    * replicates Y). None for anything outside the supported subset or any
    * malformed stream — never fabricated pixels.
    */
  def decode(b: Array[Byte]): Option[Image] = {
    // NPE backstop: a table-before-declaration ordering bug anywhere in
    // the scan machinery must mean "unsupported stream", never a crashed
    // Spark task
    try decodeImpl(b)
    catch {
      case _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException |
          _: NullPointerException => None
    }
  }

  // per-component state parsed from SOF/SOS
  private final case class Comp(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: Int = 0
    var acTable: Int = 0
  }

  private def decodeImpl(b: Array[Byte]): Option[Image] = {
    if (b.length < 4 || u8(b, 0) != 0xFF || u8(b, 1) != 0xD8) return None
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var pos = 2
    while (pos + 3 < b.length) {
      if (u8(b, pos) != 0xFF) return None
      var marker = u8(b, pos + 1)
      while (marker == 0xFF && pos + 2 < b.length) { pos += 1; marker = u8(b, pos + 1) }
      pos += 2
      marker match {
        case 0xD9 => return None // EOI before any scan decoded
        case m if m >= 0xD0 && m <= 0xD7 => // stray RST outside a scan
          return None
        case 0xC4 => // DHT (possibly several tables in one segment)
          val len = be16(b, pos); var p = pos + 2
          val end = pos + len
          if (end > b.length) return None
          while (p < end) {
            val tc = u8(b, p) >> 4; val th = u8(b, p) & 0x0F
            if (tc > 1 || th > 3) return None
            val bits = Array.tabulate(16)(i => u8(b, p + 1 + i))
            val total = bits.sum
            if (p + 17 + total > end) return None
            val vals = Array.tabulate(total)(i => u8(b, p + 17 + i))
            val t = Huff.build(bits, vals).getOrElse(return None)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            p += 17 + total
          }
          pos = end
        case 0xDB => // DQT
          val len = be16(b, pos); var p = pos + 2
          val end = pos + len
          if (end > b.length) return None
          while (p < end) {
            val pq = u8(b, p) >> 4; val tq = u8(b, p) & 0x0F
            if (pq != 0 || tq > 3) return None // 16-bit tables: not baseline
            if (p + 65 > end) return None
            quant(tq) = Array.tabulate(64)(i => u8(b, p + 1 + i))
            p += 65
          }
          pos = end
        case 0xC0 | 0xC1 => // SOF0 baseline / SOF1 extended sequential (same decode)
          val len = be16(b, pos)
          if (pos + len > b.length || len < 8) return None
          if (u8(b, pos + 2) != 8) return None // 12-bit: not baseline
          h = be16(b, pos + 3); w = be16(b, pos + 5)
          val nc = u8(b, pos + 7)
          if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
          if (len != 8 + 3 * nc) return None
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val c = Comp(u8(b, o), u8(b, o + 1) >> 4, u8(b, o + 1) & 0x0F, u8(b, o + 2))
            if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 || c.tq > 3) return None
            c
          }
          pos += len
        case 0xC2 => // SOF2 progressive: its own multi-scan walk
          return decodeProgressiveImpl(b)
        case m if (m >= 0xC3 && m <= 0xCF) && m != 0xC4 && m != 0xC8 && m != 0xCC =>
          return None // arithmetic / lossless / hierarchical
        case 0xDD => // DRI
          if (be16(b, pos) != 4) return None
          restartInterval = be16(b, pos + 2)
          pos += 4
        case 0xDA => // SOS — decode the single baseline scan
          if (comps == null) return None
          val len = be16(b, pos)
          val ns = u8(b, pos + 2)
          if (ns != comps.length) return None // multi-scan: out of subset
          if (len != 6 + 2 * ns) return None
          var i = 0
          while (i < ns) {
            val cid = u8(b, pos + 3 + 2 * i)
            val c = comps.find(_.id == cid).getOrElse(return None)
            c.dcTable = u8(b, pos + 4 + 2 * i) >> 4
            c.acTable = u8(b, pos + 4 + 2 * i) & 0x0F
            if (c.dcTable > 3 || c.acTable > 3) return None
            i += 1
          }
          return decodeScan(b, pos + len, comps, w, h, quant, dcTabs, acTabs, restartInterval)
        case _ => // APPn / COM / anything length-prefixed: skip
          val len = be16(b, pos)
          if (len < 2) return None
          pos += len
      }
    }
    None
  }

  private def decodeScan(
      b: Array[Byte],
      start: Int,
      comps: Array[Comp],
      w: Int,
      h: Int,
      quant: Array[Array[Int]],
      dcTabs: Array[Huff],
      acTabs: Array[Huff],
      restartInterval: Int
  ): Option[Image] = {
    if (3L * w * h > 64L * 1024 * 1024) return None // forged-dims bound
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    comps.foreach { c =>
      if (quant(c.tq) == null || dcTabs(c.dcTable) == null || acTabs(c.acTable) == null)
        return None
    }
    val interleaved = comps.length > 1
    // per-component block geometry (T.81 A.1.1): interleaved scans pad to
    // whole MCUs; a single-component scan walks its own block raster
    val mcusX = ceilDiv(w, 8 * hmax)
    val mcusY = ceilDiv(h, 8 * vmax)
    val planes = comps.map { c =>
      val bw = if (interleaved) mcusX * c.h else ceilDiv(w * c.h, 8 * hmax)
      val bh = if (interleaved) mcusY * c.v else ceilDiv(h * c.v, 8 * vmax)
      new Plane(bw, bh)
    }
    val in = new BitReader(b, start)
    val pred = new Array[Int](comps.length)
    val blk = new Array[Int](64)
    val totalMcus = if (interleaved) mcusX * mcusY else planes(0).bw * planes(0).bh
    var mcu = 0
    var rstCount = 0
    var sinceRestart = 0
    while (mcu < totalMcus) {
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        if (!in.readRestart(rstCount % 8)) return None
        rstCount += 1; sinceRestart = 0
        java.util.Arrays.fill(pred, 0)
      }
      if (interleaved) {
        val mx = mcu % mcusX; val my = mcu / mcusX
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              if (!decodeBlock(in, dcTabs(c.dcTable), acTabs(c.acTable), quant(c.tq), pred, ci, blk))
                return None
              planes(ci).put(mx * c.h + bx, my * c.v + by, blk)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
      } else {
        if (!decodeBlock(in, dcTabs(comps(0).dcTable), acTabs(comps(0).acTable),
            quant(comps(0).tq), pred, 0, blk)) return None
        planes(0).put(mcu % planes(0).bw, mcu / planes(0).bw, blk)
      }
      mcu += 1
      sinceRestart += 1
    }
    // assemble RGB with box upsampling; fixed-point color transform so the
    // output is integer-exact (mirrorable in oracle SQL)
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        if (comps.length == 1) {
          val g = planes(0).sample(x, y, 1, 1, 1, 1)
          rgb(o) = g.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = g.toByte
        } else {
          val yy = planes(0).sample(x, y, comps(0).h, comps(0).v, hmax, vmax)
          val cb = planes(1).sample(x, y, comps(1).h, comps(1).v, hmax, vmax)
          val cr = planes(2).sample(x, y, comps(2).h, comps(2).v, hmax, vmax)
          rgb(o) = clamp(yy + ((91881 * (cr - 128) + 32768) >> 16)).toByte
          rgb(o + 1) = clamp(yy - ((22554 * (cb - 128) + 46802 * (cr - 128) + 32768) >> 16)).toByte
          rgb(o + 2) = clamp(yy + ((116130 * (cb - 128) + 32768) >> 16)).toByte
        }
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, rgb))
  }

  /** One 8x8 data unit: DC diff + AC run-lengths → dequant → de-zigzag →
    * IDCT → level shift, into `blk` as clamped 0..255 samples.
    */
  private def decodeBlock(
      in: BitReader,
      dc: Huff,
      ac: Huff,
      q: Array[Int],
      pred: Array[Int],
      ci: Int,
      blk: Array[Int]
  ): Boolean = {
    val coef = new Array[Int](64)
    val s = in.decodeHuff(dc)
    if (s < 0 || s > 11) return false
    val diff = if (s == 0) 0 else in.receiveExtend(s)
    if (in.failed) return false
    pred(ci) += diff
    coef(0) = pred(ci) * q(0)
    var k = 1
    while (k < 64) {
      val rs = in.decodeHuff(ac)
      if (rs < 0) return false
      val r = rs >> 4; val size = rs & 0x0F
      if (size == 0) {
        if (r == 15) { k += 16 } // ZRL
        else k = 64 // EOB
      } else {
        k += r
        if (k > 63) return false
        coef(zigzag(k)) = in.receiveExtend(size) * q(k)
        if (in.failed) return false
        k += 1
      }
    }
    idct(coef, blk)
    true
  }

  // ---- progressive (SOF2) ----------------------------------------------------

  /** Progressive JPEG (ITU-T T.81 Annex G, Huffman): spectral selection +
    * successive approximation over any number of scans. Coefficients
    * accumulate per component in zigzag order across scans (DC first/
    * refine, AC first/refine with EOB-run semantics and the correction-bit
    * refinement walk); dequantization + IDCT + the fixed-point color
    * transform run once at EOI, so the pixel path downstream of the
    * entropy decoder is shared bit-for-bit with the baseline decoder.
    * Same subset bounds as baseline: 8-bit, 1 or 3 components, sampling
    * factors ≤ 2, 64 MB pixel cap. Cross-validated against ImageIO's
    * progressive encoder in JpegCodecSpec.
    */
  private def decodeProgressiveImpl(b: Array[Byte]): Option[Image] = {
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var hmax = 0; var vmax = 0; var mcusX = 0; var mcusY = 0
    var coefs: Array[Array[Int]] = null // per comp: zigzag-order, block-major
    var bwFull: Array[Int] = null
    var bhFull: Array[Int] = null
    var sawScan = false
    var pos = 2
    // the loop must reach a trailing EOI (2 bytes): condition is the
    // marker pair itself; segment reads bounds-check themselves
    while (pos + 1 < b.length) {
      if (u8(b, pos) != 0xFF) return None
      var marker = u8(b, pos + 1)
      while (marker == 0xFF && pos + 2 < b.length) { pos += 1; marker = u8(b, pos + 1) }
      pos += 2
      marker match {
        case 0xD9 => // EOI: all scans in — reconstruct
          if (!sawScan || comps == null) return None
          return reconstructProgressive(comps, w, h, quant, coefs, bwFull, bhFull, hmax, vmax)
        case 0xC4 =>
          val len = be16(b, pos); var p = pos + 2
          val end = pos + len
          if (end > b.length) return None
          while (p < end) {
            val tc = u8(b, p) >> 4; val th = u8(b, p) & 0x0F
            if (tc > 1 || th > 3) return None
            val bits = Array.tabulate(16)(i => u8(b, p + 1 + i))
            val total = bits.sum
            if (p + 17 + total > end) return None
            val vals = Array.tabulate(total)(i => u8(b, p + 17 + i))
            val t = Huff.build(bits, vals).getOrElse(return None)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            p += 17 + total
          }
          pos = end
        case 0xDB =>
          val len = be16(b, pos); var p = pos + 2
          val end = pos + len
          if (end > b.length) return None
          while (p < end) {
            val pq = u8(b, p) >> 4; val tq = u8(b, p) & 0x0F
            if (pq != 0 || tq > 3) return None
            if (p + 65 > end) return None
            quant(tq) = Array.tabulate(64)(i => u8(b, p + 1 + i))
            p += 65
          }
          pos = end
        case 0xC2 =>
          // a second SOF2 is as malformed as any other repeated frame
          // marker — reject it instead of silently reallocating the
          // component state and discarding accumulated coefficients
          if (comps != null) return None
          val len = be16(b, pos)
          if (pos + len > b.length || len < 8) return None
          if (u8(b, pos + 2) != 8) return None
          h = be16(b, pos + 3); w = be16(b, pos + 5)
          val nc = u8(b, pos + 7)
          if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
          if (len != 8 + 3 * nc) return None
          if (3L * w * h > 64L * 1024 * 1024) return None
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val c = Comp(u8(b, o), u8(b, o + 1) >> 4, u8(b, o + 1) & 0x0F, u8(b, o + 2))
            if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 || c.tq > 3) return None
            c
          }
          hmax = comps.map(_.h).max; vmax = comps.map(_.v).max
          mcusX = ceilDiv(w, 8 * hmax); mcusY = ceilDiv(h, 8 * vmax)
          bwFull = comps.map(c => mcusX * c.h)
          bhFull = comps.map(c => mcusY * c.v)
          coefs = comps.indices.map(i => new Array[Int](bwFull(i) * bhFull(i) * 64)).toArray
          pos += len
        case m if (m >= 0xC0 && m <= 0xCF) && m != 0xC4 && m != 0xC8 && m != 0xCC =>
          return None // a second frame marker mid-stream
        case 0xDD =>
          if (be16(b, pos) != 4) return None
          restartInterval = be16(b, pos + 2)
          pos += 4
        case 0xDA =>
          if (comps == null) return None
          val len = be16(b, pos)
          val ns = u8(b, pos + 2)
          if (ns < 1 || ns > comps.length || len != 6 + 2 * ns) return None
          val scanIdx = new Array[Int](ns)
          var i = 0
          while (i < ns) {
            val cid = u8(b, pos + 3 + 2 * i)
            val ci = comps.indexWhere(_.id == cid)
            if (ci < 0) return None
            comps(ci).dcTable = u8(b, pos + 4 + 2 * i) >> 4
            comps(ci).acTable = u8(b, pos + 4 + 2 * i) & 0x0F
            if (comps(ci).dcTable > 3 || comps(ci).acTable > 3) return None
            scanIdx(i) = ci
            i += 1
          }
          val ss = u8(b, pos + 3 + 2 * ns)
          val se = u8(b, pos + 4 + 2 * ns)
          val ahAl = u8(b, pos + 5 + 2 * ns)
          val ah = ahAl >> 4; val al = ahAl & 0x0F
          val nextPos = decodeProgressiveScan(
            b, pos + len, comps, scanIdx, ss, se, ah, al,
            coefs, bwFull, bhFull, hmax, vmax, w, h,
            mcusX, mcusY, dcTabs, acTabs, restartInterval)
          if (nextPos < 0) return None
          sawScan = true
          pos = nextPos
        case _ =>
          val len = be16(b, pos)
          if (len < 2) return None
          pos += len
      }
    }
    None
  }

  /** One progressive scan into the coefficient planes. Returns the byte
    * offset of the next marker's 0xFF, or -1 on any malformation.
    */
  private def decodeProgressiveScan(
      b: Array[Byte],
      start: Int,
      comps: Array[Comp],
      scanIdx: Array[Int],
      ss: Int, se: Int, ah: Int, al: Int,
      coefs: Array[Array[Int]],
      bwFull: Array[Int], bhFull: Array[Int],
      hmax: Int, vmax: Int, w: Int, h: Int,
      mcusX: Int, mcusY: Int,
      dcTabs: Array[Huff], acTabs: Array[Huff],
      restartInterval: Int
  ): Int = {
    val isDc = ss == 0
    if (isDc && se != 0) return -1
    if (!isDc && (scanIdx.length != 1 || se < ss || se > 63)) return -1 // AC scans: one component
    if (al > 13 || ah > 14 || (ah != 0 && ah != al + 1)) return -1
    val interleaved = isDc && scanIdx.length > 1
    // a DC-first scan whose SOS precedes its DHT has no Huffman table
    // yet — reject loudly (both interleaved and non-interleaved paths)
    // instead of NPEing inside dcFirst (the documented None contract)
    if (isDc && ah == 0) {
      var si = 0
      while (si < scanIdx.length) {
        if (dcTabs(comps(scanIdx(si)).dcTable) == null) return -1
        si += 1
      }
    }
    val in = new BitReader(b, start)
    val pred = new Array[Int](comps.length)
    var eobrun = 0
    val p1 = 1 << al
    val m1 = -1 << al

    // per-block decoders over the zigzag coefficient slice [base, base+64)
    def dcFirst(z: Array[Int], base: Int, ci: Int): Boolean = {
      val s = in.decodeHuff(dcTabs(comps(ci).dcTable))
      if (s < 0 || s > 11) return false
      val diff = if (s == 0) 0 else in.receiveExtend(s)
      if (in.failed) return false
      pred(ci) += diff
      z(base) = pred(ci) << al
      true
    }
    def dcRefine(z: Array[Int], base: Int): Boolean = {
      val bit = in.bit()
      if (bit < 0) return false
      if (bit == 1) z(base) |= p1
      true
    }
    def acFirst(z: Array[Int], base: Int, ac: Huff): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      while (k <= se) {
        val rs = in.decodeHuff(ac)
        if (rs < 0) return false
        val r = rs >> 4; val s = rs & 0x0F
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else {
            eobrun = (1 << r) - 1
            if (r > 0) {
              eobrun += in.receive(r)
              if (in.failed) return false
            }
            return true
          }
        } else {
          k += r
          if (k > se) return false
          z(base + k) = in.receiveExtend(s) << al
          if (in.failed) return false
          k += 1
        }
      }
      true
    }
    // T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine: newly-significant ±1
    // placements interleaved with correction bits for already-nonzero
    // coefficients passed along the way; EOB-run state still corrects
    def refineNonzero(z: Array[Int], idx: Int): Boolean = {
      val bit = in.bit()
      if (bit < 0) return false
      if (bit == 1 && (z(idx) & p1) == 0)
        z(idx) += (if (z(idx) >= 0) p1 else m1)
      true
    }
    def acRefine(z: Array[Int], base: Int, ac: Huff): Boolean = {
      var k = ss
      if (eobrun > 0) {
        // block fully inside a previous block's EOB run: correction bits
        // only, and it consumes one unit of the run
        while (k <= se) {
          if (z(base + k) != 0) {
            if (!refineNonzero(z, base + k)) return false
          }
          k += 1
        }
        eobrun -= 1
        return true
      }
      var done = false
      while (!done && k <= se) {
        val rs = in.decodeHuff(ac)
        if (rs < 0) return false
        var r = rs >> 4
        val s = rs & 0x0F
        var newVal = 0
        if (s == 0) {
          if (r < 15) {
            // EOB starting HERE: the run counts (1<<r)-1+bits FURTHER
            // blocks; this block's tail sweep below is not one of them
            eobrun = (1 << r) - 1
            if (r > 0) {
              eobrun += in.receive(r)
              if (in.failed) return false
            }
            done = true
          }
          // r == 15: skip 16 zero-history positions
        } else {
          if (s != 1) return false
          val sign = in.bit()
          if (sign < 0) return false
          newVal = if (sign == 1) p1 else m1
        }
        if (!done) {
          var placed = false
          while (!placed && k <= se) {
            if (z(base + k) != 0) {
              if (!refineNonzero(z, base + k)) return false
            } else {
              if (r == 0) {
                if (newVal != 0) z(base + k) = newVal
                placed = true
              } else r -= 1
            }
            k += 1
          }
          if (!placed && newVal != 0) return false // ran off the band
        }
      }
      if (done) {
        // tail of the current block under the just-started EOB run
        while (k <= se) {
          if (z(base + k) != 0) {
            if (!refineNonzero(z, base + k)) return false
          }
          k += 1
        }
      }
      true
    }

    def blockAt(ci: Int, bx: Int, by: Int): Int = (by * bwFull(ci) + bx) * 64

    var rstCount = 0
    var sinceRestart = 0
    def maybeRestart(): Boolean = {
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        if (!in.readRestart(rstCount % 8)) return false
        rstCount += 1; sinceRestart = 0
        java.util.Arrays.fill(pred, 0)
        eobrun = 0
      }
      true
    }

    if (interleaved) {
      var mcu = 0
      val total = mcusX * mcusY
      while (mcu < total) {
        if (!maybeRestart()) return -1
        val mx = mcu % mcusX; val my = mcu / mcusX
        var si = 0
        while (si < scanIdx.length) {
          val ci = scanIdx(si)
          val c = comps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              val base = blockAt(ci, mx * c.h + bx, my * c.v + by)
              val ok = if (ah == 0) dcFirst(coefs(ci), base, ci) else dcRefine(coefs(ci), base)
              if (!ok) return -1
              bx += 1
            }
            by += 1
          }
          si += 1
        }
        mcu += 1
        sinceRestart += 1
      }
    } else {
      val ci = scanIdx(0)
      val c = comps(ci)
      val nbw = ceilDiv(w * c.h, 8 * hmax)
      val nbh = ceilDiv(h * c.v, 8 * vmax)
      val ac = acTabs(c.acTable)
      if (!isDc && ac == null) return -1
      var blk = 0
      val total = nbw * nbh
      while (blk < total) {
        if (!maybeRestart()) return -1
        val base = blockAt(ci, blk % nbw, blk / nbw)
        val ok =
          if (isDc) { if (ah == 0) dcFirst(coefs(ci), base, ci) else dcRefine(coefs(ci), base) }
          else { if (ah == 0) acFirst(coefs(ci), base, ac) else acRefine(coefs(ci), base, ac) }
        if (!ok) return -1
        blk += 1
        sinceRestart += 1
      }
    }
    // next marker: first 0xFF followed by a non-stuffing byte at/after the
    // reader's position (skipping any stray RSTs left by sloppy encoders)
    var p = in.bytePos
    while (p + 1 < b.length) {
      if (u8(b, p) == 0xFF && u8(b, p + 1) != 0x00) {
        val m = u8(b, p + 1)
        if (m >= 0xD0 && m <= 0xD7) p += 2 // stray restart between scans
        else return p
      } else p += 1
    }
    -1
  }

  /** Dequantize + IDCT every accumulated block and assemble RGB — the
    * same plane sampling and fixed-point color transform as the baseline
    * path.
    */
  private def reconstructProgressive(
      comps: Array[Comp],
      w: Int, h: Int,
      quant: Array[Array[Int]],
      coefs: Array[Array[Int]],
      bwFull: Array[Int], bhFull: Array[Int],
      hmax: Int, vmax: Int
  ): Option[Image] = {
    comps.foreach(c => if (quant(c.tq) == null) return None)
    val planes = comps.indices.map(i => new Plane(bwFull(i), bhFull(i))).toArray
    val nat = new Array[Int](64)
    val blk = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val q = quant(comps(ci).tq)
      val z = coefs(ci)
      var bi = 0
      val nBlocks = bwFull(ci) * bhFull(ci)
      while (bi < nBlocks) {
        val base = bi * 64
        var k = 0
        while (k < 64) { nat(zigzag(k)) = z(base + k) * q(k); k += 1 }
        idct(nat, blk)
        planes(ci).put(bi % bwFull(ci), bi / bwFull(ci), blk)
        bi += 1
      }
      ci += 1
    }
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        if (comps.length == 1) {
          val g = planes(0).sample(x, y, 1, 1, 1, 1)
          rgb(o) = g.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = g.toByte
        } else {
          val yy = planes(0).sample(x, y, comps(0).h, comps(0).v, hmax, vmax)
          val cb = planes(1).sample(x, y, comps(1).h, comps(1).v, hmax, vmax)
          val cr = planes(2).sample(x, y, comps(2).h, comps(2).v, hmax, vmax)
          rgb(o) = clamp(yy + ((91881 * (cr - 128) + 32768) >> 16)).toByte
          rgb(o + 1) = clamp(yy - ((22554 * (cb - 128) + 46802 * (cr - 128) + 32768) >> 16)).toByte
          rgb(o + 2) = clamp(yy + ((116130 * (cb - 128) + 32768) >> 16)).toByte
        }
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, rgb))
  }

  // ---- encode --------------------------------------------------------------

  /** Baseline grayscale encode (single-component non-interleaved scan,
    * standard Annex-K luma Huffman tables, Q(0,0)=8 quantizer). Any dims.
    */
  def encodeGray(width: Int, height: Int, pix: Array[Byte], restartInterval: Int = 0): Array[Byte] = {
    require(pix.length == width * height, s"pixel buffer ${pix.length} != $width x $height")
    encodeComps(width, height, Array(pix), restartInterval)
  }

  /** Baseline YCbCr 4:4:4 encode from per-component planes (each
    * width*height). All three components share the luma tables — legal and
    * decodable by any conformant reader.
    */
  def encodeYcc444(
      width: Int,
      height: Int,
      yPlane: Array[Byte],
      cbPlane: Array[Byte],
      crPlane: Array[Byte],
      restartInterval: Int = 0
  ): Array[Byte] = {
    Seq(yPlane, cbPlane, crPlane).foreach(p =>
      require(p.length == width * height, s"plane ${p.length} != $width x $height"))
    encodeComps(width, height, Array(yPlane, cbPlane, crPlane), restartInterval)
  }

  /** Luma quantizer: DC step 8 (exact block-constant round trips), flat 16
    * elsewhere — a valid, unremarkable quality level.
    */
  private val quantTable: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 16)

  private def encodeComps(
      width: Int,
      height: Int,
      planes: Array[Array[Byte]],
      restartInterval: Int
  ): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xFFFF && height <= 0xFFFF, "dims out of range")
    require(restartInterval >= 0 && restartInterval <= 0xFFFF, "bad restart interval")
    val nc = planes.length
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xFF)
    def b16(v: Int): Unit = { b(v >> 8); b(v) }
    b(0xFF); b(0xD8) // SOI
    // APP0 JFIF
    b(0xFF); b(0xE0); b16(16)
    out.write("JFIF".getBytes("US-ASCII")); b(0)
    b(1); b(1); b(0); b16(1); b16(1); b(0); b(0)
    // DQT (table 0)
    b(0xFF); b(0xDB); b16(2 + 65); b(0x00)
    var i = 0
    while (i < 64) { b(quantTable(i)); i += 1 }
    // SOF0
    b(0xFF); b(0xC0); b16(8 + 3 * nc); b(8); b16(height); b16(width); b(nc)
    i = 0
    while (i < nc) { b(i + 1); b(0x11); b(0); i += 1 } // h=v=1, quant 0
    // DHT: DC table 0 + AC table 0 (Annex K luma)
    def dht(tc: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      b(0xFF); b(0xC4); b16(2 + 17 + vals.length); b((tc << 4) | 0)
      bits.foreach(b); vals.foreach(b)
    }
    dht(0, DcLumaBits, DcLumaVals)
    dht(1, AcLumaBits, AcLumaVals)
    if (restartInterval > 0) { b(0xFF); b(0xDD); b16(4); b16(restartInterval) }
    // SOS
    b(0xFF); b(0xDA); b16(6 + 2 * nc); b(nc)
    i = 0
    while (i < nc) { b(i + 1); b(0x00); i += 1 } // DC 0 / AC 0
    b(0); b(63); b(0)
    // entropy-coded data
    val bw = new BitWriter(out)
    val dcH = Huff.encoderTable(DcLumaBits, DcLumaVals)
    val acH = Huff.encoderTable(AcLumaBits, AcLumaVals)
    val bxMax = ceilDiv(width, 8); val byMax = ceilDiv(height, 8)
    val pred = new Array[Int](nc)
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    var mcu = 0
    var sinceRestart = 0
    var rstCount = 0
    val totalMcus = bxMax * byMax
    while (mcu < totalMcus) {
      if (restartInterval > 0 && sinceRestart == restartInterval && mcu > 0) {
        bw.flushRestart(rstCount % 8)
        rstCount += 1; sinceRestart = 0
        java.util.Arrays.fill(pred, 0)
      }
      val bx = mcu % bxMax; val by = mcu / bxMax
      var ci = 0
      while (ci < nc) {
        // gather the 8x8 block, edge pixels replicated
        var yy = 0
        while (yy < 8) {
          val sy = math.min(by * 8 + yy, height - 1)
          var xx = 0
          while (xx < 8) {
            val sx = math.min(bx * 8 + xx, width - 1)
            block(yy * 8 + xx) = (planes(ci)(sy * width + sx) & 0xFF) - 128.0
            xx += 1
          }
          yy += 1
        }
        fdctQuant(block, coef)
        // DC
        val diff = coef(0) - pred(ci)
        pred(ci) = coef(0)
        val s = magnitude(diff)
        bw.put(dcH(s))
        if (s > 0) bw.putBits(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        // AC in zigzag order
        var run = 0
        var k = 1
        while (k < 64) {
          val v = coef(k)
          if (v == 0) run += 1
          else {
            while (run > 15) { bw.put(acH(0xF0)); run -= 16 }
            val sz = magnitude(v)
            bw.put(acH((run << 4) | sz))
            bw.putBits(if (v < 0) v + (1 << sz) - 1 else v, sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) bw.put(acH(0x00)) // EOB
        ci += 1
      }
      mcu += 1
      sinceRestart += 1
    }
    bw.flushFinal()
    b(0xFF); b(0xD9) // EOI
    out.toByteArray
  }

  /** FDCT + quantization in zigzag order (coef(k) is the k-th zigzag
    * coefficient, matching the scan emission order).
    */
  private def fdctQuant(block: Array[Double], coef: Array[Int]): Unit = {
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var sum = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            sum += block(y * 8 + x) * cosT(x)(v) * cosT(y)(u)
            x += 1
          }
          y += 1
        }
        val cu = if (u == 0) InvSqrt2 else 1.0
        val cv = if (v == 0) InvSqrt2 else 1.0
        val s = 0.25 * cu * cv * sum
        val zz = zigzagInv(u * 8 + v)
        coef(zz) = Math.round(s / quantTable(zz)).toInt
        v += 1
      }
      u += 1
    }
  }

  /** Separable would be faster; at fixture scale the direct 2D sum keeps the
    * hot constants obvious. coef is in NATURAL order, q already applied.
    */
  private def idct(coef: Array[Int], outPix: Array[Int]): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val c = coef(u * 8 + v)
            if (c != 0) {
              val cu = if (u == 0) InvSqrt2 else 1.0
              val cv = if (v == 0) InvSqrt2 else 1.0
              sum += cu * cv * c * cosT(x)(v) * cosT(y)(u)
            }
            v += 1
          }
          u += 1
        }
        outPix(y * 8 + x) = clamp(Math.round(0.25 * sum).toInt + 128)
        x += 1
      }
      y += 1
    }
  }

  // ---- tables / helpers ----------------------------------------------------

  private val InvSqrt2 = 1.0 / math.sqrt(2.0)
  private val cosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))

  /** Zigzag scan order (T.81 Figure 5): zigzag(k) = natural index of the
    * k-th coefficient in scan order.
    */
  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
  private val zigzagInv: Array[Int] = {
    val inv = new Array[Int](64)
    var k = 0
    while (k < 64) { inv(zigzag(k)) = k; k += 1 }
    inv
  }

  /** Annex-K (Table K.3/K.5) luminance Huffman specs. */
  private val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val AcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val AcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)

  /** Bit size category of a coefficient (T.81 F.1.2.1.1). */
  private def magnitude(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  @inline private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  @inline private def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b
  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  @inline private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  /** Decoded component plane: blocks of clamped samples with box sampling
    * for the final assembly (pixel (x,y) of the full grid reads the
    * component sample at (x*hi/hmax, y*vi/vmax)).
    */
  private final class Plane(val bw: Int, val bh: Int) {
    private val data = new Array[Int](bw * 8 * bh * 8)
    private val stride = bw * 8
    def put(bx: Int, by: Int, blk: Array[Int]): Unit = {
      var y = 0
      while (y < 8) {
        System.arraycopy(blk, y * 8, data, (by * 8 + y) * stride + bx * 8, 8)
        y += 1
      }
    }
    def sample(x: Int, y: Int, ch: Int, cv: Int, hmax: Int, vmax: Int): Int = {
      val sx = math.min(x * ch / hmax, stride - 1)
      val sy = math.min(y * cv / vmax, bh * 8 - 1)
      data(sy * stride + sx)
    }
  }

  /** Canonical Huffman table (T.81 Annex C): codes assigned in value order,
    * decoded with the mincode/maxcode/valptr walk (F.2.2.3).
    */
  private final class Huff(
      val minCode: Array[Int],
      val maxCode: Array[Int],
      val valPtr: Array[Int],
      val vals: Array[Int])

  private object Huff {
    def build(bits: Array[Int], vals: Array[Int]): Option[Huff] = {
      val minCode = new Array[Int](17)
      val maxCode = Array.fill(17)(-1)
      val valPtr = new Array[Int](17)
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
      if (k != vals.length || k == 0) None
      else Some(new Huff(minCode, maxCode, valPtr, vals))
    }

    /** symbol → (code, length) packed as (code << 5) | length, for encoding. */
    def encoderTable(bits: Array[Int], vals: Array[Int]): Array[Int] = {
      val table = new Array[Int](256)
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          table(vals(k)) = (code << 5) | l
          code += 1; k += 1; i += 1
        }
        code <<= 1
        l += 1
      }
      table
    }
  }

  /** Entropy-segment bit reader: un-stuffs 0xFF00, fails (never pads) on an
    * unexpected marker, consumes RSTn on request.
    */
  private final class BitReader(b: Array[Byte], start: Int) {
    private var pos = start
    private var acc = 0
    private var nbits = 0
    var failed = false

    private def fill(): Boolean = {
      if (pos >= b.length) { failed = true; return false }
      var v = b(pos) & 0xFF
      pos += 1
      if (v == 0xFF) {
        if (pos >= b.length) { failed = true; return false }
        val m = b(pos) & 0xFF
        if (m == 0x00) pos += 1 // stuffed
        else { failed = true; pos -= 1; return false } // real marker mid-symbol
      }
      acc = (acc << 8) | v
      nbits += 8
      true
    }

    def bit(): Int = {
      if (nbits == 0 && !fill()) return -1
      nbits -= 1
      (acc >> nbits) & 1
    }

    def decodeHuff(t: Huff): Int = {
      var code = bit()
      if (code < 0) return -1
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.vals(t.valPtr(l) + code - t.minCode(l))
        val nb = bit()
        if (nb < 0) return -1
        code = (code << 1) | nb
        l += 1
      }
      -1
    }

    /** RECEIVE + EXTEND (T.81 F.2.2.1): read `s` magnitude bits. */
    def receiveExtend(s: Int): Int = {
      var v = 0
      var i = 0
      while (i < s) {
        val nb = bit()
        if (nb < 0) return 0 // failed is set
        v = (v << 1) | nb
        i += 1
      }
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }

    /** RECEIVE only (T.81 F.2.2.1 without EXTEND): `s` raw bits unsigned —
      * progressive EOB-run lengths are plain magnitudes, never extended.
      */
    def receive(s: Int): Int = {
      var v = 0
      var i = 0
      while (i < s) {
        val nb = bit()
        if (nb < 0) return 0 // failed is set
        v = (v << 1) | nb
        i += 1
      }
      v
    }

    /** Byte offset of the next unread byte — where the post-scan marker
      * search starts (padding bits of the current byte are already
      * consumed byte-wise).
      */
    def bytePos: Int = pos

    /** Byte-align and consume the expected RSTn marker. */
    def readRestart(n: Int): Boolean = {
      nbits = 0; acc = 0
      if (pos + 1 >= b.length) return false
      if ((b(pos) & 0xFF) != 0xFF || (b(pos + 1) & 0xFF) != (0xD0 + n)) return false
      pos += 2
      true
    }
  }

  /** Entropy-segment bit writer with 0xFF00 stuffing and 1-padding flush. */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0

    def put(packed: Int): Unit = putBits(packed >> 5, packed & 0x1F)

    def putBits(v: Int, n: Int): Unit = {
      acc = (acc << n) | (v & ((1 << n) - 1))
      nbits += n
      while (nbits >= 8) {
        val byteOut = (acc >> (nbits - 8)) & 0xFF
        out.write(byteOut)
        if (byteOut == 0xFF) out.write(0x00)
        nbits -= 8
      }
    }

    private def pad(): Unit = if (nbits > 0) putBits((1 << (8 - nbits)) - 1, 8 - nbits)

    def flushRestart(n: Int): Unit = {
      pad()
      out.write(0xFF); out.write(0xD0 + n)
    }

    def flushFinal(): Unit = pad()
  }
}
