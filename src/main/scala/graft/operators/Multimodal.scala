package graft.operators

import org.apache.spark.sql.Dataset

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, and decode / feature-extract runs
  * as a BATCHED per-partition stage (the Scala analog of mapInPandas batch
  * shape — a real model would amortize init per partition/batch).
  *
  * Dimension decoding is REAL, pure-Scala header parsing — PNG IHDR
  * (width/height big-endian at offsets 16/20 behind the 8-byte signature)
  * and JPEG SOF segment scan (marker walk to SOF0/1/2..., height/width
  * big-endian after the precision byte). No image library needed for
  * dimensions. Payloads that parse as neither → codec "unknown" with
  * 0x0 dimensions — an honest failure signal downstream can filter on,
  * never fabricated numbers (a corrupt PNG must not masquerade as a
  * plausible image).
  *
  * Feature vectors: REAL pixel statistics for BOTH image codecs — the full
  * pure-JDK pixel decodes ([[graft.functions.PngCodec]]: zlib inflate, all
  * five scanline filters, CRC checks; [[graft.functions.JpegCodec]]:
  * baseline Huffman + dequant + IDCT) feed 4x4 pooled block-luminance
  * features and an aHash64 perceptual fingerprint (which plugs into the
  * SimHash banding machinery for image near-dup at scale). The
  * m_media_pixels and m_jpeg_pixels queries oracle-check decoded luminance
  * sums against closed-form DuckDB arithmetic. Payloads with no pixel
  * decode path report EMPTY features — an honest absence downstream can
  * filter on, never a fabricated vector (a learned embedding model would
  * consume the same decoded pixels these statistics do).
  */
object Multimodal {

  /** Input row: opaque media payload + typed metadata. */
  final case class MediaRow(id: Long, media: Array[Byte], mime: String)

  /** Decoded output row; `codec` reports what the header parse found. */
  final case class MediaFeatures(
      id: Long,
      mime: String,
      codec: String, // png | jpeg | gif | unknown
      n_bytes: Long,
      width: Int,
      height: Int,
      features: Array[Float]
  )

  final val FeatureDim = 16
  final val BatchSize = 64

  // ---- real header decoders ------------------------------------------------

  private val PngSig: Array[Int] = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  @inline private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  @inline private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  /** PNG IHDR dimensions: signature + first chunk must be IHDR (per spec). */
  def decodePng(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 24) return None
    var i = 0
    while (i < 8) { if (u8(b, i) != PngSig(i)) return None; i += 1 }
    // chunk: len(4) type(4) data... — IHDR data: width(4) height(4) ...
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w > 0 && h > 0) Some((w, h)) else None
  }

  /** JPEG SOF dimensions: walk marker segments from SOI to the first SOFn
    * (C0-CF except C4 DHT / C8 JPG / CC DAC); payload is precision(1),
    * height(2 BE), width(2 BE).
    */
  def decodeJpeg(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || u8(b, 0) != 0xFF || u8(b, 1) != 0xD8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xFF) return None
      var marker = u8(b, i + 1)
      // fill bytes: consecutive 0xFF
      var j = i + 1
      while (marker == 0xFF && j + 1 < b.length) { j += 1; marker = u8(b, j) }
      i = j - 1
      if (marker == 0xD9 || marker == 0xDA) return None // EOI / SOS before SOF
      if (marker >= 0xD0 && marker <= 0xD7) { i += 2 } // standalone RSTn
      else {
        if (i + 3 >= b.length) return None
        val len = be16(b, i + 2)
        if (len < 2) return None
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          if (i + 8 >= b.length) return None
          val h = be16(b, i + 5)
          val w = be16(b, i + 7)
          return if (w > 0 && h > 0) Some((w, h)) else None
        }
        i += 2 + len
      }
    }
    None
  }

  /** GIF logical-screen dimensions: 6-byte signature then width/height as
    * little-endian u16 (GIF89a logical screen descriptor).
    */
  def decodeGif(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 13) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = (b(6) & 0xFF) | ((b(7) & 0xFF) << 8)
    val h = (b(8) & 0xFF) | ((b(9) & 0xFF) << 8)
    if (w > 0 && h > 0) Some((w, h)) else None
  }

  /** Magic-dispatched decode (content is the authority, not the mime hint).
    * Unparseable payloads report ("unknown", 0, 0) — downstream filters on
    * codec/width, and fake dimensions would invite silent misuse.
    */
  def decode(media: Array[Byte]): (String, Int, Int) =
    decodePng(media).map { case (w, h) => ("png", w, h) }
      .orElse(decodeJpeg(media).map { case (w, h) => ("jpeg", w, h) })
      .orElse(decodeGif(media).map { case (w, h) => ("gif", w, h) })
      .getOrElse(("unknown", 0, 0))

  /** REAL pixel features for every decodable payload: 4x4 pooled
    * block-mean-luminance over the decoded RGB grid
    * ([[graft.functions.PngCodec.blockFeatures]]) — genuine content
    * statistics, not a hash. PNG and baseline JPEG both fully decode
    * (entropy decode included); anything else returns EMPTY features — an
    * honest no-pixels signal, never a fabricated vector.
    */
  def featurize(media: Array[Byte]): Array[Float] =
    decodePixels(media) match {
      case Some(img) => graft.functions.PngCodec.blockFeatures(img, 4, 4)
      case None      => Array.emptyFloatArray
    }

  /** Full pixel decode, magic-dispatched: PNG first (unambiguous 8-byte
    * signature), then baseline JPEG, then GIF (LZW palette decode).
    */
  def decodePixels(media: Array[Byte]): Option[graft.functions.PngCodec.Image] =
    graft.functions.PngCodec.decode(media)
      .orElse(graft.functions.JpegCodec.decode(media))
      .orElse(graft.functions.GifCodec.decode(media))

  /** Batched decode + featurize. Batches inside each partition mimic the
    * arrow-batch shape of mapInPandas: a real decoder initializes once per
    * partition and processes `BatchSize` payloads per call.
    */
  def extractFeatures(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.mapPartitions { it =>
      // per-partition init point (model/codec handles would be created here)
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { r =>
          val media = if (r.media == null) Array.emptyByteArray else r.media
          val (codec, w, h) = decode(media)
          MediaFeatures(r.id, r.mime, codec, media.length.toLong, w, h, featurize(media))
        }
      }
    }
  }

  // ---- minimal real-file builders (fixtures + the oracle-checked query) ----

  /** Byte length of [[makePng]] output (signature + IHDR + IEND). */
  final val PngLen = 8 + 25 + 12

  /** Minimal structurally-valid PNG: signature, IHDR (8-bit RGB) with real
    * CRC32, IEND. No IDAT — dimension decoders (incl. ours) need none.
    */
  def makePng(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(PngLen)
    PngSig.foreach(out.write)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(len >>> 24); out.write((len >>> 16) & 0xFF); out.write((len >>> 8) & 0xFF); out.write(len & 0xFF)
      val body = ctype.getBytes("US-ASCII") ++ data
      out.write(body, 0, body.length)
      val crc = new java.util.zip.CRC32()
      crc.update(body)
      val c = crc.getValue
      out.write(((c >>> 24) & 0xFF).toInt); out.write(((c >>> 16) & 0xFF).toInt)
      out.write(((c >>> 8) & 0xFF).toInt); out.write((c & 0xFF).toInt)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte; ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte; ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8; ihdr(9) = 2; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    chunk("IHDR", ihdr)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Byte length of [[makeJpeg]] output (SOI + APP0 + SOF0 + EOI). */
  final val JpegLen = 2 + 18 + 19 + 2

  /** Minimal JPEG header stream: SOI, JFIF APP0, SOF0 (3 components) with
    * the given dimensions, EOI. Enough for any SOF-scanning dim parser.
    */
  def makeJpeg(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(JpegLen)
    def b(v: Int): Unit = out.write(v & 0xFF)
    b(0xFF); b(0xD8) // SOI
    b(0xFF); b(0xE0); b(0); b(16) // APP0, len 16
    out.write("JFIF".getBytes("US-ASCII")); b(0) // identifier
    b(1); b(1) // version
    b(0); b(0); b(1); b(0); b(1) // units, densities
    b(0); b(0) // thumbnail
    b(0xFF); b(0xC0); b(0); b(17) // SOF0, len 17
    b(8) // precision
    b(h >>> 8); b(h) // height BE
    b(w >>> 8); b(w) // width BE
    b(3) // 3 components
    b(1); b(0x22); b(0); b(2); b(0x11); b(1); b(3); b(0x11); b(1)
    b(0xFF); b(0xD9) // EOI
    out.toByteArray
  }
}
