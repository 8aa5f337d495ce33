package graft.functions

import java.util.zip.Deflater

/** Compression-ratio quality signal — the Gopher/RefinedWeb-family
  * compressibility filter: highly repetitive text (boilerplate walls,
  * keyword-stuffing spam, templated listings) deflates far below
  * natural prose, so `deflate_len/raw_len` is a cheap, model-free
  * repetition detector that catches patterns n-gram heuristics miss
  * (long-period repeats, near-repeats with counters). Pure JDK zlib at
  * a FIXED level/strategy/nowrap so the permille ratio is deterministic
  * for a given input across executors and runs (one cluster image =
  * one zlib; pin the image if ratios feed a persisted gate). Map-only,
  * no shuffle — among the cheapest per-doc quality signals after the
  * counting ones. Reference analog: per-document quality gating on
  * scalar signals (enhanced_extract.py:629).
  */
object Compressibility {

  /** Deflated byte length of the UTF-8 text at level 6, raw stream (no
    * zlib header/checksum, so tiny inputs aren't dominated by framing).
    * Deterministic for a fixed JDK zlib. Null/empty text → 0.
    */
  def deflatedLen(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    val in = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val d = new Deflater(6, /*nowrap=*/ true)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** 1000 * deflated/raw over UTF-8 bytes, floor division — an integer
    * permille so downstream gates and tests never touch floats.
    * Null/empty text → 1000 (incompressible by convention: empty docs
    * should be length-gated upstream, not laundered through this
    * signal as "maximally repetitive").
    */
  def ratioPermille(text: String): Long = {
    if (text == null || text.isEmpty) return 1000L
    val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
    1000L * deflatedLen(text) / raw
  }
}
