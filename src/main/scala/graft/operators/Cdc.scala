package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — the storage-tier dedup primitive of
  * rsync/LBFS/casync/restic, and the right way to dedup CRAWL SNAPSHOTS:
  * a re-crawled page usually differs from the previous capture by a
  * local edit (new banner, rotated timestamp), which shifts every byte
  * offset after it. Fixed-size blocks lose alignment at the first edit;
  * content-defined boundaries — cut where a hash of the trailing k-byte
  * window satisfies a modulus predicate — depend only on LOCAL content,
  * so the chunk stream resynchronizes right after the edit and the
  * unchanged tail dedups chunk-for-chunk across snapshots.
  *
  * Boundary rule (LBFS, Muthitacharoen et al. 2001): position i
  * (1-based, i >= k) ends a chunk iff the 16-bit md5 prefix of the
  * window text[i-k+1 .. i] is ≡ 0 (mod m); the document end always ends
  * the final chunk; documents shorter than k are one whole-text chunk.
  * Expected chunk length is m. The window hash here is a full md5 per
  * position — the oracle-portable stand-in for a production rolling
  * gear/Rabin hash (O(1) per byte, same cut-point statistics); swapping
  * the window function changes nothing structural. Production CDC also
  * clamps chunk length to [min, max]; the clamp is a stateful sequential
  * rule that no declarative oracle can replay, so this operator keeps
  * the pure positional predicate (FastCDC calls this "normalized
  * chunking" at bounds 0/∞).
  *
  * Scale shape: chunking is MAP-ONLY (one kernel pass per document, no
  * shuffle — same contract as ExtractKernel); the dedup measurement
  * aggregates chunk hashes (shuffle width = one row per chunk, carrying
  * a 32-char digest + length, never chunk bytes).
  */
object Cdc {

  /** Chunks of one document: (md5 hex of chunk, chunk length). */
  def chunk(text: String, k: Int, m: Int): Array[(String, Int)] = {
    require(k >= 1 && m >= 1, s"k and m must be >= 1, got k=$k m=$m")
    if (text == null || text.isEmpty) return Array.empty
    val md = MessageDigest.getInstance("MD5")
    def hex(b: Array[Byte]): String = {
      val sb = new StringBuilder(b.length * 2)
      b.foreach(x => sb.append(f"$x%02x"))
      sb.toString
    }
    val n = text.length
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = k
    while (i <= n) {
      md.reset()
      val d = md.digest(text.substring(i - k, i).getBytes(StandardCharsets.UTF_8))
      val p16 = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      if (p16 % m == 0) cuts += i
      i += 1
    }
    if (cuts.isEmpty || cuts.last != n) cuts += n
    val out = new Array[(String, Int)](cuts.length)
    var prev = 0
    var j = 0
    while (j < cuts.length) {
      val c = cuts(j)
      val piece = text.substring(prev, c)
      md.reset()
      out(j) = (hex(md.digest(piece.getBytes(StandardCharsets.UTF_8))), piece.length)
      prev = c
      j += 1
    }
    out
  }

  /** Explodes `docs` into one row per chunk:
    * (idCol..., chunk_idx, chunk_hash, chunk_len). Map-only.
    */
  def chunkDocs(docs: DataFrame, textCol: String, k: Int, m: Int): DataFrame = {
    val chunkUdf = udf { (t: String) => chunk(t, k, m) }
    val keep = docs.columns.filter(_ != textCol).toSeq.map(col)
    docs
      .select(keep :+ posexplode(chunkUdf(col(textCol))).as(Seq("chunk_idx", "c")): _*)
      .select(keep ++ Seq(
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("c._1").as("chunk_hash"),
        col("c._2").cast("long").as("chunk_len")): _*)
  }
}
