package graft.operators

import graft.Extracted
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregation surface (SURVEY.md §2.10): a custom
  * `Aggregator[IN, BUF, OUT]` with map-side partial aggregation — the typed
  * analog of the reference's per-corpus counters, usable per grouping key
  * (e.g. per host) where plain accumulators cannot be.
  */
object Aggregators {

  final case class ExtractStats(
      pages: Long,
      bytes: Long,
      failures: Long,
      maxBytes: Long,
      totalBlocks: Long
  )

  /** Per-group extraction statistics: pages/bytes/failures/max-page/blocks. */
  object extractStats extends Aggregator[Extracted, ExtractStats, ExtractStats] {
    override def zero: ExtractStats = ExtractStats(0L, 0L, 0L, 0L, 0L)
    override def reduce(b: ExtractStats, e: Extracted): ExtractStats =
      ExtractStats(
        b.pages + 1,
        b.bytes + e.n_bytes_in,
        b.failures + (if (e.status != "ok") 1L else 0L),
        math.max(b.maxBytes, e.n_bytes_in),
        b.totalBlocks + e.n_blocks
      )
    override def merge(a: ExtractStats, b: ExtractStats): ExtractStats =
      ExtractStats(
        a.pages + b.pages,
        a.bytes + b.bytes,
        a.failures + b.failures,
        math.max(a.maxBytes, b.maxBytes),
        a.totalBlocks + b.totalBlocks
      )
    override def finish(r: ExtractStats): ExtractStats = r
    override def bufferEncoder: Encoder[ExtractStats] = Encoders.product[ExtractStats]
    override def outputEncoder: Encoder[ExtractStats] = Encoders.product[ExtractStats]
  }
}
