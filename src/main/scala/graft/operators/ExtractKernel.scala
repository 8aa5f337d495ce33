package graft.operators

import graft.{Extracted, Page}
import graft.functions.{Charsets, FormatSniff, TextAssembly}
import graft.functions.html.HtmlExtractor
import graft.functions.pdf.PdfExtractor
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** The format-dispatched extraction operator (north rule): content sniff →
  * charset detect → per-format kernel, one `mapPartitions` stage so Catalyst
  * sees a single narrow transform and the columnar→row boundary is crossed
  * once (SURVEY.md §1.2, §4.3). The dispatch cascade mirrors the reference's
  * process_file switch (enhanced_extract.py:584-610) with OCR replaced by
  * deterministic kernels.
  */
object ExtractKernel {

  /** Per-row extraction — pure, total (never throws). */
  def extractOne(p: Page): Extracted = {
    val bytes = if (p.html == null) Array.emptyByteArray else p.html
    val nBytes = bytes.length.toLong
    FormatSniff.sniff(bytes) match {
      case FormatSniff.Pdf =>
        PdfExtractor.extract(bytes) match {
          case Right(res) =>
            val text = if (res.text.isEmpty) TextAssembly.NoText else res.text
            Extracted(p.url, p.warc_ts, "pdf", text, "binary", "ok", null, res.nLines, nBytes)
          case Left(err) =>
            Extracted(p.url, p.warc_ts, "pdf", TextAssembly.NoText, "binary", "failed", err, 0, nBytes)
        }
      case FormatSniff.Html =>
        val dec = Charsets.decode(bytes, isHtml = true)
        try {
          val res = HtmlExtractor.extract(dec.text)
          val text = if (res.text.isEmpty) TextAssembly.NoText else res.text
          Extracted(p.url, p.warc_ts, "html", text, dec.charset, "ok", null, res.nBlocks, nBytes)
        } catch {
          case e: Exception =>
            Extracted(p.url, p.warc_ts, "html", TextAssembly.NoText, dec.charset, "failed",
              s"html parse error: ${e.getClass.getSimpleName}", 0, nBytes)
        }
      case FormatSniff.Txt =>
        val dec = Charsets.decode(bytes)
        val text = if (dec.text.isEmpty) TextAssembly.NoText else dec.text
        Extracted(p.url, p.warc_ts, "txt", text, dec.charset, "ok", null, 1, nBytes)
      case other => // empty | binary
        Extracted(p.url, p.warc_ts, "unsupported", TextAssembly.NoText,
          if (other == FormatSniff.Empty) "none" else "binary", "unsupported",
          s"unsupported payload: $other", 0, nBytes)
    }
  }

  /** Accumulator bundle — the north rule's per-partition live metrics
    * (reference analog: success/failure counters,
    * simple_extract.py:318-335).
    */
  final case class Metrics(pages: LongAccumulator, bytes: LongAccumulator, failures: LongAccumulator)

  object Metrics {
    def register(spark: SparkSession): Metrics = Metrics(
      spark.sparkContext.longAccumulator("graft.pages"),
      spark.sparkContext.longAccumulator("graft.bytes"),
      spark.sparkContext.longAccumulator("graft.failures")
    )
  }

  /** Distributed extraction. `salted=true` repartitions on a hash of the full
    * url (NOT the host — ~20% of rows share one hot host, and giant pages
    * cluster there; FIXTURES.md §2) so task sizes stay balanced at 1000
    * executors. Kernel cost is proportional to bytes, not rows, so byte skew
    * is the real enemy — url-hash spread is the cheapest defuse and keeps
    * the stage a single exchange.
    */
  def extract(
      pages: Dataset[Page],
      numPartitions: Int,
      metrics: Option[Metrics] = None,
      salted: Boolean = true
  ): Dataset[Extracted] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val spread =
      if (salted) pages.repartition(numPartitions, pmod(xxhash64(col("url")), lit(numPartitions)))
      else pages
    spread.mapPartitions { it =>
      it.map { p =>
        val out = extractOne(p)
        metrics.foreach { m =>
          m.pages.add(1L)
          m.bytes.add(out.n_bytes_in)
          if (out.status != "ok") m.failures.add(1L)
        }
        out
      }
    }
  }
}
