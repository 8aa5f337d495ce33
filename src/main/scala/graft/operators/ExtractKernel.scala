package graft.operators

import graft.{Extracted, Page, PageIn}
import graft.functions.{Charsets, CsvKernel, FormatSniff, RtfKernel, TextAssembly}
import graft.functions.office.{DocxKernel, OdtKernel, PptxKernel, XlsxKernel}
import graft.functions.html.HtmlStream
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
  def extractOne(p: Page): Extracted = extractOneIn(PageIn(p.url, p.warc_ts, p.html, p.lang))

  @inline private def orPlaceholder(t: String): String =
    if (t.isEmpty) TextAssembly.NoText else t

  def extractOneIn(p: PageIn): Extracted = {
    val raw = if (p.html == null) Array.emptyByteArray else p.html
    val nBytes = raw.length.toLong // bytes READ — the transport size, pre-inflate
    // transparent gzip envelope (Content-Encoding / per-record WARC gzip):
    // unwrap with the SAME bounded rule the ingest sniff uses, then sniff +
    // extract the inner payload; a corrupt or bomb-sized stream is an
    // unsupported page, never a thrown task
    val bytes = FormatSniff.unwrapGzip(raw) match {
      case Right(inner) => inner
      case Left(err) =>
        return Extracted(p.url, p.warc_ts, "unsupported", TextAssembly.NoText,
          "binary", "unsupported", err, 0, nBytes)
    }
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
          val res = HtmlStream.extract(dec.text)
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
      case FormatSniff.Csv =>
        val dec = Charsets.decode(bytes)
        val (text, rows) = CsvKernel.extract(dec.text)
        Extracted(p.url, p.warc_ts, "csv", orPlaceholder(text), dec.charset, "ok", null, rows, nBytes)
      case FormatSniff.Rtf =>
        val dec = Charsets.decode(bytes)
        val (text, lines) = RtfKernel.extract(dec.text)
        Extracted(p.url, p.warc_ts, "rtf", orPlaceholder(text), dec.charset, "ok", null, lines, nBytes)
      case f @ (FormatSniff.Docx | FormatSniff.Xlsx | FormatSniff.Pptx | FormatSniff.Odt) =>
        try {
          val (text, blocks) = f match {
            case FormatSniff.Docx => DocxKernel.extract(bytes)
            case FormatSniff.Xlsx => XlsxKernel.extract(bytes)
            case FormatSniff.Pptx => PptxKernel.extract(bytes)
            case _                => OdtKernel.extract(bytes)
          }
          Extracted(p.url, p.warc_ts, f, orPlaceholder(text), "zip", "ok", null, blocks, nBytes)
        } catch {
          case e: Exception =>
            Extracted(p.url, p.warc_ts, f, TextAssembly.NoText, "zip", "failed",
              s"$f parse error: ${e.getMessage}", 0, nBytes)
        }
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

  private def kernelStage(pages: Dataset[Page], metrics: Option[Metrics]): Dataset[Extracted] = {
    val spark = pages.sparkSession
    import spark.implicits._
    // project away the golden text column BEFORE deserialization: the scan
    // then never decodes it (visible as ReadSchema in .explain)
    val in = pages.select(col("url"), col("warc_ts"), col("html"), col("lang")).as[PageIn]
    in.mapPartitions { it =>
      it.map { p =>
        val out = extractOneIn(p)
        metrics.foreach { m =>
          m.pages.add(1L)
          m.bytes.add(out.n_bytes_in)
          if (out.status != "ok") m.failures.add(1L)
        }
        out
      }
    }
  }

  /** Map-only distributed extraction — the default physical plan.
    *
    * No pre-kernel shuffle: parquet scan splits are already byte-bounded by
    * `spark.sql.files.maxPartitionBytes`, so task input sizes are balanced
    * regardless of row-size skew or hot hosts — at 1000 executors each task
    * reads ≤128 MB no matter how pages are laid out. Kernel cost is linear
    * in bytes, so byte-bounded splits = time-bounded tasks. Shuffling 100%
    * of the corpus to "salt" it would cost more than the imbalance it
    * prevents (measured in BENCH.md).
    */
  def extract(pages: Dataset[Page], metrics: Option[Metrics] = None): Dataset[Extracted] =
    kernelStage(pages, metrics)

  /** Skew-defused extraction for inputs where scan splits canNOT bound task
    * work (e.g. a source with one row-group per huge file, or kernels with
    * superlinear cost): giant rows (html length > giantThreshold) are
    * salted by url hash across `giantParallelism` dedicated partitions;
    * normal rows stay map-only. NOTE: the branch filters cannot be pushed
    * to parquet, so this plan scans the input twice — only worth it when
    * giant-row task skew costs more than a second scan (it does not for
    * linear kernels over byte-bounded splits, hence extract() is the
    * default; BENCH.md quantifies both).
    */
  def extractBalanced(
      pages: Dataset[Page],
      metrics: Option[Metrics] = None,
      giantThreshold: Int = 256 * 1024,
      giantParallelism: Int = 32
  ): Dataset[Extracted] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val normal = pages.filter(length(col("html")) <= giantThreshold).as[Page]
    val giant = pages
      .filter(length(col("html")) > giantThreshold)
      .repartition(giantParallelism, pmod(xxhash64(col("url")), lit(giantParallelism)))
      .as[Page]
    kernelStage(normal, metrics).unionByName(kernelStage(giant, metrics))
  }

  /** Full salted repartition before the kernel (url-hash spread across
    * numPartitions). Kept for corpora whose input splits are pathologically
    * skewed; BENCH.md quantifies its shuffle overhead vs the map-only plan.
    */
  def extractSalted(
      pages: Dataset[Page],
      numPartitions: Int,
      metrics: Option[Metrics] = None
  ): Dataset[Extracted] = {
    val salted = pages.repartition(numPartitions, pmod(xxhash64(col("url")), lit(numPartitions)))
    kernelStage(salted, metrics)
  }
}
