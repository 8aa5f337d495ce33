package graft

import java.sql.Timestamp

/** Input row — the Common-Crawl-style page table (BASELINE.json input_hint):
  * (url, warc_ts, html binary, text golden, lang). One row per document;
  * `html` carries the raw page bytes regardless of actual format (HTML, PDF,
  * plain text), mirroring how the reference reads raw file bytes
  * (combined_pipeline.py:117-119).
  */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** Kernel-stage input row: Page WITHOUT the golden `text` column. The
  * extraction stage projects to this before deserializing, so the parquet
  * scan prunes the (large) golden column instead of decoding it per row
  * (SURVEY.md §4.2 column pruning).
  */
final case class PageIn(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    lang: String
)

/** Output row of the extraction kernel — the fixed-schema Spark analog of the
  * reference's dynamic "structured document" dict (normalizer.py:40-62).
  * Dynamic per-format keys become nullable columns; the long tail would go in
  * a map column (not needed v1).
  */
final case class Extracted(
    url: String,
    warc_ts: Timestamp,
    format: String, // html | pdf | txt | unsupported
    text: String, // extracted text (byte-identity target vs golden)
    charset: String, // detected input encoding
    status: String, // ok | failed | unsupported
    error: String, // null when ok; reference analog enhanced_extract.py:617
    n_blocks: Int, // content blocks emitted (html) / lines (pdf) / 1 (txt)
    n_bytes_in: Long // size of the raw input payload
)
