package graft.functions

import graft.Extracted
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** S5 — JSON sink (SURVEY.md §2.1): render each extraction record as the
  * reference's canonical structured document (normalizer.py:40-62 shape:
  * document_info / content / layout / processing_info), via
  * `to_json(struct(...))` so the render stays inside whole-stage codegen.
  *
  * Deliberate deviation, documented: the reference stamps
  * `datetime.now().isoformat()` as processing_date (normalizer.py:45); a
  * wall-clock value breaks determinism and byte-identity, so it is omitted
  * here (run metadata belongs in the manifest, not the record).
  */
object JsonSink {

  /** url + the structured-document JSON for each record. */
  def render(ds: Dataset[Extracted]): DataFrame =
    ds.select(
      col("url"),
      col("format"),
      col("text"),
      col("n_bytes_in"),
      to_json(
        struct(
          struct(
            col("url").as("file_path"),
            col("format").as("file_type"),
            col("n_bytes_in").as("file_size")
          ).as("document_info"),
          struct(
            col("text").as("full_text")
          ).as("content"),
          struct(
            col("n_blocks").as("total_regions")
          ).as("layout"),
          struct(
            concat(col("format"), lit("-kernel")).as("extraction_method"),
            col("charset"),
            col("status"),
            col("error")
          ).as("processing_info")
        )
      ).as("doc_json")
    )
}
