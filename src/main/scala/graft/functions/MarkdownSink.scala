package graft.functions

import graft.Extracted

/** Markdown rendering of an extraction record (SURVEY.md §2.1 S6 — the
  * reference's `_generate_markdown`, normalizer.py:157-274, renders the
  * structured doc as a report). Not on the byte-identity path; a debug /
  * publishing view: header metadata table + the extracted text with block
  * lines as paragraphs.
  */
object MarkdownSink {

  def render(e: Extracted): String = {
    val sb = new StringBuilder(e.text.length + 256)
    sb.append("# ").append(e.url).append('\n').append('\n')
    sb.append("| field | value |\n|---|---|\n")
    sb.append("| format | ").append(e.format).append(" |\n")
    sb.append("| charset | ").append(e.charset).append(" |\n")
    sb.append("| status | ").append(e.status).append(" |\n")
    sb.append("| blocks | ").append(e.n_blocks).append(" |\n")
    sb.append("| bytes in | ").append(e.n_bytes_in).append(" |\n")
    if (e.error != null) sb.append("| error | ").append(e.error.replace("|", "\\|")).append(" |\n")
    sb.append('\n')
    // blocks (newline-separated in `text`) become markdown paragraphs
    var first = true
    e.text.split("\n").foreach { line =>
      if (line.nonEmpty) {
        if (!first) sb.append('\n')
        sb.append(line).append('\n')
        first = false
      }
    }
    sb.toString
  }

  /** Column form for query use: render via the kernel in one pass. */
  def renderColumn(
      ds: org.apache.spark.sql.Dataset[Extracted]
  ): org.apache.spark.sql.DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map(e => (e.url, render(e))).toDF("url", "markdown")
  }
}
