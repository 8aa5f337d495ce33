package graft

import graft.functions.MarkdownSink
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class MarkdownSinkSpec extends AnyFunSuite {
  test("renders metadata table + paragraphs; escapes pipes in errors") {
    val e = Extracted("https://a/b", new Timestamp(0), "html", "Title line\nBody para",
      "utf-8", "ok", null, 2, 123L)
    val md = MarkdownSink.render(e)
    assert(md.startsWith("# https://a/b\n"))
    assert(md.contains("| format | html |"))
    assert(md.contains("Title line\n"))
    assert(md.contains("\nBody para\n"))
    val bad = e.copy(status = "failed", error = "weird | pipe")
    assert(MarkdownSink.render(bad).contains("weird \\| pipe"))
  }
}
