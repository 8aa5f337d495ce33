package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.html.Outline

class OutlineSpec extends AnyFunSuite {

  private def toc(html: String): Seq[(String, String)] =
    Outline.extract(html).map(h => h.number -> h.title)

  test("basic tree: numbering, document order, entity decode, inline markup flattened") {
    val html = "<html><body><h1>Intro</h1><p>body</p><h2>R&amp;<em>D</em></h2>" +
      "<h2>Setup</h2><h1>End</h1></body></html>"
    assert(toc(html) == Seq("1" -> "Intro", "1.1" -> "R&D", "1.2" -> "Setup", "2" -> "End"))
    val orders = Outline.extract(html).map(_.order)
    assert(orders == Seq(0, 1, 2, 3))
  }

  test("level skip is visible as a zero component; deep start begins with zeros") {
    assert(toc("<h1>Top</h1><h3>Deep</h3><h2>Back</h2>") ==
      Seq("1" -> "Top", "1.0.1" -> "Deep", "1.1" -> "Back"))
    assert(toc("<h2>Loose</h2><h1>Main</h1>") ==
      Seq("0.1" -> "Loose", "1" -> "Main"))
  }

  test("unclosed heading flushes at EOF; malformed nested heading flattens into the outer") {
    assert(toc("<h1>Dangling") == Seq("1" -> "Dangling"))
    // <h2> opened inside an open <h1>: malformed — text flattens, one heading
    val got = toc("<h1>Outer <h2>Inner</h2> tail</h1><h2>Next</h2>")
    assert(got.head._2.contains("Outer") && got.head._2.contains("Inner"))
    assert(got.map(_._1) == Seq("1", "1.1"))
  }

  test("script/comment decoys are never headings; empty and null pages give empty outlines") {
    val html = "<script>var x = '<h1>fake</h1>';</script><!-- <h2>no</h2> --><h1>Real</h1>"
    assert(toc(html) == Seq("1" -> "Real"))
    assert(Outline.extract("").isEmpty)
    assert(Outline.extract(null).isEmpty)
  }

  test("sections: preamble, heading boundaries, entity decode, script bodies excluded") {
    val s = Outline.sections(
      "<p>pre &amp; text</p><script>no('<h1>x</h1>')</script>" +
        "<h1>A</h1><p>one two</p><h2>B</h2><p>three</p>")
    assert(s == Seq(
      Outline.Section("", "", "pre & text"),
      Outline.Section("1", "A", "one two"),
      Outline.Section("1.1", "B", "three")))
    // no preamble section when nothing precedes the first heading
    assert(Outline.sections("<h1>A</h1>x") == Seq(Outline.Section("1", "A", "x")))
    // heading with no body still yields its (empty-text) section
    assert(Outline.sections("<h1>A</h1>") == Seq(Outline.Section("1", "A", "")))
    // no headings at all: one unnumbered section with the whole text
    assert(Outline.sections("<p>just text</p>") == Seq(Outline.Section("", "", "just text")))
  }

  test("sectionChunks: token windows per section, heading context prefix, stable ids, guard") {
    val html = "<p>p0 p1</p><h1>Alpha</h1><p>w0 w1 w2 w3 w4</p>"
    val got = Outline.sectionChunks(html, maxTokens = 2)
    assert(got.map(c => (c.section, c.chunk, c.number)) ==
      Seq((0, 0, ""), (1, 0, "1"), (1, 1, "1"), (1, 2, "1")))
    assert(got.head.text == "p0 p1") // preamble: no context prefix
    assert(got(1).text == "Alpha\n\nw0 w1" && got(3).text == "Alpha\n\nw4")
    // empty sections produce no chunks
    assert(Outline.sectionChunks("<h1>A</h1>", 10).isEmpty)
    intercept[IllegalArgumentException] { Outline.sectionChunks(html, 0) }
  }

  test("counters reset deeper levels: sibling after a deep subtree renumbers correctly") {
    assert(toc("<h1>A</h1><h2>B</h2><h3>C</h3><h2>D</h2><h3>E</h3><h1>F</h1><h2>G</h2>") ==
      Seq("1" -> "A", "1.1" -> "B", "1.1.1" -> "C", "1.2" -> "D",
        "1.2.1" -> "E", "2" -> "F", "2.1" -> "G"))
  }
}
