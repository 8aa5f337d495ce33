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

  test("counters reset deeper levels: sibling after a deep subtree renumbers correctly") {
    assert(toc("<h1>A</h1><h2>B</h2><h3>C</h3><h2>D</h2><h3>E</h3><h1>F</h1><h2>G</h2>") ==
      Seq("1" -> "A", "1.1" -> "B", "1.1.1" -> "C", "1.2" -> "D",
        "1.2.1" -> "E", "2" -> "F", "2.1" -> "G"))
  }
}
