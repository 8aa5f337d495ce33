package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.html.Truncation

class TruncationSpec extends AnyFunSuite {

  private def st(h: String): String = Truncation.detect(h).state

  test("hard truncation tiers: mid-tag, unclosed comment, unclosed script body") {
    assert(st("<html><body><p>fine</p><a href=\"x") == "in_tag")
    assert(st("<html><body><!-- cut off here") == "in_comment")
    assert(st("<html><body><script>var x = 1;") == "in_script")
    assert(st("<html><body><style>.a { color:") == "in_script")
    // tailChars measures the unterminated construct
    assert(Truncation.detect("<p>ok</p><a hre").tailChars == 6)
  }

  test("no_close prior vs complete; self-closing script does not enter raw state") {
    assert(st("<html><body><p>x</p></body></html>") == "complete")
    assert(st("<html><body><p>x</p></body>") == "no_close")
    assert(st("<p>fragment without html tag</p>") == "complete")
    assert(st("<html><script src=\"x.js\"/><p>y</p></html>") == "complete")
  }

  test("closed script/comment pass through; case-insensitive close; empty/null complete") {
    assert(st("<html><script>var a = '</p>';</script><p>x</p></html>") == "complete")
    assert(st("<html><SCRIPT>x</ScRiPt><!-- c --></html>") == "complete")
    assert(st("") == "complete")
    assert(st(null) == "complete")
  }
}
