package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.html.DomShape

class DomShapeSpec extends AnyFunSuite {

  test("shape depends on the tag skeleton only: text and attributes are invisible") {
    val a = DomShape.shape("<html><body class=\"x\"><p id=\"1\">hello</p></body></html>")
    val b = DomShape.shape("<html><body><p>completely different words</p></body></html>")
    assert(a.path == "html>body>p" && b.path == a.path)
    assert(a.hash == b.hash)
    val c = DomShape.shape("<html><body><div>hello</div></body></html>")
    assert(c.path != a.path && c.hash != a.hash)
  }

  test("maxTags caps the path but total keeps counting; script/comment decoys excluded") {
    val html = "<a></a>" * 100
    val sh = DomShape.shape(html, maxTags = 5)
    assert(sh.path == "a>a>a>a>a" && sh.nTags == 100)
    val decoy = DomShape.shape("<script>var x = '<div><div>';</script><!-- <p> --><b>x</b>")
    assert(decoy.path == "script>b") // the script TAG counts; its body never does
    intercept[IllegalArgumentException] { DomShape.shape("<p>", 0) }
  }

  test("empty and null pages give the empty shape with a deterministic hash") {
    val e = DomShape.shape("")
    val n = DomShape.shape(null)
    assert(e.path == "" && e.nTags == 0 && e.hash == n.hash && n.path == "")
  }
}
