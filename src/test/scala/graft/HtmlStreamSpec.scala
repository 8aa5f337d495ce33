package graft

import graft.fixtures.{CorpusGen, HtmlGen, Rng}
import graft.functions.Charsets
import graft.functions.html.{HtmlExtractor, HtmlStream}
import org.scalatest.funsuite.AnyFunSuite

/** The streaming (SAX, no-DOM) extractor must be observationally identical
  * to the DOM reference implementation — over the whole synthetic corpus and
  * over the adversarial unit snippets.
  */
class HtmlStreamSpec extends AnyFunSuite {

  test("streaming == DOM over 3000 generated html payloads") {
    var checked = 0
    (0L until 3000L).foreach { id =>
      val p = CorpusGen.page(id)
      if (graft.functions.FormatSniff.sniff(p.html) == "html") {
        val s = Charsets.decode(p.html, isHtml = true).text
        val dom = HtmlExtractor.extract(s)
        val str = HtmlStream.extract(s)
        assert(str == dom, s"id=$id diverged")
        checked += 1
      }
    }
    assert(checked > 1000)
  }

  test("streaming == DOM on adversarial snippets") {
    val cases = Seq(
      "<body><p>one<p>two<p>three</body>",
      "<ul><li>a<li>b<li>c</ul>",
      "<table><tr><td>c1<td>c2<tr><td>c3</table>",
      "<ul><li>a<ul><li>a1<li>a2</ul><li>b</ul>",
      "<div>x</span></p></div>",
      "<html><head><title>T</title><style>p{}</style></head><body><p>x</p></body></html>",
      "<body><nav><a href='/'>Home</a></nav><p>real</p><footer>f</footer></body>",
      "<div class=\"sidebar\"><p>no</p></div><p>yes</p>",
      "<div>before<iframe><p>x</p></iframe>after</div>",
      "<p>a<br>b</p><hr><p>c</p>",
      "<div><a href=1>One</a> <a href=2>Two</a> <a href=3>Three</a></div><div>lots of plain words here with <a>one</a></div>",
      "<dl><dt>t1<dd>d1<dt>t2<dd>d2</dl>",
      "<select><option>A</option><option>B</option></select><p>keep</p>",
      "<div><textarea>raw &amp; <b>not-a-tag</b></textarea><p>after</p></div>",
      "<p>a</p><textarea>unterminated tail with <fake>",
      "<form><textarea>inside boiler form</textarea></form><p>keep</p>",
      "<textarea>&#x110000; invalid ref stays literal</textarea>",
      "text with no tags at all",
      ""
    )
    cases.foreach { html =>
      assert(HtmlStream.extract(html) == HtmlExtractor.extract(html), s"diverged on: $html")
    }
  }

  test("streaming == DOM on random adversarial pages") {
    (0 until 300).foreach { i =>
      val r = new Rng(1000L + i)
      val gp = HtmlGen.adversarial(r, 0)
      assert(HtmlStream.extract(gp.html) == HtmlExtractor.extract(gp.html), s"seed ${1000 + i}")
    }
  }
}
