package graft

import graft.functions.html.HtmlLinks
import graft.operators.AnchorText
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class HtmlLinksSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-links")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base = "https://site.example.org/dir/page.html"

  test("href resolution: absolute, rooted, relative, dot-dot, protocol-relative") {
    assert(HtmlLinks.resolve(base, "https://other.org/x") === Some("https://other.org/x"))
    assert(HtmlLinks.resolve(base, "/t/1") === Some("https://site.example.org/t/1"))
    assert(HtmlLinks.resolve(base, "sub.html") === Some("https://site.example.org/dir/sub.html"))
    assert(HtmlLinks.resolve(base, "../t/2") === Some("https://site.example.org/t/2"))
    assert(HtmlLinks.resolve(base, "//cdn.org/y") === Some("https://cdn.org/y"))
    assert(HtmlLinks.resolve(base, "x?q=1#frag") === Some("https://site.example.org/dir/x?q=1"))
    assert(HtmlLinks.resolve(base, "#frag").isEmpty)
    assert(HtmlLinks.resolve(base, "javascript:void(0)").isEmpty)
    assert(HtmlLinks.resolve(base, "mailto:a@b.c").isEmpty)
    assert(HtmlLinks.resolve(base, "ht tp://broken").isEmpty)
  }

  test("percent-encoded hrefs survive resolution byte-for-byte") {
    // a rebuild from decoded URI components would rewrite %2F to '/' and
    // %26 to '&' — a DIFFERENT resource whose url no longer string-matches
    // the crawl's url column (the hazard UrlCanon documents)
    assert(HtmlLinks.resolve(base, "/a%2Fb") === Some("https://site.example.org/a%2Fb"))
    assert(HtmlLinks.resolve(base, "x?q=%26y") === Some("https://site.example.org/dir/x?q=%26y"))
    assert(HtmlLinks.resolve(base, "/p%20q?a=%3D#f") === Some("https://site.example.org/p%20q?a=%3D"))
  }

  test("anchor text: markup inside, entities, whitespace collapse, implicit close") {
    val html =
      """<html><body>
        |<a href="/a">first <b>bold</b>   text</a>
        |<a href="/b">uses &amp; entity&nbsp;here
        |<a href="/c">implicitly closed previous</a>
        |<a href="/d"><img src="x.png"></a>
        |<a href="/e">skip <script>var x = "</a>";</script>script body</a>
        |no anchor text out here
        |</body></html>""".stripMargin
    val links = HtmlLinks.extract(html, base)
    assert(links === Seq(
      "https://site.example.org/a" -> "first bold text",
      "https://site.example.org/b" -> "uses & entity here",
      "https://site.example.org/c" -> "implicitly closed previous",
      "https://site.example.org/d" -> "",
      "https://site.example.org/e" -> "skip script body"))
  }

  test("topAnchors: exact bounded top-k per target, no window") {
    import spark.implicits._
    // dst X: anchors a=3, b=2, c=1; dst Y: single anchor
    val rows =
      Seq.fill(3)(("s", "X", "a")) ++ Seq.fill(2)(("s", "X", "b")) ++
        Seq(("s", "X", "c"), ("s", "Y", "only"))
    val out = AnchorText.topAnchors(rows.toDF("src", "dst", "anchor"), k = 2)
      .orderBy($"dst").collect()
    assert(out.length === 2)
    assert(out(0).getString(0) === "X")
    assert(out(0).getLong(1) === 6L) // n_inlinks
    assert(out(0).getLong(2) === 3L) // distinct anchors
    assert(out(0).getSeq[String](3) === Seq("a", "b"))
    assert(out(1).getSeq[String](3) === Seq("only"))
  }

  test("base href redirects relative links; first base wins; relative base composes") {
    // absolute base: relative and rooted hrefs follow the base authority
    val abs = HtmlLinks.extract(
      """<head><base href="https://cdn.example.net/assets/"></head>
        |<a href="a.html">1</a><a href="/root.html">2</a>
        |<a href="//other.net/x">3</a><a href="https://abs.com/y">4</a>""".stripMargin, base)
    assert(abs.map(_._1) === Seq(
      "https://cdn.example.net/assets/a.html",
      "https://cdn.example.net/root.html",
      "https://other.net/x",
      "https://abs.com/y"))

    // relative base resolves against the page url first
    val rel = HtmlLinks.extract(
      """<base href="sub/"><a href="a.html">1</a>""", base)
    assert(rel.map(_._1) === Seq("https://site.example.org/dir/sub/a.html"))

    // only the FIRST base counts; links before it use the page url
    val first = HtmlLinks.extract(
      """<a href="early.html">0</a>
        |<base href="https://b1.org/p/"><base href="https://b2.org/q/">
        |<a href="late.html">1</a>""".stripMargin, base)
    assert(first.map(_._1) === Seq(
      "https://site.example.org/dir/early.html", "https://b1.org/p/late.html"))

    // a non-http(s) or unparseable base is ignored, not crashed on
    val junk = HtmlLinks.extract(
      """<base href="javascript:void(0)"><a href="a.html">1</a>""", base)
    assert(junk.map(_._1) === Seq("https://site.example.org/dir/a.html"))
  }

  test("TopK aggregator merge is exact over distinct items and breaks ties lexicographically") {
    val agg = AnchorText.TopK(3)
    val items = Seq(("z", 5L), ("a", 5L), ("m", 7L), ("q", 1L), ("b", 5L))
    // reduce in two arbitrary halves then merge — same as any other order
    val (h1, h2) = items.splitAt(2)
    val m = agg.merge(
      h1.foldLeft(agg.zero)(agg.reduce),
      h2.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(agg.merge(m, agg.zero)) === Seq("m", "a", "b"))
  }
}
