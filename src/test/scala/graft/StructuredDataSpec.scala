package graft

import graft.functions.html.StructuredData
import org.scalatest.funsuite.AnyFunSuite

class StructuredDataSpec extends AnyFunSuite {

  test("title, meta (property/name), and JSON-LD capture; entities decode in title/attrs") {
    val html =
      """<!doctype html><html><head>
        |<title>A &amp; B &#8212; site</title>
        |<meta property="og:title" content="OG &quot;quoted&quot;">
        |<meta name="description" content='single quoted'>
        |<script type="application/ld+json">{"@type":"Article","headline":"H1"}</script>
        |</head><body><p>body text</p></body></html>""".stripMargin
    val m = StructuredData.extract(html)
    assert(m.title == "A & B — site")
    assert(m.metas("og:title") == "OG \"quoted\"")
    assert(m.metas("description") == "single quoted")
    assert(m.jsonld == Seq("""{"@type":"Article","headline":"H1"}"""))
  }

  test("decoys never captured: comments, non-LD scripts, style; textarea text unaffected") {
    val html =
      """<head>
        |<!-- <meta property="og:title" content="COMMENT-DECOY"> -->
        |<!-- <script type="application/ld+json">{"headline":"D"}</script> -->
        |<script type="text/javascript">var x = {"headline": "JS-DECOY"};</script>
        |<script>plain script, no type attr {"headline":"NO"}</script>
        |<style>.x { content: "style-decoy"; }</style>
        |<meta property="og:locale" content="en">
        |</head><textarea>{"headline":"TEXTAREA"}</textarea>""".stripMargin
    val m = StructuredData.extract(html)
    assert(m.jsonld.isEmpty)
    assert(m.metas == Map("og:locale" -> "en"))
    assert(m.title == "")
  }

  test("LD type matching: case-insensitive, MIME params ignored; order preserved") {
    val html =
      """<script TYPE="Application/LD+JSON; charset=utf-8"> {"a":1} </script>
        |<script type=" application/ld+json ">{"b":2}</script>
        |<script type="application/ld+jsonx">{"c":3}</script>""".stripMargin
    val m = StructuredData.extract(html)
    assert(m.jsonld == Seq("""{"a":1}""", """{"b":2}"""))
  }

  test("first title wins; first meta occurrence per key wins; property beats name") {
    val html =
      """<title>first</title><title>second</title>
        |<meta property="k" content="v1"><meta property="k" content="v2">
        |<meta name="n" property="p" content="x">""".stripMargin
    val m = StructuredData.extract(html)
    assert(m.title == "first")
    assert(m.metas("k") == "v1")
    assert(m.metas("p") == "x" && !m.metas.contains("n"))
  }

  test("unclosed LD script at EOF is still captured; meta without content is dropped") {
    val m = StructuredData.extract(
      """<meta property="orphan"><script type="application/ld+json">{"tail":true}""")
    assert(m.jsonld == Seq("""{"tail":true}"""))
    assert(m.metas.isEmpty)
  }

  test("uppercase META tag and attribute-order variance parse identically") {
    val a = StructuredData.extract("""<META CONTENT="v" PROPERTY="og:title">""")
    val b = StructuredData.extract("""<meta property="og:title" content="v">""")
    assert(a.metas == b.metas && a.metas("og:title") == "v")
  }

  test("link rel capture: canonical/next/prev, token-list rel, first wins, case folds") {
    val html =
      """<head>
        |<!-- <link rel="canonical" href="https://ex.com/DECOY"> -->
        |<link rel="stylesheet" href="s.css">
        |<LINK HREF='https://ex.com/a1' REL='CANONICAL'>
        |<link rel="canonical" href="https://ex.com/a2-late-repeat">
        |<link rel="next" href="/page/2">
        |<link rel="alternate nofollow" href="/alt">
        |<link rel="prev">
        |</head>""".stripMargin
    val m = StructuredData.extract(html)
    assert(m.links("canonical") == "https://ex.com/a1")
    assert(m.links("next") == "/page/2")
    assert(m.links("alternate") == "/alt" && m.links("nofollow") == "/alt")
    assert(m.links("stylesheet") == "s.css")
    assert(!m.links.contains("prev")) // href-less link carries nothing
  }

  test("hreflang per-language map: case folds, first wins, x-default kept as its own key") {
    val m = StructuredData.extract(
      """<link rel="alternate" HREFLANG="EN" href="/en">
        |<link rel="alternate" hreflang="de" href="/de">
        |<link rel="alternate" hreflang="en" href="/en-DUPLICATE">
        |<link rel="alternate" hreflang="x-default" href="/">
        |<link rel="alternate" hreflang="" href="/empty">""".stripMargin)
    assert(m.hreflangs == Map("en" -> "/en", "de" -> "/de", "x-default" -> "/"))
    // the rel map still collapses alternates to the first — by design
    assert(m.links("alternate") == "/en")
  }

  test("http-equiv metas key under the http-equiv: prefix, value case-folded") {
    val m = StructuredData.extract(
      """<META CONTENT="0; url=/next" HTTP-EQUIV='Refresh'>
        |<meta http-equiv="refresh" content="9; url=/late-duplicate">
        |<meta http-equiv="Content-Type" content="text/html; charset=utf-8">""".stripMargin)
    assert(m.metas("http-equiv:refresh") == "0; url=/next")
    assert(m.metas("http-equiv:content-type") == "text/html; charset=utf-8")
  }

  test("refreshTarget grammar: quotes, case, spacing; pure-delay and empty yield None") {
    import StructuredData.refreshTarget
    assert(refreshTarget("0; url=/next") == Some("/next"))
    assert(refreshTarget("0 ;URL='https://x/y'") == Some("https://x/y"))
    assert(refreshTarget("""5; Url = "/q" """) == Some("/q"))
    assert(refreshTarget("30") == None)          // pure delay
    assert(refreshTarget("0; url=") == None)     // empty target
    assert(refreshTarget("0; url=''") == None)
    assert(refreshTarget("0; uri=/typo") == None)
    assert(refreshTarget(null) == None)
  }

  test("declaredLang: root html lang, case-folded, blank and missing None") {
    import graft.functions.html.StructuredData.declaredLang
    assert(declaredLang("<html LANG=\"EN-us\"><body>x</body></html>") == Some("en-us"))
    assert(declaredLang("<html lang=\"  \">x</html>").isEmpty)
    assert(declaredLang("<div lang=\"fr\">x</div>").isEmpty) // only the root html tag
    assert(declaredLang("no markup").isEmpty)
    assert(declaredLang(null).isEmpty)
  }

  test("firstTime: first <time datetime> wins, attribute-less and decoy forms skipped") {
    import graft.functions.html.StructuredData.firstTime
    assert(firstTime("<body><time datetime=\"2026-02-16\">Feb</time>" +
      "<time datetime=\"2027-01-01\">later</time></body>") == Some("2026-02-16"))
    // a <time> WITHOUT datetime does not consume the slot
    assert(firstTime("<time>tuesday</time><time datetime=\"2026-02-16\">x</time>") ==
      Some("2026-02-16"))
    assert(firstTime("<script>'<time datetime=\"1999-01-01\">'</script>").isEmpty)
    assert(firstTime("no time here").isEmpty)
    assert(firstTime(null).isEmpty)
  }
}
