package graft

import graft.functions.html.Microdata
import graft.functions.html.Microdata.Triple
import org.scalatest.funsuite.AnyFunSuite

class MicrodataSpec extends AnyFunSuite {

  test("product markup: text, meta, href, datetime, and nested-item props") {
    val html =
      """<div itemscope itemtype="https://schema.org/Product">
        |  <span itemprop="name">Acme  &amp;
        |  Anvil</span>
        |  <meta itemprop="sku" content="S-99">
        |  <a itemprop="url" href="/p/99">see</a>
        |  <time itemprop="released" datetime="2026-01-02">Jan 2</time>
        |  <div itemprop="offers" itemscope itemtype="https://schema.org/Offer">
        |    <span itemprop="price">41</span>
        |  </div>
        |</div>""".stripMargin
    val t = Microdata.extract(html)
    val p = "https://schema.org/Product"
    val o = "https://schema.org/Offer"
    assert(t.contains(Triple(p, "sku", "S-99")))
    assert(t.contains(Triple(p, "url", "/p/99")))
    assert(t.contains(Triple(p, "released", "2026-01-02")))
    // nested-item property references the child type; child props attach to the child
    assert(t.contains(Triple(p, "offers", o)))
    assert(t.contains(Triple(o, "price", "41")))
    // text value entity-decoded and whitespace-collapsed
    assert(t.contains(Triple(p, "name", "Acme & Anvil")))
    assert(t.size == 6)
  }

  test("orphan itemprop (no open scope) drops; token-list itemprop fans out") {
    val t = Microdata.extract(
      """<span itemprop="orphan">x</span>
        |<div itemscope itemtype="T"><b itemprop="a b">v</b></div>""".stripMargin)
    assert(t == Seq(Triple("T", "a", "v"), Triple("T", "b", "v")))
  }

  test("props attach to the INNERMOST scope; outer resumes after the child closes") {
    val t = Microdata.extract(
      """<div itemscope itemtype="Outer">
        |<div itemscope itemtype="Inner"><i itemprop="ip">1</i></div>
        |<i itemprop="op">2</i>
        |</div>""".stripMargin)
    assert(t == Seq(Triple("Inner", "ip", "1"), Triple("Outer", "op", "2")))
  }

  test("nested text props both accumulate; mis-nested close and EOF are tolerated") {
    val t = Microdata.extract(
      """<div itemscope itemtype="T">
        |<div itemprop="all">x <span itemprop="part">y</span> z""".stripMargin)
    // EOF closes innermost first
    assert(t == Seq(Triple("T", "part", "y"), Triple("T", "all", "x y z")))

    val m = Microdata.extract(
      "<div itemscope itemtype=\"T\"><b itemprop=\"p\">v</i></b></div>")
    assert(m == Seq(Triple("T", "p", "v")))
  }

  test("script/style bodies and comments never leak into text values") {
    val t = Microdata.extract(
      """<div itemscope itemtype="T"><span itemprop="p">a
        |<!-- <span itemprop="decoy">c</span> -->
        |<script>var x = "b";</script>d</span></div>""".stripMargin)
    assert(t == Seq(Triple("T", "p", "a d")))
  }

  test("itemtype first token only; missing itemtype labels the scope empty") {
    val t = Microdata.extract(
      """<div itemscope itemtype="A B"><i itemprop="p">1</i></div>
        |<div itemscope><i itemprop="q">2</i></div>""".stripMargin)
    assert(t == Seq(Triple("A", "p", "1"), Triple("", "q", "2")))
  }
}
