package graft

import graft.functions.html.ImageLinks
import graft.functions.html.ImageLinks.Img
import org.scalatest.funsuite.AnyFunSuite

class ImageLinksSpec extends AnyFunSuite {

  private val page = "https://site.org/dir/page.html"

  test("img src + alt pairs; relative/rooted resolution; data: and junk drop") {
    val t = ImageLinks.extract(
      """<img src="a.jpg" alt="Cat &amp; dog">
        |<img src="/i/b.png" alt="">
        |<img src="c.gif">
        |<img src="data:image/gif;base64,R0lGOD=" alt="inline">
        |<img alt="no src at all">""".stripMargin, page)
    assert(t == Seq(
      Img("https://site.org/dir/a.jpg", "Cat & dog", false),
      Img("https://site.org/i/b.png", "", false),
      Img("https://site.org/dir/c.gif", "", false)))
  }

  test("srcset candidates all emit, flagged, sharing the img alt; source has no alt") {
    val t = ImageLinks.extract(
      """<img src="s.jpg" alt="hero" srcset="s-1x.jpg 1x, s-2x.jpg 2x,
        |  /big/s-3x.jpg 3x">
        |<picture><source srcset="w640.webp 640w, w1280.webp 1280w">
        |<img src="fallback.jpg" alt="pic"></picture>""".stripMargin, page)
    assert(t == Seq(
      Img("https://site.org/dir/s.jpg", "hero", false),
      Img("https://site.org/dir/s-1x.jpg", "hero", true),
      Img("https://site.org/dir/s-2x.jpg", "hero", true),
      Img("https://site.org/big/s-3x.jpg", "hero", true),
      Img("https://site.org/dir/w640.webp", "", true),
      Img("https://site.org/dir/w1280.webp", "", true),
      Img("https://site.org/dir/fallback.jpg", "pic", false)))
  }

  test("base href re-roots image urls; commented imgs never emit") {
    val t = ImageLinks.extract(
      """<base href="https://cdn.net/a/">
        |<!-- <img src="decoy.jpg" alt="x"> -->
        |<img src="real.jpg" alt="r">""".stripMargin, page)
    assert(t == Seq(Img("https://cdn.net/a/real.jpg", "r", false)))
  }

  test("srcsetUrls tokenization: descriptors dropped, blank entries skipped") {
    assert(ImageLinks.srcsetUrls("a.jpg 1x, b.jpg 2x") == Seq("a.jpg", "b.jpg"))
    assert(ImageLinks.srcsetUrls(" c.png ") == Seq("c.png"))
    assert(ImageLinks.srcsetUrls("d.png 640w,, ") == Seq("d.png"))
    assert(ImageLinks.srcsetUrls(null) == Seq.empty)
  }
}
