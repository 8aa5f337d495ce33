package graft.functions.html

import scala.collection.mutable.ArrayBuffer

/** Image + alt-text harvest — the multimodal PAIR miner: (absolute image
  * url, alt text) rows are the raw material of web-scale image-text
  * corpora (CLIP-style training sets are built by exactly this crawl
  * pass). Rides the one tokenizer authority ([[HtmlTokenizer.Sink]]) in a
  * single streaming pass: no DOM, bounded state, base-href aware like the
  * hyperlink harvest ([[HtmlLinks]]).
  *
  * Semantics, each unit-tested:
  *   - `<img src>` emits one row; `alt` is the entity-decoded attribute
  *     ("" when absent — the pair miner downstream decides whether
  *     caption-less images are useful).
  *   - `srcset` (on `<img>` and `<source>`) contributes every CANDIDATE
  *     url: comma-separated `url [descriptor]` entries, the url being the
  *     first whitespace-delimited token of each entry. Rows from srcset
  *     carry the SAME alt as the owning img ("" for `<source>`, which has
  *     no alt of its own) and are flagged `from_srcset`.
  *   - Resolution is RFC 3986 against the effective document base (first
  *     `<base href>` else the page url); only http/https survive —
  *     `data:` inlines and junk schemes drop.
  *   - Duplicate urls within one page are kept (the downstream groupBy
  *     decides); document order is preserved.
  */
object ImageLinks {

  final case class Img(url: String, alt: String, fromSrcset: Boolean)

  /** Split a srcset value into candidate URLS (first token per
    * comma-separated entry). Descriptors (2x, 640w) are dropped — the
    * fetch frontier wants every variant url; density selection is a
    * downstream policy.
    */
  def srcsetUrls(srcset: String): Seq[String] =
    if (srcset == null) Seq.empty
    else srcset.split(',').toSeq
      .map(_.trim.split("\\s+").headOption.getOrElse(""))
      .filter(_.nonEmpty)

  def extract(html0: String, baseUrl: String): Seq[Img] = {
    val html = if (html0 == null) "" else html0
    val out = new ArrayBuffer[Img]
    val sink = new HtmlTokenizer.Sink {
      private var base: String = baseUrl
      private var baseSeen = false
      private def attr(attrs: List[(String, String)], n: String): Option[String] =
        attrs.collectFirst { case (k, v) if k == n => v }
      def text(src: String, s: Int, e: Int): Unit = ()
      def startTag(name: String, attrs: List[(String, String)], selfClosing: Boolean): Unit =
        name match {
          case "base" =>
            attr(attrs, "href").foreach { b =>
              if (!baseSeen) {
                baseSeen = true
                HtmlLinks.resolve(baseUrl, b).foreach(abs => base = abs)
              }
            }
          case "img" | "source" =>
            val alt = if (name == "img") attr(attrs, "alt").getOrElse("") else ""
            if (name == "img")
              for (s <- attr(attrs, "src"); abs <- HtmlLinks.resolve(base, s))
                out += Img(abs, alt, fromSrcset = false)
            for (ss <- attr(attrs, "srcset"); cand <- srcsetUrls(ss);
                 abs <- HtmlLinks.resolve(base, cand))
              out += Img(abs, alt, fromSrcset = true)
          case _ => ()
        }
      def endTag(name: String): Unit = ()
      def boundary(): Unit = ()
    }
    HtmlTokenizer.tokenizeSink(html, sink)
    out.toSeq
  }
}
