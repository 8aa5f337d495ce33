package graft.functions.html

/** Hyperlink + anchor-text extraction — the signal the link graph and
  * anchor-text corpus tiers consume. Runs the same zero-copy tokenizer
  * sink as the text extractor ([[HtmlTokenizer.Sink]]), so link harvest
  * costs one streaming pass, no DOM.
  *
  * Semantics:
  *   - every `<a href=...>` contributes (resolved absolute url, anchor
  *     text): text is the entity-decoded, whitespace-collapsed character
  *     content up to the matching `</a>` (markup inside the anchor —
  *     `<b>`, `<span>` — contributes its text, script/style content
  *     never does);
  *   - anchors do not nest in HTML: an `<a>` inside an open anchor
  *     implicitly closes the previous one (browser behavior);
  *   - href resolution is RFC 3986 against the DOCUMENT BASE — the first
  *     `<base href>` when present (itself resolved against the page url,
  *     applied to links processed after it, browser behavior), else the
  *     page url; rooted, relative with `..`, protocol-relative all
  *     supported via java.net.URI; only http/https results are kept —
  *     `javascript:`, `mailto:`, `data:` and pure-fragment hrefs are
  *     link-graph noise and are dropped;
  *   - fragments are stripped from resolved urls (the graph node is the
  *     document, not the in-page position).
  */
object HtmlLinks {

  /** (resolved absolute url, normalized anchor text) for every kept link,
    * in document order. Empty anchor text is kept as "" (image links).
    */
  def extract(html: String, baseUrl: String): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    val sink = new HtmlTokenizer.Sink {
      private var href: String = null // non-null = anchor open
      // java.lang.StringBuilder: the scala one turns append(s, from, to)
      // into append(Any) of a TUPLE (overload trap)
      private val text = new java.lang.StringBuilder
      private var skip = 0 // script/style/noscript depth
      // effective document base: the FIRST <base href> (per the HTML
      // spec) overrides the page url for every link processed after it
      // — browser behavior for the streaming pass. The base may itself
      // be relative (resolved against the page url); non-http(s) bases
      // are noise and ignored.
      private var base: String = baseUrl
      private var baseSeen = false

      private def emit(): Unit = {
        if (href != null) {
          resolve(base, href).foreach(abs => out += abs -> normalize(text.toString))
          href = null
        }
        text.setLength(0)
      }

      def text(src: String, s: Int, e: Int): Unit =
        if (href != null && skip == 0) text.append(src, s, e)

      def startTag(n: String, attrs: List[(String, String)], sc: Boolean): Unit = n match {
        case "a" =>
          emit() // implicit close: anchors never nest
          if (!sc) href = attrs.collectFirst { case ("href", v) => v }.orNull
        case "script" | "style" | "noscript" => if (!sc) skip += 1
        case "base" =>
          attrs.collectFirst { case ("href", v) => v }.foreach { b =>
            if (!baseSeen) {
              baseSeen = true
              resolve(baseUrl, b).foreach(abs => base = abs)
            }
          }
        case _ => ()
      }

      def endTag(n: String): Unit = n match {
        case "a"                             => emit()
        case "script" | "style" | "noscript" => if (skip > 0) skip -= 1
        case _                               => ()
      }

      def boundary(): Unit = ()

      def finish(): Unit = emit() // unclosed trailing anchor still counts
    }
    HtmlTokenizer.tokenizeSink(html, sink)
    sink.finish()
    out.result()
  }

  /** Entity-decode then collapse all whitespace runs to single spaces. */
  private def normalize(raw: String): String = {
    val dec = Entities.decode(raw)
    val sb = new StringBuilder(dec.length)
    var pendingSpace = false
    var i = 0
    while (i < dec.length) {
      val c = dec.charAt(i)
      if (Character.isWhitespace(c) || c == '\u00A0' /* nbsp: not Java-isWhitespace */) pendingSpace = sb.nonEmpty
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** RFC 3986 resolution; Some(absolute http/https url, fragment stripped)
    * or None for noise schemes, pure fragments, and unparseable hrefs.
    */
  def resolve(baseUrl: String, href: String): Option[String] = {
    val h = href.trim
    if (h.isEmpty || h.startsWith("#")) return None
    try {
      val resolved = new java.net.URI(baseUrl).resolve(h)
      val scheme = resolved.getScheme
      if (scheme != "http" && scheme != "https") return None
      // Strip the fragment with a string cut, NOT by rebuilding from
      // decoded components: getPath/getQuery percent-DECODE, and the
      // multi-arg URI constructor re-encodes only illegal chars, so a
      // rebuild rewrites %2F to '/' and %26 to '&' — a different
      // resource, and a dst url that no longer string-matches the
      // crawl's url column (same hazard UrlCanon.scala documents).
      val s = resolved.toString
      val hashAt = s.indexOf('#')
      Some(if (hashAt < 0) s else s.substring(0, hashAt))
    } catch { case _: Exception => None }
  }
}
