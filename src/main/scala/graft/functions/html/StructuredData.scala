package graft.functions.html

import scala.collection.mutable.ArrayBuffer

/** Structured-metadata extraction from HTML — the machine-readable layer
  * next to the main-content text the boilerplate pipeline keeps: JSON-LD
  * blocks (`<script type="application/ld+json">`, schema.org Article
  * metadata — headline/author/date on news pages), OpenGraph / named
  * `<meta>` tags, and the `<title>`. Real web-corpus builders mine these
  * for document-level provenance (publish date for dedup recency, author
  * for attribution, canonical titles); the reference's extractors discard
  * everything in `<head>` (its get_text analog strips tags wholesale), so
  * this is a capability tier the Spark-first design adds on top of the
  * same single-pass tokenizer.
  *
  * Built on [[HtmlTokenizer.Sink]] — the ONE HTML parser authority in the
  * engine — via the `rawContent` hook (script bodies are raw text the
  * text-extraction path rightly discards; JSON-LD capture needs the raw
  * span verbatim, entity-undecoded, because its content is JSON, not
  * HTML). One forward pass, bounded state: O(title + metas + ld blocks)
  * per page, independent of page size — a giant page cannot OOM an
  * executor any more than the extraction kernel can.
  *
  * Contract details, each unit-tested:
  *   - title: FIRST `<title>` element only, entity-decoded, trimmed.
  *   - metas: every `<meta>` carrying (`property` or `name`) AND
  *     `content`, in document order; `property` wins when both naming
  *     attrs are present (the OpenGraph convention); duplicate keys keep
  *     the FIRST occurrence (later `<meta>` repeats are noise).
  *   - jsonld: raw trimmed body of every `<script>` whose `type` is
  *     `application/ld+json` (ASCII-case-insensitive, parameters after
  *     `;` ignored per RFC 2045) — non-LD scripts, style, comments, and
  *     commented-out decoy markup are never captured (comments are
  *     consumed by the tokenizer before any sink sees them).
  *   - links: every `<link>` carrying `rel` AND `href`; rel is split on
  *     whitespace (the spec's token-list form), each token lowercased and
  *     keying the FIRST href seen. `canonical` feeds alias-cluster dedup,
  *     `next`/`prev` feed pagination stitching ([[graft.operators.Paginate]]).
  */
object StructuredData {

  final case class PageMeta(
      title: String,
      metas: Map[String, String],
      jsonld: Seq[String],
      links: Map[String, String],
      hreflangs: Map[String, String])

  def extract(html0: String): PageMeta = {
    val html = if (html0 == null) "" else html0 // null page = empty page, like the kernels
    val metas = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val links = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val hreflangs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val lds = new ArrayBuffer[String](2)
    val titleBuf = new StringBuilder
    var inTitle = false
    var titleDone = false
    var wantLd = false
    val sink = new HtmlTokenizer.Sink {
      def text(src: String, s: Int, e: Int): Unit =
        if (inTitle && !titleDone) titleBuf.append(src.substring(s, e))
      def startTag(name: String, attrs: List[(String, String)], selfClosing: Boolean): Unit = {
        name match {
          case "title" if !titleDone && !selfClosing => inTitle = true
          case "meta" =>
            // http-equiv metas (refresh, content-type) key under an
            // "http-equiv:" prefix so they can never collide with a
            // property/name of the same spelling; value folding matches
            // the header-name case-insensitivity they emulate.
            val key = attrs.collectFirst { case ("property", v) => v }
              .orElse(attrs.collectFirst { case ("name", v) => v })
              .orElse(attrs.collectFirst { case ("http-equiv", v) =>
                "http-equiv:" + v.trim.toLowerCase(java.util.Locale.ROOT) })
            val content = attrs.collectFirst { case ("content", v) => v }
            for (k <- key; v <- content) if (!metas.contains(k)) metas.put(k, v)
          case "script" =>
            wantLd = attrs.collectFirst { case ("type", v) => v }.exists(isLdType)
          case "link" =>
            // <link rel=... href=...>: rel is a whitespace-separated token
            // LIST per the HTML spec ("alternate nofollow"), matched
            // ASCII-case-insensitively; each token keys the FIRST href seen
            // (later repeats are noise, same policy as metas). canonical /
            // next / prev are the tokens the corpus operators consume.
            val rel = attrs.collectFirst { case ("rel", v) => v }
            val href = attrs.collectFirst { case ("href", v) => v }
            for (r <- rel; h <- href; tok <- r.split("\\s+") if tok.nonEmpty) {
              val k = tok.toLowerCase(java.util.Locale.ROOT)
              if (!links.contains(k)) links.put(k, h)
            }
            // hreflang variants keep the per-LANGUAGE map (BCP 47 tags are
            // case-insensitive; lowercase is the canonical comparison form)
            // — the rel map above collapses all alternates to one href,
            // which is exactly what language-variant mining must not do.
            val hl = attrs.collectFirst { case ("hreflang", v) =>
              v.trim.toLowerCase(java.util.Locale.ROOT) }
            for (l <- hl; h <- href if l.nonEmpty) {
              if (!hreflangs.contains(l)) hreflangs.put(l, h)
            }
          case _ => ()
        }
      }
      def endTag(name: String): Unit =
        if (name == "title" && inTitle) { inTitle = false; titleDone = true }
      def boundary(): Unit = ()
      override def rawContent(name: String, src: String, s: Int, e: Int): Unit = {
        if (name == "script" && wantLd) lds += src.substring(s, e).trim
        if (name == "script") wantLd = false
      }
    }
    HtmlTokenizer.tokenizeSink(html, sink)
    PageMeta(Entities.decode(titleBuf.toString).trim, metas.toMap, lds.toSeq,
      links.toMap, hreflangs.toMap)
  }

  /** Redirect target of a meta-refresh content value — `"5; url=/next"`,
    * `"0;URL='https://x'"`, quote/case/whitespace tolerant per the HTML
    * spec's refresh grammar. None for a pure-delay refresh (no url=) or
    * an empty target: those reload the SAME page and must not become
    * redirect edges. Pair with `metas("http-equiv:refresh")` to mine
    * client-side redirect chains the HTTP layer never sees.
    */
  def refreshTarget(content: String): Option[String] = {
    if (content == null) return None
    val semi = content.indexOf(';')
    if (semi < 0) return None
    val rest = content.substring(semi + 1).trim
    val lower = rest.toLowerCase(java.util.Locale.ROOT)
    if (!lower.startsWith("url")) return None
    val afterKey = rest.substring(3).trim
    if (!afterKey.startsWith("=")) return None
    var t = afterKey.substring(1).trim
    if (t.length >= 2 && ((t.head == '"' && t.last == '"') ||
        (t.head == '\'' && t.last == '\''))) t = t.substring(1, t.length - 1).trim
    if (t.isEmpty) None else Some(t)
  }

  /** `application/ld+json` with optional MIME parameters, ASCII-case-
    * insensitive (`<script TYPE="Application/LD+JSON; charset=utf-8">`
    * appears in the wild).
    */
  private def isLdType(t: String): Boolean = {
    val semi = t.indexOf(';')
    val base = if (semi >= 0) t.substring(0, semi) else t
    base.trim.equalsIgnoreCase("application/ld+json")
  }

  /** The root `<html lang="...">` declaration, lowercased (BCP 47 tags
    * compare case-insensitively) — the page's OWN language claim, audited
    * against the detected language ([[graft.functions.TextStats.langId]])
    * by the `t_lang_declared` tier: declared-vs-detected disagreement is
    * a standing web-corpus quality signal (template lang attributes
    * survive translation; CMS defaults lie).
    */
  def declaredLang(html0: String): Option[String] = {
    val html = if (html0 == null) "" else html0
    var found: Option[String] = None
    val sink = new HtmlTokenizer.Sink {
      def text(src: String, s: Int, e: Int): Unit = ()
      def startTag(name: String, attrs: List[(String, String)], selfClosing: Boolean): Unit =
        if (found.isEmpty && name == "html")
          found = attrs.collectFirst { case ("lang", v) if v.trim.nonEmpty =>
            v.trim.toLowerCase(java.util.Locale.ROOT) }
      def endTag(name: String): Unit = ()
      def boundary(): Unit = ()
    }
    HtmlTokenizer.tokenizeSink(html, sink)
    found
  }

  /** First `<time datetime="...">` attribute value in document order —
    * the in-CONTENT date signal between the declared meta layer
    * (`article:published_time`) and the url-path hint
    * ([[graft.functions.UrlDates]]); [[graft.functions.UrlDates.publishDateFused]]
    * is the precedence fusion. Raw attribute value (entity-decoded by the
    * tokenizer's attr path), validation belongs to the fusion layer.
    */
  def firstTime(html0: String): Option[String] = {
    val html = if (html0 == null) "" else html0
    var found: Option[String] = None
    val sink = new HtmlTokenizer.Sink {
      def text(src: String, s: Int, e: Int): Unit = ()
      def startTag(name: String, attrs: List[(String, String)], selfClosing: Boolean): Unit =
        if (found.isEmpty && name == "time")
          found = attrs.collectFirst { case ("datetime", v) => v }
      def endTag(name: String): Unit = ()
      def boundary(): Unit = ()
    }
    HtmlTokenizer.tokenizeSink(html, sink)
    found
  }
}
