package graft.functions.html

import graft.functions.TextAssembly
import scala.collection.mutable.ArrayBuffer

/** Main-content HTML extraction: DOM → block segmentation → boilerplate
  * classification by link-density + container heuristics (Boilerpipe /
  * trafilatura-style, per the north rule) → content blocks joined "\n".
  *
  * All thresholds are fixed integer/rational comparisons (no floating point)
  * so classification is bit-deterministic across JVMs (SURVEY.md §7.3).
  *
  * Also provides the reference's *baseline* serialization (`rawText`):
  * script/style removed, every text node on its own line, lines trimmed,
  * blanks dropped, joined "\n" — the BeautifulSoup get_text(separator='\n')
  * contract of enhanced_extract.py:486-498 — and the regex tag-strip
  * fallback of enhanced_extract.py:504-514.
  */
object HtmlExtractor {

  final case class Block(text: String, chars: Int, linkChars: Int, boilerContainer: Boolean, tag: String) {
    /** boilerplate iff in a nav-ish container or link density > 1/3 */
    def isContent: Boolean = !boilerContainer && linkChars * 3 <= chars
  }

  final case class Result(text: String, nBlocks: Int)

  /** Elements that start/end a block (flush boundaries). */
  private[html] val blockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li",
    "table", "tr", "td", "th", "blockquote", "pre", "article", "section",
    "main", "nav", "header", "footer", "aside", "form", "dl", "dt", "dd",
    "figure", "figcaption", "hr", "caption", "thead", "tbody", "tfoot",
    "body", "html", "address", "fieldset", "legend", "details", "summary"
  )

  /** Subtrees skipped entirely (no text contribution). */
  private[html] val skipTags: Set[String] =
    Set("script", "style", "noscript", "template", "head", "title", "iframe", "svg", "select", "option", "button")

  /** Block-level containers whose whole subtree is boilerplate. */
  private[html] val boilerTags: Set[String] = Set("nav", "header", "footer", "aside", "form")

  /** class/id tokens that mark a container as boilerplate (trafilatura-style
    * rule list; fixed set, exact token match after splitting on [\s_-]).
    */
  private val boilerClassTokens: Set[String] = Set(
    "nav", "navbar", "menu", "footer", "header", "sidebar", "banner",
    "breadcrumb", "breadcrumbs", "widget", "ad", "ads", "advert",
    "promo", "social", "share", "comment", "comments", "cookie", "popup"
  )

  /** tokenized boiler-class check without allocations on the common path */
  private[html] def hasBoilerToken(v: String): Boolean = {
    var i = 0
    val n = v.length
    while (i < n) {
      while (i < n && isTokenSep(v.charAt(i))) i += 1
      val s = i
      while (i < n && !isTokenSep(v.charAt(i))) i += 1
      if (i > s && boilerClassTokens.contains(v.substring(s, i).toLowerCase)) return true
    }
    false
  }

  @inline private def isTokenSep(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '_' || c == '-'

  /** length of normalizeWs(t) computed without allocating the result */
  private[html] def normalizedLength(t: String): Int = {
    var len = 0
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < t.length) {
      if (TextAssembly.isSpace(t.charAt(i))) { if (started) pendingSpace = true }
      else {
        if (pendingSpace) { len += 1; pendingSpace = false }
        len += 1
        started = true
      }
      i += 1
    }
    len
  }

  def segment(root: HtmlDom.Element): ArrayBuffer[Block] = {
    val blocks = new ArrayBuffer[Block](16)
    val buf = new StringBuilder
    var bufLink = 0
    var blockTag = "body"

    def flush(boilerDepth: Int): Unit = {
      if (buf.nonEmpty) {
        val t = TextAssembly.normalizeWs(buf.toString)
        if (t.nonEmpty) {
          // linkChars counted on normalized link text accumulated separately;
          // bufLink already holds normalized link lengths
          blocks += Block(t, t.length, math.min(bufLink, t.length), boilerDepth > 0, blockTag)
        }
        buf.clear()
        bufLink = 0
      } else { buf.clear(); bufLink = 0 }
    }

    def hasBoilerAttr(e: HtmlDom.Element): Boolean = {
      if (e.attrs.isEmpty) return false
      val c = e.attr("class")
      val i = e.attr("id")
      (c != null && hasBoilerToken(c)) || (i != null && hasBoilerToken(i))
    }

    def walk(e: HtmlDom.Element, linkDepth: Int, boilerDepth: Int): Unit = {
      e.children.foreach {
        case HtmlDom.TextNode(t) =>
          if (t.nonEmpty) {
            // separate text nodes with a space seam so adjacent inline
            // elements don't fuse words; normalizeWs collapses later
            if (buf.nonEmpty) buf.append(' ')
            buf.append(t)
            if (linkDepth > 0) bufLink += normalizedLength(t)
          }
        case el: HtmlDom.Element =>
          val name = el.name
          if (!skipTags.contains(name)) {
            if (name == "br") { buf.append('\n') }
            else if (blockTags.contains(name)) {
              flush(boilerDepth)
              val childBoiler =
                boilerDepth + (if (boilerTags.contains(name) || hasBoilerAttr(el)) 1 else 0)
              val saveTag = blockTag
              blockTag = name
              walk(el, linkDepth, childBoiler)
              flush(childBoiler)
              blockTag = saveTag
            } else {
              val ld = linkDepth + (if (name == "a") 1 else 0)
              walk(el, ld, boilerDepth)
            }
          }
      }
    }

    walk(root, 0, 0)
    flush(0)
    blocks
  }

  /** North-rule main-content extraction. */
  def extract(html: String): Result = {
    val blocks = segment(HtmlDom.parse(html))
    val content = blocks.filter(_.isContent)
    Result(content.map(_.text).mkString("\n"), content.length)
  }

  /** Document-order structured elements for the Markdown sink (S6):
    * paragraphs (content blocks outside tables, boilerplate containers
    * skipped) and tables (row/cell structure) interleaved exactly as they
    * appear in the source — the reference renderer emits structured
    * elements in document order, so must we. Table <caption> text becomes a
    * paragraph immediately before its table (the reference's table model
    * carries only cell data; dropping the caption would lose content).
    */
  sealed trait DocElement
  final case class DocParagraph(text: String) extends DocElement
  final case class DocTable(rows: Seq[Seq[String]]) extends DocElement

  def documentElements(root: HtmlDom.Element): Seq[DocElement] = {
    val out = new ArrayBuffer[DocElement]
    val buf = new StringBuilder
    def flush(boilerDepth: Int): Unit = {
      val t = TextAssembly.normalizeWs(buf.toString)
      buf.clear()
      if (t.nonEmpty && boilerDepth == 0) out += DocParagraph(t)
    }
    def attrBoiler(el: HtmlDom.Element): Boolean = {
      val c = el.attr("class"); val i = el.attr("id")
      (c != null && hasBoilerToken(c)) || (i != null && hasBoilerToken(i))
    }
    // inside a table subtree only NESTED tables are harvested (cell text
    // already lives in the enclosing table's rows)
    def tablesOnly(e: HtmlDom.Element, boilerDepth: Int): Unit = e.children.foreach {
      case el: HtmlDom.Element if !skipTags.contains(el.name) =>
        if (el.name == "table") emitTable(el, boilerDepth) else tablesOnly(el, boilerDepth)
      case _ => ()
    }
    def emitTable(el: HtmlDom.Element, boilerDepth: Int): Unit = {
      if (boilerDepth == 0) {
        captionText(el).foreach(c => out += DocParagraph(c))
        val rows = tableRows(el)
        if (rows.nonEmpty) out += DocTable(rows)
      }
      tablesOnly(el, boilerDepth)
    }
    def walk(e: HtmlDom.Element, boilerDepth: Int): Unit = e.children.foreach {
      case HtmlDom.TextNode(t) =>
        if (t.nonEmpty) { if (buf.nonEmpty) buf.append(' '); buf.append(t) }
      case el: HtmlDom.Element =>
        val name = el.name
        if (!skipTags.contains(name)) {
          if (name == "table") { flush(boilerDepth); emitTable(el, boilerDepth) }
          else if (name == "br") buf.append(' ')
          else if (blockTags.contains(name)) {
            flush(boilerDepth)
            val childBoiler = boilerDepth + (if (boilerTags.contains(name) || attrBoiler(el)) 1 else 0)
            walk(el, childBoiler)
            flush(childBoiler)
          } else walk(el, boilerDepth)
        }
    }
    walk(root, 0)
    flush(0)
    out.toSeq
  }

  /** Rows of normalized cell texts for ONE table element (thead/tbody/tfoot
    * traversed; nested-table content excluded from cells).
    */
  def tableRows(table: HtmlDom.Element): Seq[Seq[String]] = {
    val rows = new ArrayBuffer[Seq[String]]
    collectTableRows(table, rows)
    rows.toSeq
  }

  private def captionText(table: HtmlDom.Element): Option[String] =
    table.children.collectFirst {
      case el: HtmlDom.Element if el.name == "caption" =>
        TextAssembly.normalizeWs(subtreeText(el))
    }.filter(_.nonEmpty)

  private def subtreeText(e: HtmlDom.Element): String = {
    val sb = new StringBuilder
    def w(x: HtmlDom.Element): Unit = x.children.foreach {
      case HtmlDom.TextNode(t) => if (t.nonEmpty) { if (sb.nonEmpty) sb.append(' '); sb.append(t) }
      case el: HtmlDom.Element => if (!skipTags.contains(el.name)) w(el)
    }
    w(e)
    sb.toString
  }

  /** Structured table data for the Markdown sink (O7/S6): every <table> as
    * rows of normalized cell texts, document order, nested tables included
    * (each reported once, innermost cells belong to the inner table only).
    */
  def tableData(html: String): Seq[Seq[Seq[String]]] = tableData(HtmlDom.parse(html))

  def tableData(root: HtmlDom.Element): Seq[Seq[Seq[String]]] = {
    val out = new ArrayBuffer[Seq[Seq[String]]]
    def walk(e: HtmlDom.Element): Unit = e.children.foreach {
      case el: HtmlDom.Element =>
        if (!skipTags.contains(el.name)) {
          if (el.name == "table") {
            val rows = tableRows(el)
            if (rows.nonEmpty) out += rows
          }
          walk(el) // nested tables still discovered
        }
      case _ => ()
    }
    walk(root)
    out.toSeq
  }

  private def cellText(e: HtmlDom.Element): String = {
    val sb = new StringBuilder
    def w(x: HtmlDom.Element): Unit = x.children.foreach {
      case HtmlDom.TextNode(t) => if (t.nonEmpty) { if (sb.nonEmpty) sb.append(' '); sb.append(t) }
      case el: HtmlDom.Element => if (!skipTags.contains(el.name) && el.name != "table") w(el)
    }
    w(e)
    TextAssembly.normalizeWs(sb.toString)
  }

  private def collectTableRows(e: HtmlDom.Element, rows: ArrayBuffer[Seq[String]]): Unit =
    e.children.foreach {
      case el: HtmlDom.Element if el.name == "tr" =>
        val cells = el.children.collect {
          case c: HtmlDom.Element if c.name == "td" || c.name == "th" => cellText(c)
        }
        if (cells.nonEmpty) rows += cells.toSeq
      case el: HtmlDom.Element if el.name == "thead" || el.name == "tbody" || el.name == "tfoot" =>
        collectTableRows(el, rows)
      case _ => ()
    }

  /** Reference-baseline serialization: all text (incl. boilerplate), one text
    * node per line, cleaned (enhanced_extract.py:486-498). Kept for contract
    * tests and as a user-selectable mode.
    */
  def rawText(html: String): String = {
    val sb = new StringBuilder
    def walk(e: HtmlDom.Element): Unit = e.children.foreach {
      case HtmlDom.TextNode(t)  => sb.append(t).append('\n')
      case el: HtmlDom.Element =>
        if (el.name != "script" && el.name != "style") walk(el)
    }
    walk(HtmlDom.parse(html))
    TextAssembly.cleanLines(sb.toString)
  }

  /** Regex fallback path of the reference (enhanced_extract.py:504-514):
    * strip <[^>]+> then clean lines. No entity decoding (the reference's
    * fallback does none).
    */
  def stripTags(html: String): String =
    TextAssembly.cleanLines(html.replaceAll("<[^>]+>", ""))
}
