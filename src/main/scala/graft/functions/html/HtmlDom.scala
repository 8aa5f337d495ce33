package graft.functions.html

import scala.collection.mutable.ArrayBuffer

/** Minimal HTML DOM built from the token stream, with the HTML5 implied-close
  * rules the synthetic corpus exercises (unclosed p/li/td/tr — FIXTURES.md §2
  * adversarial family). From scratch (SURVEY.md §2.7 F1).
  */
object HtmlDom {

  sealed trait Node
  final class Element(val name: String, val attrs: List[(String, String)]) extends Node {
    val children = new ArrayBuffer[Node](4)
    def attr(key: String): String = {
      var as = attrs
      while (as.nonEmpty) { if (as.head._1 == key) return as.head._2; as = as.tail }
      null
    }
  }
  final case class TextNode(text: String) extends Node

  val voidTags: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr"
  )

  /** Start tags that imply </p> when a p is open (HTML5 8.2.5.4.7 subset). */
  val pClosers: Set[String] = Set(
    "address", "article", "aside", "blockquote", "details", "div", "dl",
    "fieldset", "figcaption", "figure", "footer", "form",
    "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "main", "menu",
    "nav", "ol", "p", "pre", "section", "table", "ul"
  )

  def build(toks: Iterable[HtmlTokenizer.Tok]): Element = {
    val (root, sink) = builder()
    toks.foreach(sink)
    root
  }

  /** Streaming builder: returns the root and a token sink; feed tokens via
    * HtmlTokenizer.tokenizeTo for a zero-buffer parse.
    */
  def builder(): (Element, HtmlTokenizer.Tok => Unit) = {
    val root = new Element("#root", Nil)
    var stack: List[Element] = root :: Nil
    @inline def top = stack.head
    def push(e: Element): Unit = { top.children += e; stack = e :: stack }
    def pop(): Unit = if (stack.tail.nonEmpty) stack = stack.tail
    def names = stack.map(_.name)

    /** pop elements until (and including) the first with `name`; no-op if
      * absent (stray end tag is ignored, html.parser behavior).
      */
    def closeThrough(name: String): Unit =
      if (names.contains(name)) { while (top.name != name) pop(); pop() }

    /** pop until top is one of `stops` (or root); used for li/td/tr scoping. */
    def popUntilTopIn(stops: Set[String]): Unit =
      while (stack.tail.nonEmpty && !stops.contains(top.name)) pop()

    val sink: HtmlTokenizer.Tok => Unit = {
      case HtmlTokenizer.Text(t) =>
        top.children += TextNode(t)
      case HtmlTokenizer.EndTag(name) =>
        closeThrough(name)
      case HtmlTokenizer.StartTag(name, attrs, selfClosing) =>
        // implied closes
        if (pClosers.contains(name) && top.name == "p") pop()
        name match {
          case "li" =>
            if (names.contains("li") && !names.take(names.indexOf("li")).exists(n => n == "ul" || n == "ol"))
              closeThrough("li")
          case "dt" | "dd" =>
            if (top.name == "dt" || top.name == "dd") pop()
          case "td" | "th" =>
            if (names.contains("td") || names.contains("th"))
              popUntilTopIn(Set("tr", "table", "tbody", "thead", "tfoot", "#root"))
          case "tr" =>
            if (names.contains("tr"))
              popUntilTopIn(Set("table", "tbody", "thead", "tfoot", "#root"))
          case _ => ()
        }
        val e = new Element(name, attrs)
        if (voidTags.contains(name) || selfClosing) top.children += e
        else push(e)
    }
    (root, sink)
  }

  def parse(html: String): Element = {
    val (root, sink) = builder()
    HtmlTokenizer.tokenizeTo(html, sink)
    root
  }
}
