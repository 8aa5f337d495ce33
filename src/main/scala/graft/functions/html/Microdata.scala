package graft.functions.html

import scala.collection.mutable.ArrayBuffer

/** Schema.org MICRODATA extraction (itemscope/itemtype/itemprop) — the
  * attribute-based structured-data layer next to JSON-LD
  * ([[StructuredData]]): product/offer/article markup that real corpus
  * builders mine for typed provenance. Like every structured consumer in
  * the engine it rides [[HtmlTokenizer.Sink]] — the ONE parser authority —
  * in a single forward pass with bounded state: a scope stack, the open
  * element stack, and one buffer per OPEN text-valued property; memory is
  * O(nesting depth + open prop text), never O(page).
  *
  * Supported subset of the WHATWG algorithm, each rule unit-tested:
  *   - `itemscope` opens an item labeled by its `itemtype` (first
  *     whitespace token; "" when absent); items nest, properties attach
  *     to the INNERMOST open item. `itemprop` outside any item is an
  *     orphan and is dropped.
  *   - `itemprop` is a whitespace token LIST — one triple per token.
  *   - Property value by element kind, per spec: `meta` → `content`;
  *     `a`/`link`/`area` → `href`; `img`/`audio`/`video`/`embed`/
  *     `iframe`/`source`/`track` → `src`; `time` → `datetime` (falling
  *     back to text); `data` → `value`; everything else → the element's
  *     descendant text, entity-decoded, whitespace-collapsed.
  *   - `itemprop` + `itemscope` on one element = a nested-item property:
  *     the triple's value is the NESTED item's itemtype (the reference to
  *     the child item, flattened), then the child scope opens.
  *   - Mis-nested markup closes through the nearest matching open tag
  *     (same tolerance as the extraction kernel); EOF closes what remains.
  */
object Microdata {

  final case class Triple(itemtype: String, prop: String, value: String)

  private val Voids = Set(
    "meta", "link", "br", "img", "hr", "input", "area", "base", "col",
    "embed", "source", "track", "wbr")

  private def attr(attrs: List[(String, String)], name: String): Option[String] =
    attrs.collectFirst { case (k, v) if k == name => v }

  private def firstToken(s: String): String =
    s.trim.split("\\s+").headOption.getOrElse("")

  def extract(html0: String): Seq[Triple] = {
    val html = if (html0 == null) "" else html0
    val out = new ArrayBuffer[Triple]
    // innermost-last stack of open item types
    val scopes = new ArrayBuffer[String]
    // one entry per open TEXT-valued itemprop: (props, owning itemtype, buf)
    final class OpenProp(val props: Array[String], val itemtype: String) {
      val buf = new StringBuilder
    }
    // open-element stack; each frame records what it opened so a close —
    // matched, mis-nested, or EOF — unwinds exactly that
    final class Frame(val name: String) {
      var openedScope = false
      var prop: OpenProp = null
    }
    val stack = new ArrayBuffer[Frame]
    val openProps = new ArrayBuffer[OpenProp]

    def emitText(p: OpenProp): Unit = {
      val v = Entities.decode(p.buf.toString).trim.replaceAll("\\s+", " ")
      p.props.foreach(t => out += Triple(p.itemtype, t, v))
    }
    def closeFrame(f: Frame): Unit = {
      if (f.prop != null) { emitText(f.prop); openProps -= f.prop }
      if (f.openedScope && scopes.nonEmpty) scopes.remove(scopes.length - 1)
    }

    val sink = new HtmlTokenizer.Sink {
      def text(src: String, s: Int, e: Int): Unit = {
        val t = src.substring(s, e)
        openProps.foreach(_.buf.append(t))
      }
      def startTag(name: String, attrs: List[(String, String)], selfClosing: Boolean): Unit = {
        val hasScope = attrs.exists(_._1 == "itemscope")
        val itemtype = if (hasScope) firstToken(attr(attrs, "itemtype").getOrElse("")) else ""
        val propAttr = attr(attrs, "itemprop").map(_.trim).filter(_.nonEmpty)
        val owner = if (scopes.nonEmpty) scopes.last else null
        val tokens = propAttr.map(_.split("\\s+")).getOrElse(Array.empty[String])
        val void = Voids.contains(name) || selfClosing

        var textProp: OpenProp = null
        if (tokens.nonEmpty && owner != null) {
          if (hasScope) {
            // nested-item property: the child itemtype is the reference
            tokens.foreach(t => out += Triple(owner, t, itemtype))
          } else {
            val direct: Option[String] = name match {
              case "meta" => attr(attrs, "content")
              case "a" | "link" | "area" => attr(attrs, "href")
              case "img" | "audio" | "video" | "embed" | "iframe" | "source" | "track" =>
                attr(attrs, "src")
              case "time" => attr(attrs, "datetime")
              case "data" => attr(attrs, "value")
              case _ => None
            }
            direct match {
              case Some(v) => tokens.foreach(t => out += Triple(owner, t, v))
              case None if !void =>
                textProp = new OpenProp(tokens, owner)
                openProps += textProp
              case None => // void element with no value attribute: nothing
            }
          }
        }
        if (!void) {
          val f = new Frame(name)
          f.prop = textProp
          if (hasScope) { scopes += itemtype; f.openedScope = true }
          stack += f
        } else if (hasScope) {
          // itemscope on a void element opens nothing durable — close it
          // immediately (no children can exist)
          ()
        }
      }
      def endTag(name: String): Unit = {
        // close through the nearest matching open tag (mis-nest tolerant);
        // an end tag with no open match is stray markup and ignored
        val idx = stack.lastIndexWhere(_.name == name)
        if (idx >= 0) {
          var i = stack.length - 1
          while (i >= idx) { closeFrame(stack(i)); stack.remove(i); i -= 1 }
        }
      }
      def boundary(): Unit = ()
    }
    HtmlTokenizer.tokenizeSink(html, sink)
    // EOF closes what remains, innermost first
    var i = stack.length - 1
    while (i >= 0) { closeFrame(stack(i)); i -= 1 }
    out.toSeq
  }
}
