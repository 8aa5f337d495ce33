package graft.functions.html

import scala.collection.mutable.ArrayBuffer

/** Code-block mining — the code-corpus tier: pretraining pipelines
  * harvest fenced code from web pages (tutorials, docs, Q&A) as a
  * distinct high-value modality, and the main-content extractor is the
  * WRONG tool for it (its whitespace grammar collapses runs — code needs
  * exact indentation). One tokenizer pass collecting every top-level
  * `<pre>` block with:
  *
  *  - text VERBATIM: entity-decoded but whitespace-preserved (the
  *    °indentation is the data°), nested inline markup (span syntax
  *    highlighting) flattened to its text;
  *  - the declared language: `language-x` / `lang-x` class token on the
  *    `<pre>` or its first `<code>` child (the highlight.js/Prism/GFM
  *    convention), lowercased; empty when undeclared;
  *  - inline `<code>` OUTSIDE `<pre>` ignored (that is prose typography,
  *    not a code block); `<pre>` nested in `<pre>` flattened;
  *  - script/style bodies never captured (tokenizer rawContent).
  *
  * Reference analog: none — the reference's extractors flatten `<pre>`
  * like any text (enhanced_extract.py:486-514); this tier exists because
  * a 100 TB web corpus feeds code models too.
  */
object CodeBlocks {

  final case class CodeBlock(order: Int, lang: String, text: String)

  private def langOf(attrs: List[(String, String)]): String =
    attrs.collectFirst { case ("class", v) => v }.toSeq
      .flatMap(_.split("\\s+"))
      .collectFirst {
        case t if t.toLowerCase.startsWith("language-") => t.substring(9).toLowerCase
        case t if t.toLowerCase.startsWith("lang-")     => t.substring(5).toLowerCase
      }
      .getOrElse("")

  def extract(html0: String): Seq[CodeBlock] = {
    val html = if (html0 == null) "" else html0
    val out = new ArrayBuffer[CodeBlock](4)
    val buf = new StringBuilder
    var preDepth = 0
    var lang = ""
    val sink = new HtmlTokenizer.Sink {
      def text(src: String, s: Int, e: Int): Unit =
        if (preDepth > 0) buf.append(src.substring(s, e))
      def startTag(name: String, attrs: List[(String, String)], selfClosing: Boolean): Unit =
        name match {
          case "pre" if !selfClosing =>
            if (preDepth == 0) { buf.clear(); lang = langOf(attrs) }
            preDepth += 1
          case "code" if preDepth > 0 && lang.isEmpty =>
            lang = langOf(attrs)
          case "br" if preDepth > 0 => buf.append('\n')
          case _ => ()
        }
      def endTag(name: String): Unit =
        if (name == "pre" && preDepth > 0) {
          preDepth -= 1
          if (preDepth == 0) {
            val t = Entities.decode(buf.toString)
            // strip the conventional single leading newline after <pre>
            val clean = if (t.startsWith("\n")) t.substring(1) else t
            if (clean.trim.nonEmpty) out += CodeBlock(out.length, lang, clean)
            buf.clear()
          }
        }
      def boundary(): Unit = ()
    }
    HtmlTokenizer.tokenizeSink(html, sink)
    // unclosed <pre> at EOF flushes (tolerant like the other consumers)
    if (preDepth > 0 && buf.toString.trim.nonEmpty) {
      val t = Entities.decode(buf.toString)
      out += CodeBlock(out.length, lang, if (t.startsWith("\n")) t.substring(1) else t)
    }
    out.toSeq
  }
}
