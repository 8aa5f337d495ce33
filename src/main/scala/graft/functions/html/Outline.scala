package graft.functions.html

import scala.collection.mutable.ArrayBuffer

/** Document-outline extraction — the h1-h6 heading tree with section
  * numbering, the structural layer between raw text and the
  * structured-metadata tier ([[StructuredData]]): corpus builders use it
  * for section-aware chunking (split long documents at heading
  * boundaries, keep the heading as chunk context), document-structure
  * quality signals (a page with no outline vs a well-sectioned article),
  * and TOC rendering in the markdown sink.
  *
  * Reference analog: the reference's markdown sink renders heading
  * structure from its structured elements (normalizer.py:157-274); the
  * outline here is mined from the SOURCE html in the same single
  * tokenizer pass as everything else, not reconstructed downstream.
  *
  * Built on [[HtmlTokenizer.Sink]] — the ONE parser authority. One
  * forward pass, bounded state: O(open-heading text + headings) per page.
  *
  * Contract (each unit-tested):
  *   - every `<h1>`-`<h6>` yields one heading in document order, its text
  *     entity-decoded and trimmed, nested inline markup flattened;
  *   - an unclosed heading flushes at end-of-document (tolerant, like the
  *     rest of the consumer tier);
  *   - section numbers follow the counter rule: entering level L
  *     increments counter L and zeroes all deeper counters; the path is
  *     counters 1..L joined with '.'. A SKIPPED intermediate level shows
  *     as 0 (`h1` then `h3` → "1.0.1") — the skip is visible, not
  *     papered over, because level-skipping is itself a structure-quality
  *     signal;
  *   - headings nested inside another heading (malformed) are flattened
  *     into the outer heading's text, not emitted as structure.
  */
object Outline {

  final case class Heading(order: Int, level: Int, number: String, title: String)

  def extract(html0: String): Seq[Heading] = {
    val html = if (html0 == null) "" else html0
    val out = new ArrayBuffer[Heading](8)
    val counters = new Array[Int](6)
    val buf = new StringBuilder
    var inLevel = 0 // 0 = not inside a heading
    def headingLevel(name: String): Int =
      if (name.length == 2 && name.charAt(0) == 'h' &&
        name.charAt(1) >= '1' && name.charAt(1) <= '6') name.charAt(1) - '0'
      else 0
    def flush(): Unit = if (inLevel > 0) {
      val l = inLevel
      counters(l - 1) += 1
      var i = l
      while (i < 6) { counters(i) = 0; i += 1 }
      val number = (0 until l).map(counters(_)).mkString(".")
      out += Heading(out.length, l, number, Entities.decode(buf.toString).trim)
      buf.clear()
      inLevel = 0
    }
    val sink = new HtmlTokenizer.Sink {
      def text(src: String, s: Int, e: Int): Unit =
        if (inLevel > 0) buf.append(src.substring(s, e))
      def startTag(name: String, attrs: List[(String, String)], selfClosing: Boolean): Unit = {
        val l = headingLevel(name)
        // a heading opening inside an open heading is malformed markup:
        // keep collecting into the OUTER one (flatten, don't nest)
        if (l > 0 && inLevel == 0 && !selfClosing) inLevel = l
      }
      def endTag(name: String): Unit =
        if (inLevel > 0 && headingLevel(name) == inLevel) flush()
      def boundary(): Unit = ()
    }
    HtmlTokenizer.tokenizeSink(html, sink)
    flush() // unclosed heading at EOF
    out.toSeq
  }
}
