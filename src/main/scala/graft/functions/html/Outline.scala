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

  final case class Section(number: String, title: String, text: String)

  /** Sectionize: the page's visible text split at heading boundaries, each
    * section carrying its heading's number+title (content before the first
    * heading becomes a preamble section with number "" and empty title).
    * Same single pass and numbering rule as [[extract]]; script/style
    * bodies never reach the text stream (tokenizer rawContent), whitespace
    * runs collapse to single spaces (section text feeds a tokenizer, not
    * the byte-identity path — that contract belongs to TextAssembly).
    */
  def sections(html0: String): Seq[Section] = {
    val html = if (html0 == null) "" else html0
    val out = new ArrayBuffer[Section](8)
    val counters = new Array[Int](6)
    val headBuf = new StringBuilder
    val bodyBuf = new StringBuilder
    var inLevel = 0
    var curNumber = ""
    var curTitle = ""
    def headingLevel(name: String): Int =
      if (name.length == 2 && name.charAt(0) == 'h' &&
        name.charAt(1) >= '1' && name.charAt(1) <= '6') name.charAt(1) - '0'
      else 0
    def norm(s: String): String = s.split("\\s+").filter(_.nonEmpty).mkString(" ")
    def flushSection(): Unit = {
      val body = norm(Entities.decode(bodyBuf.toString))
      if (body.nonEmpty || curNumber.nonEmpty) out += Section(curNumber, curTitle, body)
      bodyBuf.clear()
    }
    def flushHeading(): Unit = if (inLevel > 0) {
      flushSection() // close the previous section at this heading boundary
      val l = inLevel
      counters(l - 1) += 1
      var i = l
      while (i < 6) { counters(i) = 0; i += 1 }
      curNumber = (0 until l).map(counters(_)).mkString(".")
      curTitle = Entities.decode(headBuf.toString).trim
      headBuf.clear()
      inLevel = 0
    }
    val sink = new HtmlTokenizer.Sink {
      def text(src: String, s: Int, e: Int): Unit =
        (if (inLevel > 0) headBuf else bodyBuf).append(src.substring(s, e))
      def startTag(name: String, attrs: List[(String, String)], selfClosing: Boolean): Unit = {
        val l = headingLevel(name)
        if (l > 0 && inLevel == 0 && !selfClosing) inLevel = l
        else if (inLevel == 0) bodyBuf.append(' ') // block boundary spacer
      }
      def endTag(name: String): Unit =
        if (inLevel > 0 && headingLevel(name) == inLevel) flushHeading()
        else if (inLevel == 0) bodyBuf.append(' ')
      def boundary(): Unit = ()
    }
    HtmlTokenizer.tokenizeSink(html, sink)
    flushHeading() // unclosed heading at EOF
    flushSection() // tail section
    out.toSeq
  }

  /** Section-aware chunking — the training/RAG shape: each section's text
    * split into <= maxTokens whitespace-token windows, every chunk
    * PREFIXED with its heading context ("title\n\n" when the section has
    * one) so a chunk never loses the section it came from. Chunk ids are
    * (section index, chunk index) — stable under re-runs, map-only per
    * document. Preamble text (before the first heading) chunks with no
    * context prefix.
    */
  final case class Chunk(section: Int, chunk: Int, number: String, context: String, text: String)

  def sectionChunks(html: String, maxTokens: Int): Seq[Chunk] = {
    require(maxTokens >= 1, s"sectionChunks: maxTokens must be >= 1, got $maxTokens")
    sections(html).zipWithIndex.flatMap { case (s, si) =>
      val toks = s.text.split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) Nil
      else toks.grouped(maxTokens).zipWithIndex.map { case (w, ci) =>
        val ctx = if (s.title.nonEmpty) s.title + "\n\n" else ""
        Chunk(si, ci, s.number, s.title, ctx + w.mkString(" "))
      }.toSeq
    }
  }
}
