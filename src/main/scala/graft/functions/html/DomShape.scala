package graft.functions.html

/** DOM-shape fingerprinting — STRUCTURAL template detection: pages built
  * from the same CMS template share their tag skeleton even when every
  * word of text differs, so a fingerprint over the tag sequence clusters
  * a site into page TYPES (article / listing / product / error) where
  * text-level dedup sees nothing. The complement of
  * [[graft.operators.Boilerplate]] (which needs repeated TEXT):
  * template-family sizes feed crawl prioritization (one exemplar per
  * listing template), wrapper induction, and spam-farm detection
  * (thousands of near-identical skeletons on one host).
  *
  * Fingerprint = the first `maxTags` start-tag NAMES in document order
  * (attributes and text excluded by construction — they carry the
  * per-page variation), joined with '>', plus a 64-bit rolling hash of
  * the same sequence for shuffle-friendly keying. One tokenizer pass,
  * bounded state, decoys (script/style bodies, comments) never
  * contribute — the tokenizer consumes them before any sink sees them.
  */
object DomShape {

  final case class Shape(path: String, hash: Long, nTags: Int)

  def shape(html0: String, maxTags: Int = 64): Shape = {
    require(maxTags >= 1, s"shape: maxTags must be >= 1, got $maxTags")
    val html = if (html0 == null) "" else html0
    val names = new scala.collection.mutable.ArrayBuffer[String](maxTags)
    var total = 0
    val sink = new HtmlTokenizer.Sink {
      def text(src: String, s: Int, e: Int): Unit = ()
      def startTag(name: String, attrs: List[(String, String)], selfClosing: Boolean): Unit = {
        total += 1
        if (names.length < maxTags) names += name
      }
      def endTag(name: String): Unit = ()
      def boundary(): Unit = ()
    }
    HtmlTokenizer.tokenizeSink(html, sink)
    val path = names.mkString(">")
    var h = 0x9E3779B97F4A7C15L
    names.foreach { n =>
      var i = 0
      while (i < n.length) { h = graft.functions.TextStats.mix64(h ^ n.charAt(i).toLong); i += 1 }
      h = graft.functions.TextStats.mix64(h ^ 0x3E) // '>' separator step
    }
    Shape(path, h, total)
  }
}
