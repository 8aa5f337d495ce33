package graft.functions.html

/** `<meta name="robots">` directive extraction — the in-page half of
  * robots exclusion ([[graft.operators.Robots]] handles robots.txt per
  * RFC 9309; the robots META tag governs per-page indexing and is what
  * a crawl-admission pipeline must honor before a page enters a
  * training corpus). Runs the same zero-copy tokenizer sink as the
  * extractor: one streaming pass, no DOM; scanning stops at the first
  * `</head>` (engines ignore robots tags in the body).
  *
  * Semantics (the documented engine behavior):
  *   - tags whose `name` equals "robots" case-insensitively apply;
  *   - `content` is a comma-separated, case-insensitive,
  *     whitespace-tolerant directive list; `none` = noindex + nofollow;
  *   - multiple robots tags combine RESTRICTIVELY (any noindex wins);
  *   - unknown directives (`noarchive`, `nosnippet`, ...) are ignored
  *     here: admission only needs the index/follow pair.
  *
  * Reference analog: per-file admission gating before extraction
  * (combined_pipeline.py routes inputs by type before any kernel runs).
  */
object MetaRobots {

  final case class Directives(noindex: Boolean, nofollow: Boolean)

  def parse(html: String): Directives = {
    var noindex = false
    var nofollow = false
    var inHead = true // no-explicit-<head> documents honored until a </head>
    val sink = new HtmlTokenizer.Sink {
      def text(src: String, s: Int, e: Int): Unit = ()
      def startTag(n: String, attrs: List[(String, String)], sc: Boolean): Unit = {
        if (inHead && n == "meta") {
          val isRobots = attrs.exists { case (k, v) =>
            k == "name" && v != null && v.trim.equalsIgnoreCase("robots")
          }
          if (isRobots) attrs.find(_._1 == "content").foreach { case (_, c) =>
            if (c != null) c.split(',').foreach { d =>
              d.trim.toLowerCase match {
                case "noindex" => noindex = true
                case "nofollow" => nofollow = true
                case "none" => noindex = true; nofollow = true
                case _ => ()
              }
            }
          }
        }
        // body start also ends the head scan for head-less documents
        if (n == "body") inHead = false
      }
      def endTag(n: String): Unit = if (n == "head") inHead = false
      def boundary(): Unit = ()
    }
    HtmlTokenizer.tokenizeSink(html, sink)
    Directives(noindex, nofollow)
  }
}
