package graft.fixtures

/** Synthetic HTML page factory. Each page is built from *known* content
  * blocks (the golden text, by construction) wrapped in realistic
  * boilerplate — nav/header/footer/aside/sidebar, script/style, comments,
  * entities — that the extractor must strip (FIXTURES.md §2). This mirrors
  * how the reference's input_files/ → output/ pairs act as goldens.
  */
object HtmlGen {

  final case class GenPage(html: String, golden: String)

  private val navNames = Vector("Home", "About", "Products", "Contact", "Blog", "Careers", "Login", "Search")
  private val boilerClasses = Vector("sidebar", "menu", "widget", "promo", "social-share", "cookie-banner")

  /** Escape text for HTML body context; the extractor's entity decoder must
    * invert this exactly.
    */
  def esc(t: String): String = {
    val sb = new StringBuilder(t.length + 8)
    t.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '°' => sb.append("&deg;")
      case '—' => sb.append("&mdash;")
      case 'é' => sb.append("&eacute;")
      case c   => sb.append(c)
    }
    sb.toString
  }

  /** Clean family: well-formed page, sized like real web HTML (~10-30 KB;
    * Common-Crawl pages average tens of KB) so benchmarks are kernel-bound.
    */
  def clean(r: Rng, tier: Int, giant: Boolean = false): GenPage = {
    val heading = Words.sentence(r, r.range(3, 6), tier)
    val nPara = if (giant) r.range(800, 1500) else r.range(12, 40)
    val paragraphs = (0 until nPara).map(_ => Words.paragraph(r, tier))
    val listItems =
      if (!giant && r.chance(50)) (0 until r.range(2, 6)).map(_ => Words.sentence(r, r.range(3, 7), tier))
      else Seq.empty

    val golden = (heading +: (paragraphs ++ listItems)).mkString("\n")

    val sb = new StringBuilder(4096)
    sb.append("<!DOCTYPE html>\n<html>\n<head>\n")
    sb.append(s"<title>${esc(Words.sentence(r, 3, 0))}</title>\n")
    sb.append("<meta name=\"viewport\" content=\"width=device-width\">\n")
    sb.append("<style>body { margin: 0; } .menu > li { color: #333; }</style>\n")
    sb.append("<script>var cfg = {\"a\": \"<div>not real</div>\", 'b': 1 < 2};</script>\n")
    sb.append("</head>\n<body>\n")
    // header + nav boilerplate
    sb.append("<header><div class=\"banner\">")
    sb.append(esc(Words.sentence(r, 4, 0)))
    sb.append("</div>\n<nav><ul>\n")
    (0 until r.range(3, 6)).foreach { _ =>
      sb.append(s"""<li><a href="/${r.pick(navNames).toLowerCase}">${r.pick(navNames)}</a></li>\n""")
    }
    sb.append("</ul></nav></header>\n")
    if (r.chance(40)) sb.append(s"<!-- build ${r.nextInt(100000)} <p>commented out</p> -->\n")
    // main content
    sb.append("<main>\n<article>\n")
    sb.append(s"<h1>${maybeNbsp(r, esc(heading))}</h1>\n")
    paragraphs.foreach { p =>
      sb.append(s"<p>${maybeNbsp(r, esc(p))}</p>\n")
      if (r.chance(10)) sb.append(s"<!-- ad slot ${r.nextInt(100)} -->\n")
    }
    if (listItems.nonEmpty) {
      sb.append("<ul>\n")
      listItems.foreach(it => sb.append(s"<li>${esc(it)}</li>\n"))
      sb.append("</ul>\n")
    }
    sb.append("</article>\n</main>\n")
    // aside / sidebar boilerplate
    if (r.chance(60)) {
      sb.append(s"""<div class="${r.pick(boilerClasses)}"><ul>\n""")
      (0 until r.range(2, 5)).foreach { _ =>
        sb.append(s"""<li><a href="#">${esc(Words.sentence(r, 2, 0))}</a></li>\n""")
      }
      sb.append("</ul></div>\n")
    }
    // link-dense related block (no boiler class — dropped by link density)
    if (r.chance(50)) {
      sb.append("<div>")
      (0 until r.range(3, 6)).foreach { _ =>
        sb.append(s"""<a href="/p/${r.nextInt(1000)}">${r.pick(navNames)}</a> """)
      }
      sb.append("</div>\n")
    }
    sb.append(s"<footer><p>${esc(Words.sentence(r, 5, 0))} &copy; 2025</p>")
    sb.append("""<a href="/terms">Terms</a> <a href="/privacy">Privacy</a></footer>""")
    sb.append("\n</body>\n</html>\n")
    GenPage(sb.toString, golden)
  }

  private def maybeNbsp(r: Rng, escaped: String): String =
    if (r.chance(20)) {
      val i = escaped.indexOf(' ')
      if (i > 0) escaped.substring(0, i) + "&nbsp;" + escaped.substring(i + 1) else escaped
    } else escaped

  /** Adversarial family: malformed markup the DOM implied-close rules must
    * survive (FIXTURES.md §2 adversarial).
    */
  def adversarial(r: Rng, tier: Int): GenPage = {
    val p1 = Words.paragraph(r, tier)
    val p2 = Words.paragraph(r, tier)
    val items = (0 until r.range(2, 4)).map(_ => Words.sentence(r, r.range(3, 6), tier))
    val cells = (0 until r.range(2, 3)).map(_ => Words.sentence(r, 3, tier))
    val cells2 = (0 until 2).map(_ => Words.sentence(r, 3, tier))
    val tail = Words.paragraph(r, tier)

    val golden = (Seq(p1, p2) ++ items ++ cells ++ cells2 :+ tail).mkString("\n")

    val sb = new StringBuilder(2048)
    sb.append("<html><head><title>t</title></head><body>\n")
    // unclosed <p> pair
    sb.append(s"<p>${esc(p1)}\n<p>${esc(p2)}\n")
    // script in body containing fake tags + CDATA noise
    sb.append("<script type=\"text/javascript\">if (a < b) { document.write(\"<p>fake</p>\"); }</script>\n")
    sb.append("<![CDATA[ <div>ignored</div> ]]>")
    // unclosed <li>
    sb.append("<ul>\n")
    items.foreach(it => sb.append(s"<li>${esc(it)}\n"))
    sb.append("</ul>\n")
    // table with unclosed td/tr, attribute containing '>'
    sb.append("<table border=1>\n<tr>")
    cells.foreach(c => sb.append(s"""<td title="a > b">${esc(c)}"""))
    sb.append("\n<tr>")
    cells2.foreach(c => sb.append(s"<td>${esc(c)}"))
    sb.append("\n</table>\n")
    // bare ampersand + unknown entity stay verbatim
    sb.append(s"<div><p>${esc(tail)}</p></div>\n")
    sb.append("</body></html>")
    GenPage(sb.toString, golden)
  }
}
