package graft.fixtures

/** Fixed vocabulary for synthetic page content. ASCII core + a latin-1 tier
  * (charset fallback coverage) + a Malayalam tier (lang=ml rows, cf. the
  * reference's Malayalam handling, enhanced_extract.py:101-111).
  */
object Words {
  val core: IndexedSeq[String] = Vector(
    "data", "pipeline", "extraction", "document", "content", "engine",
    "spark", "cluster", "partition", "shuffle", "scale", "text", "page",
    "crawl", "web", "index", "token", "block", "layout", "format", "charset",
    "stream", "batch", "query", "table", "filter", "join", "group", "sort",
    "merge", "hash", "byte", "line", "word", "host", "link", "anchor",
    "article", "section", "heading", "paragraph", "result", "metric",
    "throughput", "latency", "executor", "driver", "task", "stage", "plan",
    "schema", "column", "row", "value", "record", "field", "system",
    "process", "worker", "thread", "memory", "disk", "network", "storage",
    "compute", "model", "sample", "measure", "report", "summary", "detail",
    "quality", "density", "signal", "noise", "ratio", "score", "rank"
  )

  val latin1: IndexedSeq[String] =
    Vector("café", "naïve", "résumé", "piñata", "über", "façade", "crème")

  val malayalam: IndexedSeq[String] =
    Vector("കേരളം", "ഭാഷ", "വാക്ക്",
      "പുസ്തകം", "വിവരം")

  /** Tokens with HTML-significant characters — exercise entity encoding. */
  val special: IndexedSeq[String] =
    Vector("R&D", "a<b", "x>y", "\"quoted\"", "it's", "5°C", "price—low")

  def sentence(r: Rng, nWords: Int, tier: Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < nWords) {
      if (i > 0) sb.append(' ')
      val w =
        if (tier == 1 && r.chance(15)) r.pick(latin1)
        else if (tier == 2 && r.chance(25)) r.pick(malayalam)
        else if (r.chance(4)) r.pick(special)
        else r.pick(core)
      sb.append(if (i == 0 && w.head.isLetter) w.capitalize else w)
      i += 1
    }
    sb.append('.')
    sb.toString
  }

  /** A paragraph: 2-6 sentences joined with single spaces. */
  def paragraph(r: Rng, tier: Int): String = {
    val n = r.range(2, 6)
    (0 until n).map(_ => sentence(r, r.range(5, 16), tier)).mkString(" ")
  }
}
