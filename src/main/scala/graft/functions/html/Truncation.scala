package graft.functions.html

/** Truncated-page detection — the fetch-quality signal: a page cut off
  * mid-transfer (connection drop, Content-Length lie, crawler byte cap)
  * parses fine under a tolerant tokenizer but its TAIL is structurally
  * impossible for a complete document. Corpus pipelines gate on it
  * because a truncated article body silently loses its second half —
  * worse than a failed fetch, which at least says so.
  *
  * One forward state scan (not the tokenizer: the EVIDENCE is precisely
  * the end-state the tolerant tokenizer papers over) classifying where
  * the byte stream ends:
  *
  *  - `in_tag`      — EOF inside `<...` (markup cut mid-tag)
  *  - `in_comment`  — EOF inside an unclosed `<!--`
  *  - `in_script`   — EOF inside an unclosed `<script>`/`<style>` body
  *  - `no_close`    — an `<html>` was opened but no `</html>` ever closes
  *                    it (weak: many real pages omit it, so it is
  *                    reported as its own tier, not lumped with the hard
  *                    evidence)
  *  - `complete`    — none of the above
  *
  * The three hard tiers are near-certain truncation; `no_close` is a
  * prior. Returned as (state, tailChars) where tailChars counts the
  * chars inside the unterminated construct — a 40 KB unclosed script is
  * stronger evidence than a 3-char one.
  */
object Truncation {

  final case class Trunc(state: String, tailChars: Int)

  def detect(html0: String): Trunc = {
    val html = if (html0 == null) "" else html0
    val lower = html.toLowerCase(java.util.Locale.ROOT) // once, not per raw block
    val n = html.length
    var i = 0
    var state = 0 // 0 text, 1 tag, 2 comment, 3 raw (script/style)
    var stateStart = 0
    var rawEnd = "" // the close tag that exits raw state
    var sawHtmlOpen = false
    var sawHtmlClose = false
    while (i < n) {
      state match {
        case 0 =>
          val lt = html.indexOf('<', i)
          if (lt < 0) i = n
          else if (html.startsWith("<!--", lt)) { state = 2; stateStart = lt; i = lt + 4 }
          else { state = 1; stateStart = lt; i = lt + 1 }
        case 1 =>
          val gt = html.indexOf('>', i)
          if (gt < 0) i = n
          else {
            val inner = html.substring(stateStart + 1, gt)
            val name = inner.takeWhile(c => c.isLetterOrDigit || c == '/' || c == '!')
              .toLowerCase(java.util.Locale.ROOT)
            if (name == "html") sawHtmlOpen = true
            if (name == "/html") sawHtmlClose = true
            if ((name == "script" || name == "style") && !inner.endsWith("/")) {
              state = 3; rawEnd = "</" + name; stateStart = gt + 1
            } else state = 0
            i = gt + 1
          }
        case 2 =>
          val end = html.indexOf("-->", i)
          if (end < 0) i = n else { state = 0; i = end + 3 }
        case 3 =>
          val end = lower.indexOf(rawEnd, i)
          if (end < 0) i = n
          else { state = 1; stateStart = end; i = end + 1 } // the </script> tag itself
      }
    }
    state match {
      case 1 => Trunc("in_tag", n - stateStart)
      case 2 => Trunc("in_comment", n - stateStart)
      case 3 => Trunc("in_script", n - stateStart)
      case _ =>
        if (sawHtmlOpen && !sawHtmlClose) Trunc("no_close", 0)
        else Trunc("complete", 0)
    }
  }
}
