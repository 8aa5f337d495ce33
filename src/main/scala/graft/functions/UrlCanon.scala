package graft.functions

/** URL canonicalization — the prerequisite of dedup-by-URL, the cheapest
  * dedup a web pipeline runs (same page crawled twice under trivially
  * different URLs). Deterministic string rules only, each chosen to be
  * replayable in SQL so the DuckDB oracle canonicalizes the identical
  * strings:
  *
  *   1. drop the fragment (everything from the first '#');
  *   2. lowercase the scheme and the host[:port] — userinfo (before the
  *      first '@'), the path, and the query stay case-sensitive per
  *      RFC 3986 §6.2.2.1;
  *   3. strip the scheme's default port (http :80, https :443);
  *   4. drop tracking parameters (utm_*, fbclid, gclid, ref) and sort the
  *      survivors byte-lexicographically (UTF-8 byte order = code-point
  *      order, the same collation DuckDB's list_sort uses) — parameter
  *      order never changes page identity, tracking params never should;
  *   5. collapse ALL trailing slashes on a non-root path (so the canonical
  *      form is a true fixed point: c(c(u)) == c(u)).
  *
  * No percent-decoding and no IDN mapping: both can CHANGE page identity
  * (%2F vs /, mixed-script homographs), so a canonicalizer that wants
  * byte-identity safety leaves them alone. The authority ends at the FIRST
  * of '/', '?' (or the string end) — a query can legally follow the host
  * with no path — and every other split is at the FIRST occurrence
  * ('://', '?', '#', '@'), the same rules the SQL mirror's strpos
  * arithmetic implements. Map-only scalar; safe in any projection.
  */
object UrlCanon {

  private val TrackingPrefixes = Seq("utm_", "fbclid=", "gclid=", "ref=")

  /** UTF-8 byte-lexicographic order (== code-point order). Java's default
    * String ordering is UTF-16 code-UNIT order, which ranks supplementary
    * characters (surrogate pairs, 0xD800+) BELOW U+E000..U+FFFF — the
    * opposite of what DuckDB's byte-ordered list_sort does. Comparing
    * code points keeps kernel and oracle identical on any input.
    */
  private val CodePointOrdering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      var i = 0; var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i); val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca); j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }
  }

  def canonicalize(url: String): String = {
    if (url == null) return null
    val noFrag = { val i = url.indexOf('#'); if (i >= 0) url.substring(0, i) else url }
    val si = noFrag.indexOf("://")
    if (si < 0) return noFrag // not an absolute URL: pass through untouched
    val scheme = noFrag.substring(0, si).toLowerCase
    val rest = noFrag.substring(si + 3)
    val slash = rest.indexOf('/')
    val quest = rest.indexOf('?')
    val cut =
      if (slash < 0) quest
      else if (quest < 0) slash
      else math.min(slash, quest)
    val authorityRaw = if (cut >= 0) rest.substring(0, cut) else rest
    val pathq = if (cut >= 0) rest.substring(cut) else ""
    val at = authorityRaw.indexOf('@')
    val userinfo = if (at >= 0) authorityRaw.substring(0, at + 1) else ""
    var hostport = (if (at >= 0) authorityRaw.substring(at + 1) else authorityRaw).toLowerCase
    if (scheme == "http" && hostport.endsWith(":80")) hostport = hostport.dropRight(3)
    else if (scheme == "https" && hostport.endsWith(":443")) hostport = hostport.dropRight(4)
    val authority = userinfo + hostport
    val qi = pathq.indexOf('?')
    val path0 = if (qi >= 0) pathq.substring(0, qi) else pathq
    val query = if (qi >= 0) pathq.substring(qi + 1) else ""
    val kept = query.split('&').filter(p =>
      p.nonEmpty && !TrackingPrefixes.exists(p.startsWith))
    val sortedQ = kept.sorted(CodePointOrdering)
    var path = path0
    while (path.length > 1 && path.charAt(path.length - 1) == '/')
      path = path.substring(0, path.length - 1)
    scheme + "://" + authority + path +
      (if (sortedQ.nonEmpty) "?" + sortedQ.mkString("&") else "")
  }
}
