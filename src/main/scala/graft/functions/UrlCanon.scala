package graft.functions

/** URL canonicalization — the prerequisite of dedup-by-URL, the cheapest
  * dedup a web pipeline runs (same page crawled twice under trivially
  * different URLs). Deterministic string rules only, each chosen to be
  * replayable in SQL so the DuckDB oracle canonicalizes the identical
  * strings:
  *
  *   1. drop the fragment (everything from the first '#');
  *   2. lowercase the scheme and the authority (host[:port]) — the path
  *      and query stay case-sensitive per RFC 3986 §6.2.2.1;
  *   3. strip the scheme's default port (http :80, https :443);
  *   4. drop tracking parameters (utm_*, fbclid, gclid, ref) and sort the
  *      survivors byte-lexicographically — parameter order never changes
  *      page identity, tracking params never should;
  *   5. collapse a trailing slash on a non-root path.
  *
  * No percent-decoding and no IDN mapping: both can CHANGE page identity
  * (%2F vs /, mixed-script homographs), so a canonicalizer that wants
  * byte-identity safety leaves them alone. Splits are all at the FIRST
  * occurrence ('://', '/', '?', '#') — the same rule the SQL mirror's
  * strpos arithmetic implements. Map-only scalar; safe in any projection.
  */
object UrlCanon {

  private val TrackingPrefixes = Seq("utm_", "fbclid=", "gclid=", "ref=")

  def canonicalize(url: String): String = {
    if (url == null) return null
    val noFrag = { val i = url.indexOf('#'); if (i >= 0) url.substring(0, i) else url }
    val si = noFrag.indexOf("://")
    if (si < 0) return noFrag // not an absolute URL: pass through untouched
    val scheme = noFrag.substring(0, si).toLowerCase
    val rest = noFrag.substring(si + 3)
    val slash = rest.indexOf('/')
    val authorityRaw = if (slash >= 0) rest.substring(0, slash) else rest
    val pathq = if (slash >= 0) rest.substring(slash) else ""
    var authority = authorityRaw.toLowerCase
    if (scheme == "http" && authority.endsWith(":80")) authority = authority.dropRight(3)
    else if (scheme == "https" && authority.endsWith(":443")) authority = authority.dropRight(4)
    val qi = pathq.indexOf('?')
    val path0 = if (qi >= 0) pathq.substring(0, qi) else pathq
    val query = if (qi >= 0) pathq.substring(qi + 1) else ""
    val kept = query.split('&').filter(p =>
      p.nonEmpty && !TrackingPrefixes.exists(p.startsWith))
    val sortedQ = kept.sorted
    val path = if (path0.length > 1 && path0.endsWith("/")) path0.dropRight(1) else path0
    scheme + "://" + authority + path +
      (if (sortedQ.nonEmpty) "?" + sortedQ.mkString("&") else "")
  }
}
