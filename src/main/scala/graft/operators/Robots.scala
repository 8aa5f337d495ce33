package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions.{col, udf}

import scala.collection.mutable.ArrayBuffer

/** Robots-exclusion (RFC 9309) compliance filtering — the crawl-side
  * politeness gate a Common-Crawl-style corpus applies before a page may
  * enter the corpus at all. Reference analog: the reference pipeline
  * assumes its inputs were fetched compliantly; at 10^12-document scale
  * compliance becomes a join, not a fetch-time check, because robots
  * policies change and corpora are re-filtered retroactively.
  *
  * Semantics implemented (the RFC 9309 core):
  *   - groups = runs of consecutive `User-agent:` lines followed by
  *     `Allow:`/`Disallow:` rules; ALL groups naming our agent
  *     (case-insensitive product token match) are combined; if none
  *     name it, the `*` groups apply; no group at all → allow.
  *   - longest-match wins across the combined rules (match length =
  *     octet length of the pattern, per RFC); on a tie, Allow wins.
  *   - empty-path rules ("Disallow:" alone = allow-all) contribute
  *     nothing; unmatched paths default to allowed.
  *   - `*` wildcards (greedy segment scan) and `$` end-anchors are
  *     honored in the matcher; match length stays the pattern's octet
  *     length so wildcard rules rank exactly as the RFC orders them.
  *
  * Scale shape: robots bodies parse ONCE per host into a bounded rules
  * array (map-only over the robots table — one row per host, ~10^8 rows
  * at web scale), then ONE equi-join on host attaches the array to
  * pages and a per-row scan of ≤ MaxRules entries decides the page.
  * No row explosion (a rules×pages prefix join would multiply the
  * pages table by rules-per-host), no second winner-pick shuffle (the
  * longest-match argmax runs inside the row scan). The robots side
  * broadcasts when small; at full host cardinality it shuffles on
  * host — the same key the crawl is naturally partitioned by.
  * Adversarial robots bodies are bounded twice: parse reads at most
  * MaxBodyBytes and keeps at most MaxRules rules (the caps crawlers
  * like Googlebot document: 500 KiB fetch cap).
  */
object Robots {

  /** Hard cap on rules kept per host (bounds the per-row scan and the
    * joined array's memory); RFC allows ignoring the excess.
    */
  val MaxRules = 1000

  /** Parse at most this many chars of a robots body (500 KiB cap). */
  val MaxBodyBytes = 512 * 1024

  /** One access rule: allow/deny + the path pattern it applies to. */
  final case class Rule(allow: Boolean, pattern: String)

  /** Parse a robots.txt body into the combined rule list that governs
    * `agent` (case-insensitive), per the group-selection rules above.
    * Null/garbage-safe: unparseable lines are skipped, never thrown.
    */
  def parse(body: String, agent: String): Seq[Rule] = {
    if (body == null) return Seq.empty
    val text = if (body.length > MaxBodyBytes) body.substring(0, MaxBodyBytes) else body
    val agentLc = agent.toLowerCase

    // group := (uaTokens, rules); built in one pass over the lines
    final case class Group(uas: ArrayBuffer[String], rules: ArrayBuffer[Rule])
    val groups = ArrayBuffer.empty[Group]
    var inUaRun = false // consecutive UA lines extend the same group
    for (raw <- text.linesIterator) {
      val line = { val h = raw.indexOf('#'); (if (h >= 0) raw.substring(0, h) else raw).trim }
      val ci = line.indexOf(':')
      if (ci > 0) {
        val key = line.substring(0, ci).trim.toLowerCase
        val value = line.substring(ci + 1).trim
        key match {
          case "user-agent" =>
            if (!inUaRun || groups.isEmpty) {
              groups += Group(ArrayBuffer(value.toLowerCase), ArrayBuffer.empty)
            } else groups.last.uas += value.toLowerCase
            inUaRun = true
          case "allow" | "disallow" =>
            inUaRun = false
            if (groups.nonEmpty && value.nonEmpty && groups.last.rules.length < MaxRules)
              groups.last.rules += Rule(allow = key == "allow", pattern = value)
          case _ => inUaRun = false // crawl-delay, sitemap, unknown keys
        }
      }
    }

    val named = groups.filter(_.uas.contains(agentLc))
    val chosen = if (named.nonEmpty) named else groups.filter(_.uas.contains("*"))
    chosen.iterator.flatMap(_.rules).take(MaxRules).toSeq
  }

  /** `Sitemap:` directives of a robots body — RFC 9309 §2.3 non-group
    * records: they apply regardless of user-agent and may appear anywhere,
    * so this walk ignores group structure entirely. Document order,
    * duplicates dropped, capped; the values feed
    * [[graft.sources.Sitemap]] frontier ingestion — robots.txt is how a
    * crawler DISCOVERS a site's sitemaps in the first place.
    */
  def sitemaps(body: String): Seq[String] = {
    if (body == null) return Seq.empty
    val text = if (body.length > MaxBodyBytes) body.substring(0, MaxBodyBytes) else body
    val out = ArrayBuffer.empty[String]
    for (raw <- text.linesIterator if out.length < 100) {
      val line = { val h = raw.indexOf('#'); (if (h >= 0) raw.substring(0, h) else raw).trim }
      val ci = line.indexOf(':')
      if (ci > 0 && line.substring(0, ci).trim.equalsIgnoreCase("sitemap")) {
        val v = line.substring(ci + 1).trim
        if (v.nonEmpty && !out.contains(v)) out += v
      }
    }
    out.toSeq
  }

  /** `Crawl-delay` for `agent`, seconds — a de-facto extension (not in
    * RFC 9309 but honored by major crawlers): group-scoped like
    * allow/disallow, named-agent groups beat `*` groups, first valid
    * value in the chosen groups wins, non-numeric and negative values
    * ignored. Feeds [[CrawlBudget]]-style politeness scheduling.
    */
  def crawlDelay(body: String, agent: String): Option[Int] = {
    if (body == null) return None
    val text = if (body.length > MaxBodyBytes) body.substring(0, MaxBodyBytes) else body
    val agentLc = agent.toLowerCase
    final case class G(uas: ArrayBuffer[String], var delay: Option[Int])
    val groups = ArrayBuffer.empty[G]
    var inUaRun = false
    for (raw <- text.linesIterator) {
      val line = { val h = raw.indexOf('#'); (if (h >= 0) raw.substring(0, h) else raw).trim }
      val ci = line.indexOf(':')
      if (ci > 0) {
        val key = line.substring(0, ci).trim.toLowerCase
        val value = line.substring(ci + 1).trim
        key match {
          case "user-agent" =>
            if (!inUaRun || groups.isEmpty) groups += G(ArrayBuffer(value.toLowerCase), None)
            else groups.last.uas += value.toLowerCase
            inUaRun = true
          case "crawl-delay" =>
            inUaRun = false
            if (groups.nonEmpty && groups.last.delay.isEmpty)
              // Fractional delays ("0.5") are common in the wild: parse via
              // Double and round UP (politeness errs slow). Keep strictly
              // positive values only — a legal "Crawl-delay: 0" means "no
              // delay" and returning Some(0) would hand callers that divide
              // a window by the delay (p_polite_budget's cap = 60/delay) a
              // division by zero.
              groups.last.delay = value.toIntOption
                .orElse(value.toDoubleOption.filter(d => !d.isNaN && !d.isInfinite).map(d => math.ceil(d).toInt))
                .filter(_ > 0)
          case _ => inUaRun = false
        }
      }
    }
    val named = groups.filter(_.uas.contains(agentLc)).flatMap(_.delay)
    if (named.nonEmpty) named.headOption
    else groups.filter(_.uas.contains("*")).flatMap(_.delay).headOption
  }

  /** True iff `path` matches `pattern` ('*' = any run of chars, a
    * trailing '$' anchors the end). Greedy leftmost scan is exact for
    * the interior segments (they only need SOME placement); the last
    * segment is placed flush against the end when anchored.
    */
  def matches(pattern: String, path: String): Boolean = {
    val (pat, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true) else (pattern, false)
    val segs = pat.split("\\*", -1)
    if (!path.startsWith(segs.head)) return false
    var pos = segs.head.length
    var i = 1
    while (i < segs.length - 1) {
      val at = path.indexOf(segs(i), pos)
      if (at < 0) return false
      pos = at + segs(i).length
      i += 1
    }
    if (segs.length == 1) !anchored || path.length == pos
    else {
      val last = segs.last
      if (last.isEmpty) true // trailing '*' swallows the rest either way
      else if (anchored) path.endsWith(last) && path.length - last.length >= pos
      else path.indexOf(last, pos) >= 0
    }
  }

  /** Longest-match verdict for one path: allowed when no rule matches,
    * else the matching rule with the greatest pattern length decides
    * (ties go to Allow).
    */
  def evaluate(rules: Seq[Rule], path: String): Boolean = {
    if (path == null) return true
    var bestLen = -1
    var bestAllow = true
    for (r <- rules if r.pattern.length >= bestLen) {
      if (matches(r.pattern, path)) {
        val len = r.pattern.length
        if (len > bestLen || (len == bestLen && r.allow)) {
          bestLen = len; bestAllow = r.allow
        }
      }
    }
    bestAllow
  }

  /** Filter `pages` to the rows robots policy allows for `agent`.
    * `robots` carries one row per host: (hostCol, bodyCol with the raw
    * robots.txt text). Hosts absent from `robots` default to allowed.
    */
  def allowedPages(
      pages: DataFrame,
      robots: DataFrame,
      hostCol: String,
      pathCol: String,
      bodyCol: String,
      agent: String): DataFrame = {
    val parseUdf = udf((body: String) => parse(body, agent).map(r => (r.allow, r.pattern)))
    val rules = robots.select(col(hostCol), parseUdf(col(bodyCol)).as("__rules"))
    val verdict = udf((rules: scala.collection.Seq[(Boolean, String)], path: String) =>
      rules == null || evaluate(rules.map { case (a, p) => Rule(a, p) }.toSeq, path))
    pages
      .join(rules, Seq(hostCol), "left")
      .filter(verdict(col("__rules"), col(pathCol)))
      .drop("__rules")
  }
}
