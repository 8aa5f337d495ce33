package graft.functions

import org.apache.spark.sql.{Column, functions => F}

/** Publish-date extraction from URL paths — news/blog CMSes encode the
  * article date in the url (`/2026/08/20/slug` or `post-2026-08-20-slug`),
  * and at crawl scale that hint is available for every page WITHOUT
  * parsing the body (trafilatura-style metadata mining uses exactly this
  * signal for recency-weighted dedup and corpus cutoffs). Pure built-in
  * expressions — regexp_extract + validation — so the whole pass
  * whole-stage-codegens, map-only, zero UDF calls.
  *
  * Grammar, each arm unit-tested:
  *   - slash form: `/YYYY/MM/DD/` (century 19|20, zero-padded month/day);
  *   - dash form: `YYYY-MM-DD` delimited by `/`, `-`, `_` or string edge;
  *   - slash form wins when both appear;
  *   - candidates with month outside 01-12 or day outside 01-31 are
  *     REJECTED (a `/2026/13/40/` calendar-trap segment is not a date);
  *   - result is the ISO `YYYY-MM-DD` string, null when nothing valid.
  */
object UrlDates {

  private val SlashRe = "/((?:19|20)\\d{2})/(\\d{2})/(\\d{2})/"
  private val DashRe = "(?:^|[/_-])((?:19|20)\\d{2})-(\\d{2})-(\\d{2})(?:$|[/_.-])"

  /** ISO publish-date string mined from the url path, or null. */
  def publishDate(url: Column): Column = {
    def pick(re: String, g: Int) = F.regexp_extract(url, re, g)
    val (sy, sm, sd) = (pick(SlashRe, 1), pick(SlashRe, 2), pick(SlashRe, 3))
    val (dy, dm, dd) = (pick(DashRe, 1), pick(DashRe, 2), pick(DashRe, 3))
    val useSlash = sy =!= ""
    val y = F.when(useSlash, sy).otherwise(dy)
    val m = F.when(useSlash, sm).otherwise(dm)
    val d = F.when(useSlash, sd).otherwise(dd)
    // Column.try_cast: the no-match arm carries "" and ANSI cast would throw
    val valid = y =!= "" &&
      m.try_cast("int").between(1, 12) && d.try_cast("int").between(1, 31)
    F.when(valid, F.concat_ws("-", y, m, d))
  }

  /** Calendar-validated `YYYY-MM-DD` PREFIX of a string (full ISO
    * timestamps like `2026-01-15T10:00:00Z` pass through as their date
    * part), null when absent or calendar-invalid — the same century and
    * range gates as the url grammar, same codegen'd built-ins.
    */
  def isoDatePrefix(s: Column): Column = {
    val re = "^((?:19|20)\\d{2})-(\\d{2})-(\\d{2})(?:$|[T ])"
    val y = F.regexp_extract(s, re, 1)
    val m = F.regexp_extract(s, re, 2)
    val d = F.regexp_extract(s, re, 3)
    val valid = y =!= "" &&
      m.try_cast("int").between(1, 12) && d.try_cast("int").between(1, 31)
    F.when(valid, F.concat_ws("-", y, m, d))
  }

  /** Publish-date FUSION across the three provenance layers a crawl sees,
    * strongest first: the page's own declaration
    * (`article:published_time` meta), the first in-content
    * `<time datetime>` element, then the url-path hint. Returns
    * `struct(date, source)` with source ∈ declared|time|url|none — the
    * source column is what downstream recency weighting trusts
    * differently (a declared date is editorial, a url date is CMS
    * convention). Every layer is validated through the SAME calendar
    * gate, so an invalid declaration (a `2026-13-40` trap) falls through
    * to the next layer instead of poisoning the fusion; pure built-in
    * expressions, map-only, zero UDF.
    */
  def publishDateFused(declared: Column, timeEl: Column, url: Column): Column = {
    val dd = isoDatePrefix(declared)
    val dt = isoDatePrefix(timeEl)
    val du = publishDate(url)
    F.struct(
      F.coalesce(dd, dt, du).as("date"),
      F.when(dd.isNotNull, "declared")
        .when(dt.isNotNull, "time")
        .when(du.isNotNull, "url")
        .otherwise("none").as("source"))
  }
}
