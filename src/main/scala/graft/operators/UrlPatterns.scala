package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-template mining — the crawler-trap detector: calendar pages,
  * session-id links, and faceted-search grids generate unbounded URL
  * families that differ only in numeric/value segments, and a frontier
  * that treats each as a fresh page crawls forever (the classic
  * spider-trap taxonomy; Heydon & Najork 1999 "Mercator", §"traps").
  * Grouping by (host, template) collapses each family to one row: a
  * template backed by many distinct URLs is a trap candidate, budgeted
  * or blocked at the frontier rather than after the fetch.
  *
  * Templatization is three anchored/global regex rewrites (scheme
  * strip, digit-run -> N, query-value -> V) — pure codegen'd string
  * expressions, no UDF, map-only; the mine is ONE groupBy on
  * (host, template). Both steps are engine-portable (the same rewrites
  * run verbatim in the SQL mirror).
  *
  * Scale shape: the groupBy partially aggregates map-side, so each task
  * emits one partial per distinct template it sees — hot templates (the
  * traps themselves, by definition the heaviest keys) collapse before
  * the shuffle; the shuffled width is the number of DISTINCT templates,
  * not URLs. count(DISTINCT url) adds the standard two-phase expansion;
  * swap it for approx_count_distinct at 10^12 if exactness is not
  * needed at the tail.
  */
object UrlPatterns {

  /** Host part of a URL (scheme stripped, first path segment boundary). */
  def host(url: Column): Column =
    regexp_replace(regexp_replace(url, "^[a-z]+://", ""), "/.*", "")

  /** Path+query template: scheme+host dropped, digit runs -> N, query
    * values -> V. "/cal/2024/3/17?session=83aa" -> "/cal/N/N/N?session=V".
    */
  def template(url: Column): Column = {
    val path = regexp_replace(regexp_replace(url, "^[a-z]+://", ""), "^[^/]*", "")
    regexp_replace(regexp_replace(path, "[0-9]+", "N"), "=[^&#]*", "=V")
  }

  /** One row per (host, template): n_urls, n_distinct, and is_trap =
    * (n_distinct >= minDistinct AND the template has a variable slot).
    * A template with no N/V slot is a single concrete page no matter how
    * often it is seen (re-crawls, not a trap).
    */
  def mineTraps(pages: DataFrame, urlCol: String, minDistinct: Long): DataFrame = {
    require(minDistinct >= 2, s"minDistinct must be >= 2, got $minDistinct")
    pages
      .select(host(col(urlCol)).as("host"), template(col(urlCol)).as("template"),
        col(urlCol).as("u"))
      .groupBy("host", "template")
      .agg(count(lit(1)).as("n_urls"), countDistinct(col("u")).as("n_distinct"))
      .withColumn("is_trap",
        (col("n_distinct") >= minDistinct &&
          (col("template").contains("N") || col("template").contains("=V")))
          .cast("int").cast("long"))
  }
}
