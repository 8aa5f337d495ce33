package graft.functions

import org.apache.spark.sql.{Column, functions => F}

/** Soft-404 detection — error pages served with HTTP 200 ("page not
  * found", "no longer available") that a crawl cannot distinguish by
  * status code. They are pure template noise: thousands of byte-identical
  * bodies per host that pollute dedup clusters, and zero-information text
  * that poisons quality stats. Real corpus builders gate them out between
  * extraction and dedup; the reference has no crawl tier at all (it reads
  * local files — `combined_pipeline.py` walks a directory), so this
  * operator exists only at corpus scope.
  *
  * The heuristic is the classical two-signal rule (Bar-Yossef et al.,
  * "Sick pages" WWW'04 lineage): an error PHRASE in the title is decisive
  * (titles are templated), while a phrase in the body only counts when the
  * page is SHORT (long articles legitimately discuss 404s; error bodies
  * are boilerplate-thin). Pure built-in expressions — the whole pass
  * whole-stage-codegens, zero UDF calls, map-only, and the definition is
  * mirrored verbatim in SQL by the driver oracle.
  */
object Soft404 {

  /** The phrase list, matched lowercase. Kept tiny and high-precision:
    * each is template language no content page opens with.
    */
  val Phrases: Seq[String] = Seq(
    "404", "page not found", "not be found",
    "no longer available", "does not exist")

  val BodyTokenCeiling = 80

  private def hasPhrase(c: Column): Column =
    Phrases.map(p => F.contains(F.lower(c), F.lit(p))).reduce(_ || _)

  /** Classification label for (title, text):
    * 'title' — error phrase in the title (decisive);
    * 'body'  — error phrase in a body of < [[BodyTokenCeiling]] whitespace
    *           tokens (thin template page);
    * 'ok'    — everything else.
    */
  def label(title: Column, text: Column): Column =
    F.when(hasPhrase(title), F.lit("title"))
      .when(hasPhrase(text) &&
        F.size(F.split(text, "\\s+")) < F.lit(BodyTokenCeiling), F.lit("body"))
      .otherwise(F.lit("ok"))
}
