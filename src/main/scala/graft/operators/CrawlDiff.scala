package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Crawl-snapshot diffing — the recrawl primitive: given two crawl
  * generations of the same url space, classify every url as added,
  * removed, changed, or unchanged so the pipeline re-extracts ONLY the
  * changed/added slice (the incremental path that makes a 10^12-page
  * recrawl affordable; the reference re-processes everything, every
  * time).
  *
  * Scale shape: both sides are projected to (key, digest) BEFORE the
  * join — page bodies never enter the shuffle; a full-outer hash join on
  * the url key is the whole data movement (at warehouse scale the two
  * snapshots share a bucketed layout on url and even that exchange
  * disappears, same argument as ExtractJob.resumeBucketed). The digest
  * column is caller-supplied so the same operator runs on md5 (oracle
  * parity), xxhash64 (cheapest), or a stored content checksum.
  */
object CrawlDiff {

  /** Per-key diff status between two snapshots. Keys must be unique per
    * side (dedup upstream — canonical urls). Returns (key, status) with
    * status in {added, removed, changed, unchanged}.
    */
  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCol: String,
      digestCol: String): DataFrame = {
    val o = oldSnap.select(F.col(keyCol).as("key"), F.col(digestCol).as("old_digest"))
    val n = newSnap.select(F.col(keyCol).as("key"), F.col(digestCol).as("new_digest"))
    o.join(n, Seq("key"), "full_outer")
      .select(F.col("key"),
        F.when(F.col("old_digest").isNull, F.lit("added"))
          .when(F.col("new_digest").isNull, F.lit("removed"))
          .when(F.col("old_digest") === F.col("new_digest"), F.lit("unchanged"))
          .otherwise(F.lit("changed"))
          .as("status"))
  }

  /** The work list a recrawl extraction actually runs: added + changed
    * keys joined back to the NEW snapshot's rows. One extra join against
    * the (small) diff output; the removed/unchanged majority never flows.
    */
  def reExtractSet(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCol: String,
      digestCol: String): DataFrame = {
    val work = diff(oldSnap, newSnap, keyCol, digestCol)
      .filter(F.col("status").isin("added", "changed"))
      .select(F.col("key"))
    newSnap.join(work, newSnap(keyCol) === work("key")).drop("key")
  }
}
