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

  /** Snapshot retention — the storage-GC step of a continuously
    * recrawled corpus: from a multi-generation snapshot table, keep the
    * latest `n` snapshots per url and mark the rest for deletion
    * (vacuum input). Recency order per url is (epoch SECOND DESC,
    * seq DESC): the caller-supplied `seqCol` is a commit/crawl sequence
    * — monotone and more authoritative than sub-second clock skew, so
    * it is deliberately the intra-second authority, and it makes the
    * cut a total order. (url, ts-second, seq) must identify a snapshot
    * uniquely.
    *
    * Scale shape: the per-url cut is the bounded mergeable top-k
    * aggregator over a PACKED (second, seq) key — a `row_number() over
    * (partition by url)` would sort a hot url's entire snapshot history
    * in one task. Packing bounds (documented-limit pattern): epoch
    * seconds < 2^41 (~year 71000), seq < 2^21 per commit space;
    * out-of-range inputs fail loudly, never mis-sort.
    */
  def retentionPlan(snapshots: DataFrame, urlCol: String, tsCol: String,
                    seqCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val tsSec = F.expr(s"unix_micros(CAST($tsCol AS TIMESTAMP)) div 1000000")
    val maxSeq = 1L << 21
    val key = F.when(tsSec < 0 || tsSec >= (1L << 41) ||
        F.col(seqCol) < 0 || F.col(seqCol) >= maxSeq,
        F.raise_error(F.lit("retentionPlan: ts/seq outside the packed range")))
      .otherwise(tsSec * maxSeq + F.col(seqCol))
    val topk = F.udaf(CrawlBudget.TopKUrls(n),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]())
    val keyed = snapshots.select(F.col(urlCol).as("url"), tsSec.as("ts_sec"),
      F.col(seqCol).cast("long").as("seq"), key.as("__k"))
    val kept = keyed.groupBy(F.col("url"))
      .agg(topk(F.col("__k"), F.col("__k")).as("sel"))
      .select(F.col("url"), F.explode(F.col("sel")).as("s"))
      .select(F.col("url"), F.col("s._1").as("__k"), F.lit(true).as("retained"))
    keyed.join(kept, Seq("url", "__k"), "left")
      .select(F.col("url"), F.col("ts_sec"), F.col("seq"),
        F.coalesce(F.col("retained"), F.lit(false)).as("retained"))
  }

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
