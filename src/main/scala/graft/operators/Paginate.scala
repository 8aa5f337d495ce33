package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Pagination stitching — reassemble multi-page articles split across
  * `rel="next"` chains (news articles, forum threads, slideshows) into one
  * logical document before dedup/quality/tokenization, so a 12-page article
  * counts once with its full text rather than as 12 fragments that each
  * fail a length gate. The reference processes one file at a time and has
  * no cross-document pass at all (`combined_pipeline.py` walks single
  * files); chain reassembly only exists at corpus scope, which is exactly
  * the tier this engine adds.
  *
  * The `rel=next` graph is functional in BOTH directions (each page names
  * at most one successor, and is named by at most one predecessor — a page
  * with two "page 2"s is template breakage, not pagination), so chain
  * membership resolves by pointer doubling over the REVERSED edges:
  * [[Redirects.resolve]] on (next → page) maps every non-head page to its
  * chain HEAD with its 1-based distance in ceil(log2(longest chain))
  * distributed joins — a 1000-page trap chain costs 10 rounds, not 1000.
  * Both functional contracts are runtime-ENFORCED (resolve throws on a src
  * with two targets; reversing makes that check cover in-degree too), and
  * a `rel=next` cycle fails loudly through resolve's saturation guard.
  *
  * Shuffle shape at 10^12 pages: edges are a tiny fraction of the corpus
  * (only paginated pages carry rel=next), so the doubling joins and the
  * head-keyed groupBy shuffle edge-sized data; the one corpus-sized
  * exchange is the final groupBy on head — the same key a partition-level
  * `repartition(head)` layout would already co-locate. Per-chain state is
  * O(chain length), bounded by maxIter's 2^r reach, never corpus-sized.
  */
object Paginate {

  /** Stitch every chain into one row. Input: `pages` with (urlCol,
    * textCol); `edges` with one row per rel=next link (srcCol → dstCol),
    * both urls present in `pages` (dangling next targets should be
    * semi-joined away upstream — an unfetched tail page is a crawl gap,
    * not a stitch input). Output: one row per chain —
    * (head = urlCol of page 1, n_pages, text = texts in page order joined
    * by `sep`). Standalone pages (no edges) pass through as 1-page chains.
    */
  def stitch(
      pages: DataFrame,
      edges: DataFrame,
      urlCol: String,
      textCol: String,
      srcCol: String = "src",
      dstCol: String = "dst",
      sep: String = " ",
      maxIter: Int = 16
  ): DataFrame = {
    // Reversed edges: dst → src is ALSO functional (in-degree ≤ 1), and
    // resolving it sends every successor page to its chain head, with
    // n_hops = its 0-based page position. resolve() runtime-enforces the
    // one-target-per-src contract on the reversed graph = the
    // one-predecessor-per-page contract here. The FORWARD contract (one
    // rel=next successor per page) is enforced right here while building
    // the reversal — without it a page with two successors would silently
    // stitch both branches into one chain with duplicate pos values.
    val rev = edges
      .select(F.col(srcCol).as("fsrc"), F.col(dstCol).as("fdst"))
      .groupBy("fsrc")
      .agg(F.max("fdst").as("fdst"), F.count(F.lit(1)).as("__n"))
      .select(
        F.when(F.col("__n") > 1, F.raise_error(F.concat(
          F.lit("Paginate.stitch: multiple rel=next successors for page "),
          F.col("fsrc").cast("string"))))
          .otherwise(F.col("fdst")).as("src"),
        F.col("fsrc").as("dst"))
    val members = Redirects.resolve(rev, "src", "dst", maxIter)
      .select(F.col("src").as("__url"), F.col("final").as("head"),
        F.col("n_hops").as("pos"))
    pages
      .join(members, F.col(urlCol) === F.col("__url"), "left")
      .select(
        F.coalesce(F.col("head"), F.col(urlCol)).as("head"),
        F.coalesce(F.col("pos"), F.lit(0L)).as("pos"),
        F.col(textCol).as("__text"))
      .groupBy("head")
      .agg(
        F.count(F.lit(1)).as("n_pages"),
        F.array_join(
          F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("__text")))),
            x => x.getField("__text")),
          sep).as("text"))
  }
}
