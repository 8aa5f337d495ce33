package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Redirect-chain resolution — collapse crawl aliases (301/308 chains,
  * shortlinks, mirror hops) to their terminal canonical target before
  * dedup/frontier accounting. The redirect map is a FUNCTIONAL graph (one
  * outgoing edge per src), so resolution uses pointer doubling: each round
  * composes the mapping with itself, covering 2^r hops after r rounds —
  * ceil(log2(longest chain)) distributed joins instead of chain-length
  * iterations (a 1000-hop spam chain costs 10 rounds, not 1000). Hop
  * counts compose additively through the doubling, so the output carries
  * the true chain length without a per-hop walk.
  *
  * Cycles (a → b → a) never converge under doubling; after `maxIter`
  * rounds the operator THROWS rather than returning silently-partial
  * targets — a cycle in a redirect map is data corruption upstream, not a
  * state to paper over. Same lineage-truncation discipline as
  * [[Dedup.connectedComponents]]: localCheckpoint every 5 rounds keeps the
  * iterated plan flat.
  */
object Redirects {

  /** Resolve every `srcCol` to its terminal target. Input: one row per
    * redirect edge (src, dst); a url with no outgoing edge is terminal.
    * Output: (src, final, n_hops) for every src in the input — final has
    * no outgoing edge, n_hops is the true chain length.
    */
  def resolve(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 16
  ): DataFrame = {
    // RUNTIME-enforce the functional-graph contract (one outgoing edge per
    // src, no duplicate edges): a src with two targets would fan out
    // multiplicatively through every doubling join and emit contradictory
    // (src, final) rows. The enforcing aggregation also co-partitions f on
    // src for the joins below.
    var f = edges
      .select(F.col(srcCol).as("src"), F.col(dstCol).as("tgt"))
      .groupBy("src")
      .agg(F.max("tgt").as("tgt"), F.count(F.lit(1)).as("__n"))
      .select(
        F.col("src"),
        F.when(F.col("__n") > 1, F.raise_error(F.concat(
          F.lit("Redirects.resolve: multiple outgoing edges for src "),
          F.col("src").cast("string"))))
          .otherwise(F.col("tgt")).as("tgt"))
      .withColumn("hops", F.lit(1L))
      .cache()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val hop = f.select(
        F.col("src").as("h_src"), F.col("tgt").as("h_tgt"), F.col("hops").as("h_hops"))
      val joined = f
        .join(hop, f("tgt") === hop("h_src"), "left")
        .select(
          F.col("src"),
          F.coalesce(F.col("h_tgt"), F.col("tgt")).as("tgt"),
          (F.col("hops") + F.coalesce(F.col("h_hops"), F.lit(0L))).as("hops"),
          F.col("h_src").isNotNull.as("__advanced"))
        .cache()
      // converged means every tgt is TERMINAL (no outgoing edge matched) —
      // NOT "tgt stopped changing": a cycle whose length divides 2^r maps
      // each node back to itself with an unchanged tgt, which a
      // changed-count test would silently accept as converged.
      val advancing = joined.filter(F.col("__advanced")).count()
      f.unpersist()
      var next = joined.drop("__advanced")
      if ((iter + 1) % 5 == 0) {
        val flat = next.localCheckpoint(true)
        joined.unpersist()
        next = flat
      }
      f = next
      converged = advancing == 0
      iter += 1
    }
    if (!converged) {
      f.unpersist()
      throw new IllegalStateException(
        s"redirect resolution did not saturate in $maxIter doubling rounds " +
          s"(handles acyclic chains up to 2^${maxIter - 1} hops): the map " +
          "contains a cycle, or a legitimately longer chain — raise maxIter " +
          "for the latter")
    }
    f.select(F.col("src"), F.col("tgt").as("final"), F.col("hops").as("n_hops"))
  }
}
