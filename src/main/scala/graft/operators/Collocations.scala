package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Collocation mining — pointwise-mutual-information ranking of adjacent
  * word pairs (Church & Hanks 1990), the corpus-statistics tool behind
  * phrase vocabulary induction and multi-word-expression detection in a
  * pre-training pipeline.
  *
  * Engine-exact scoring: classic PMI is log(p(a,b)/(p(a)p(b))); the
  * log is monotone, so ranking by the RATIO is ranking by PMI, and the
  * ratio is computed in SCALED INTEGER arithmetic —
  * `score = (c(a,b) · N · scale) div (c(a) · c(b))` with N the unigram
  * total — making every score a deterministic BIGINT the SQL mirror
  * reproduces bit-for-bit (the same log-free discipline as BM25).
  * Overflow bound: c(a,b) · N · scale must stay under 2^63 — callers
  * at full corpus scale drop `scale` or pre-divide N; ANSI mode makes a
  * violation loud.
  *
  * Scale shape: one tokenize pass feeds both the unigram and the
  * adjacent-bigram counts (map-side-combined groupBys whose width is
  * vocabulary- not corpus-sized); the minCount gate prunes the long
  * tail BEFORE the two marginal joins (broadcast-sized after pruning);
  * top-k goes through orderBy+limit = TakeOrderedAndProject.
  */
object Collocations {

  /** Top-`topK` adjacent pairs by log-free PMI among pairs with
    * count >= `minCount`: (w1, w2, n_pair, n_w1, n_w2, score), ordered
    * by (score DESC, w1, w2) — a total order.
    */
  def pmiPairs(docs: DataFrame, textCol: String, minCount: Long, topK: Int,
               scale: Long = 1000000L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    // cached: the unigram and bigram subtrees both consume the tokenize
    // pass (the corpus's most expensive step), and uni feeds three
    // consumers — without the cache the UDF would re-run per subtree
    val toks = docs.select(graft.functions.TextStats.lowerTokensUdf(F.col(textCol)).as("l"))
      .cache()
    val uni = toks.select(F.explode(F.col("l")).as("w"))
      .groupBy("w").agg(F.count(F.lit(1)).as("c"))
    val pairs = toks
      // the size guard keeps slice lengths >= 0: an empty or one-token
      // document (null/blank text included) has no adjacent pairs, and
      // slice with length -1 throws rather than returning empty
      .filter(F.size(F.col("l")) >= 2)
      .select(F.explode(F.arrays_zip(
        F.slice(F.col("l"), F.lit(1), F.size(F.col("l")) - 1).as("w1"),
        F.slice(F.col("l"), F.lit(2), F.size(F.col("l")) - 1).as("w2"))).as("z"))
      .groupBy(F.col("z.w1").as("w1"), F.col("z.w2").as("w2"))
      .agg(F.count(F.lit(1)).as("n_pair"))
      .filter(F.col("n_pair") >= minCount)
    val n = uni.agg(F.sum(F.col("c")).as("n_total"))
    pairs
      .join(uni.select(F.col("w").as("w1"), F.col("c").as("n_w1")), "w1")
      .join(uni.select(F.col("w").as("w2"), F.col("c").as("n_w2")), "w2")
      .crossJoin(F.broadcast(n))
      .select(F.col("w1"), F.col("w2"), F.col("n_pair"), F.col("n_w1"), F.col("n_w2"),
        F.expr(s"(n_pair * n_total * ${scale}L) div (n_w1 * n_w2)").as("score"))
      .orderBy(F.col("score").desc, F.col("w1"), F.col("w2"))
      .limit(topK)
  }
}
