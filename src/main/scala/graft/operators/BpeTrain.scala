package graft.operators

import graft.functions.TextStats
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge learning (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-training step of a pre-training data pipeline, word-level
  * (merges never cross word boundaries, GPT-2 style).
  *
  * Scale shape — the three classic BPE-at-scale moves, in plan form:
  *   1. The corpus collapses to its WORD VOCABULARY first (one
  *      map-side-combined `groupBy(word).count`): every later iteration
  *      touches `|vocab|` rows, not corpus tokens. At 100 TB of text the
  *      vocabulary is ~10^7 rows — executor-memory-sized, not
  *      corpus-sized.
  *   2. Each merge round is one aggregation over the vocabulary
  *      (adjacent-pair counts weighted by word frequency, partial-agg
  *      combined) finished by a 1-row `TakeOrderedAndProject` argmax —
  *      exactly ONE row reaches the driver per round, the learned merge
  *      itself (the model parameter, inherently driver-visible).
  *   3. Applying a merge is a literal string `replace` on the
  *      symbolization column — codegen'd, no UDF, no shuffle (the vocab
  *      frame keeps its partitioning across all rounds).
  *
  * Symbolization contract (shared verbatim with the SQL oracle so both
  * engines get bit-identical greedy semantics by construction): a word's
  * symbols are joined by TWO spaces with two-space sentinels at both
  * ends (`"  a  b  "`); merging (t1,t2) is the literal leftmost
  * non-overlapping replacement of `" t1  t2 "` with `" t1t2 "`. Each
  * match consumes one space of its left and right boundaries and the
  * replacement restores them, so boundaries stay exactly double and the
  * scan-forward continuation of standard `replace` IS greedy
  * left-to-right BPE application ("a a a a" + (a,a) → [aa, aa], not
  * [aa, a, a]). Words cannot contain spaces (whitespace tokenization),
  * so no false boundary matches exist.
  */
object BpeTrain {

  /** One learned merge: `rank` is 1-based order, `cnt` the weighted
    * adjacent-pair count that won the argmax (ties broken by
    * (t1, t2) ascending — a total order, engine-reproducible), and
    * `tokens_after` the total corpus token count after applying merges
    * 1..rank — pinning that the APPLICATION (greedy, overlap-aware) was
    * right, not just the choice.
    */
  final case class Merge(rank: Long, t1: String, t2: String, cnt: Long, tokens_after: Long)

  /** Lowercased whitespace word vocabulary: (w, freq). */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextStats.lowerTokensUdf(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** The two-space symbolization of a word column (see object doc). */
  private def symbolize(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("  "), regexp_replace(w, "(.)", "$1  "))

  /** Learns `numMerges` merges over the corpus and returns them as a
    * DataFrame of [[Merge]] rows ordered by rank. Throws
    * IllegalStateException if the vocabulary runs out of adjacent pairs
    * before `numMerges` rounds (every word fully merged) — a loud stop
    * beats silently returning fewer rows than the caller asked for.
    */
  def learn(spark: SparkSession, docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    import spark.implicits._
    var syms = vocab(docs, textCol).select(symbolize(col("w")).as("s"), col("freq")).cache()
    val merges = Seq.newBuilder[Merge]
    try {
      for (r <- 1 to numMerges) {
        val toks = syms.select(split(trim(col("s")), "  ").as("l"), col("freq"))
        val best = toks
          .select(col("freq"), explode(arrays_zip(
            slice(col("l"), lit(1), size(col("l")) - 1).as("t1"),
            slice(col("l"), lit(2), size(col("l")) - 1).as("t2"))).as("z"))
          .groupBy(col("z.t1").as("t1"), col("z.t2").as("t2"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("t1"), col("t2"))
          .limit(1).collect()
        if (best.isEmpty)
          throw new IllegalStateException(
            s"vocabulary exhausted adjacent pairs after ${r - 1} of $numMerges merges")
        val t1 = best(0).getString(0)
        val t2 = best(0).getString(1)
        val cnt = best(0).getLong(2)
        val next = syms
          .withColumn("s", replace(col("s"), lit(s" $t1  $t2 "), lit(s" $t1$t2 ")))
          .cache()
        val tokensAfter = next
          .agg(sum(col("freq") * size(split(trim(col("s")), "  "))))
          .as[Long].head()
        syms.unpersist()
        syms = next
        merges += Merge(r.toLong, t1, t2, cnt, tokensAfter)
      }
    } finally syms.unpersist()
    spark.createDataset(merges.result()).toDF()
  }

  /** Corpus-scale inference: per-document subword counts under a learned
    * merge list — the tokenizer-application step between BPE training
    * and sequence packing. Entirely codegen'd column arithmetic: each
    * word's symbolization goes through the k literal replaces (a fixed
    * chain of k `replace` expressions, no UDF) and the subword count is
    * the split length. Map-side until the per-doc sum.
    *
    * Documents whose text yields zero tokens are absent from the result
    * (the groupBy drops them) — callers that must keep them LEFT-join
    * back to the document table (the short-doc oracle rule).
    */
  def subwordCounts(docs: DataFrame, idCol: String, textCol: String,
                    merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(col(idCol).as("id"),
      explode(TextStats.lowerTokensUdf(col(textCol))).as("w"))
    val symN = merges.foldLeft(symbolize(col("w"))) { case (c, (t1, t2)) =>
      replace(c, lit(s" $t1  $t2 "), lit(s" $t1$t2 "))
    }
    words.select(col("id"), size(split(trim(symN), "  ")).cast("long").as("n"))
      .groupBy("id").agg(sum(col("n")).as("n_subwords"))
  }

  /** Inference path: segments one word with an already-learned merge
    * list (applied in rank order) — the same literal-replace greedy
    * semantics as training, so training-corpus words segment exactly as
    * the final training symbolization left them. Symbolizes by CODE
    * POINT (like training's `regexp_replace(w, "(.)", ...)`, which
    * matches whole code points) — iterating UTF-16 chars would split
    * surrogate pairs into half-char symbols no learned merge matches.
    */
  def segment(word: String, merges: Seq[(String, String)]): Array[String] = {
    val sb = new StringBuilder("  ")
    word.toLowerCase.codePoints().forEach { cp =>
      sb.appendAll(Character.toChars(cp)); sb.append("  "); ()
    }
    var s = sb.toString
    merges.foreach { case (t1, t2) => s = s.replace(s" $t1  $t2 ", s" $t1$t2 ") }
    s.trim.split("  ").filter(_.nonEmpty)
  }
}
