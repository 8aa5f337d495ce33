package graft.operators

import graft.functions.TextStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training-data pipelines: flag (or drop)
  * training documents that share a word k-gram with any document of an
  * evaluation/benchmark set — the n-gram overlap rule used by the GPT-3 /
  * PaLM / Gopher data pipelines (Brown et al. 2020 appendix C uses 13-gram
  * collisions; the gram size is a parameter here because the right k
  * depends on corpus token entropy).
  *
  * Shuffle discipline at 100 TB:
  *  - The eval side is benchmark-sized (10^4-10^6 docs), so its distinct
  *    gram set broadcasts (`broadcastEval = true`, the default): the train
  *    corpus is then decontaminated in a single map-side pass — ZERO
  *    shuffle of the training data. This is the production shape.
  *  - If the eval set ever outgrows the broadcast budget, set
  *    `broadcastEval = false`: the join becomes a standard shuffled hash
  *    join on the gram key, still never shuffling full documents (only
  *    (id, gram) pairs — and with `hashGrams = true` each gram travels as
  *    one xxhash64 long instead of a string, at a ~2^-64 per-pair false
  *    positive risk, which a decontamination *filter* tolerates; keep
  *    string grams when the output must be oracle-exact).
  *
  * The reference pipeline has no decontamination stage; this belongs to the
  * LLM-training-data tier the builder brief adds on top of SURVEY §2.
  */
object Decontaminate {

  val gramsUdf: UserDefinedFunction =
    udf((text: String, k: Int) =>
      // a null text doc is gram-free, not a job-failing NPE
      if (text == null) Array.empty[String] else TextStats.wordGrams(text, k))

  private def gramRows(df: DataFrame, idCol: String, textCol: String, k: Int,
                       hashGrams: Boolean): DataFrame = {
    val g = df.select(col(idCol).as("id"), explode(gramsUdf(col(textCol), lit(k))).as("g"))
    if (hashGrams) g.select(col("id"), xxhash64(col("g")).as("g")) else g
  }

  /** Per-train-document contamination counts: one row `(id, n_hit)` per
    * CONTAMINATED train doc, `n_hit` = number of distinct k-grams the doc
    * shares with the union of eval-doc grams. Clean docs are absent (left
    * join at the call site, or use [[dropContaminated]]).
    */
  def hits(train: DataFrame, evalSet: DataFrame, idCol: String, textCol: String,
           k: Int = 4, broadcastEval: Boolean = true,
           hashGrams: Boolean = false): DataFrame = {
    val evalG0 = gramRows(evalSet, idCol, textCol, k, hashGrams).select("g").distinct()
    val evalG = if (broadcastEval) broadcast(evalG0) else evalG0
    gramRows(train, idCol, textCol, k, hashGrams)
      .join(evalG, "g")
      .groupBy("id")
      .agg(count(lit(1)).as("n_hit"))
  }

  /** The keep stage: train rows with NO k-gram overlap with the eval set
    * (left_anti on the per-doc hit set — the doc row, not its grams, is
    * what flows on).
    */
  def dropContaminated(train: DataFrame, evalSet: DataFrame, idCol: String,
                       textCol: String, k: Int = 4, broadcastEval: Boolean = true,
                       hashGrams: Boolean = true): DataFrame = {
    val h = hits(train, evalSet, idCol, textCol, k, broadcastEval, hashGrams)
    // no broadcast hint: the contaminated-id set is usually tiny (AQE will
    // broadcast it) but is NOT bounded — benchmark text widespread in the
    // crawl can flag a large corpus fraction, where a forced broadcast
    // would kill the job a plain anti-join survives
    train.join(h.select(col("id").as("__contam_id")),
      col(idCol) === col("__contam_id"), "left_anti")
  }

  /** The sketch path for eval sets past the exact-broadcast budget: the
    * eval gram set is compressed into a Bloom filter (bits ~ 1.44·n·log2(1/fpp)
    * — a 10^9-gram eval set at fpp 10^-6 is ~3.6 GB of bits vs hundreds of
    * GB of strings) and the train corpus is gated in one map-only pass,
    * still ZERO shuffle of training data.
    *
    * The error is ONE-SIDED by construction: a Bloom filter has no false
    * negatives, so every truly-contaminated doc is dropped — the filter
    * only ever over-drops (a clean doc whose gram false-positives). Per-doc
    * over-drop odds are ~grams_per_doc·fpp, so pick fpp ≪ 1/grams_per_doc
    * (the default 10^-6 costs ~0.02% of a 200-gram-doc corpus). The
    * kept-set ⊆ exact-kept-set containment is what the driver oracle pins
    * (p_decontam_bloom); the over-drop rate is spec-bounded.
    */
  def dropContaminatedBloom(train: DataFrame, evalSet: DataFrame, idCol: String,
                            textCol: String, k: Int = 4,
                            fpp: Double = 1e-6): DataFrame = {
    val evalGrams = gramRows(evalSet, idCol, textCol, k, hashGrams = false)
      .select("g").distinct().cache()
    // one bounded pass over the (benchmark-sized) eval grams to size the
    // filter; the cache keeps the sizing count and the filter build from
    // recomputing the distinct shuffle; the train corpus is never counted
    val n = math.max(1L, evalGrams.count())
    val bf = try evalGrams.stat.bloomFilter("g", n, fpp)
             finally evalGrams.unpersist()
    val bc = train.sparkSession.sparkContext.broadcast(bf)
    val contaminated = udf((t: String) =>
      t != null && TextStats.wordGrams(t, k).exists(bc.value.mightContainString))
    train.filter(!contaminated(col(textCol)))
  }
}
