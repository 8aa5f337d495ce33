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

  /** Fuzzy decontamination: flag train documents NEAR-DUPLICATE to an
    * eval/benchmark document (the contamination the exact k-gram rule
    * misses once a benchmark answer is lightly paraphrased or re-wrapped —
    * the reason Llama/GPT-4-class reports decontaminate fuzzily on top of
    * the n-gram rule). Semantics: all (train, eval) pairs with true
    * distinct-`shingleK`-gram Jaccard >= `minJaccard` that share a MinHash
    * band bucket — with the default 16x2 band geometry the per-pair miss
    * probability at j = 0.8 is < 1e-7, so on verified corpora the output
    * EQUALS the exact cross-set Jaccard definition (what the driver oracle
    * checks).
    *
    * Shuffle discipline at 100 TB — the decontamination-specific shape
    * (vs [[Dedup.minhashProbeVerified]], which shuffles both sides on the
    * band key): the eval side is benchmark-sized, so BOTH its band table
    * and its text table broadcast, and the train corpus flows through two
    * map-side broadcast-hash joins — signature, band probe, and exact
    * verify all happen in the scan pipeline with ZERO shuffle of training
    * data. The only exchange is the final `groupBy` over verified hit
    * pairs (bounded by actual contamination, not corpus size). Verifying
    * before deduplicating candidate pairs re-checks a pair once per shared
    * band (<= bands x, same exact result each time) — strictly cheaper
    * than a candidate-distinct exchange of the train side would be.
    */
  def fuzzyHits(train: DataFrame, evalSet: DataFrame, idCol: String,
                textCol: String, shingleK: Int = 3, bands: Int = 16,
                rowsPerBand: Int = 2, minJaccard: Double = 0.8): DataFrame = {
    val numHashes = bands * rowsPerBand
    // null text = no shingles = cannot be (or contaminate) a near-dup;
    // filter rather than NPE inside the signature UDFs
    val train0 = train.filter(col(textCol).isNotNull)
    val eval0 = evalSet.filter(col(textCol).isNotNull)
    val evalBuckets = broadcast(
      eval0.select(col(idCol).as("eval_id"),
          Dedup.minhashUdf(col(textCol), lit(shingleK), lit(numHashes)).as("sig"))
        .select(col("eval_id"),
          explode(Dedup.bandKeysUdf(col("sig"), lit(bands), lit(rowsPerBand))).as("bucket")))
    val evalTexts = broadcast(
      eval0.select(col(idCol).as("eval_id"), col(textCol).as("eval_text")))
    val jaccardUdf = udf { (ta: String, tb: String) =>
      val sa = TextStats.shingleStrings(ta, shingleK).toSet
      val sb = TextStats.shingleStrings(tb, shingleK).toSet
      val inter = sa.intersect(sb).size
      val union = sa.size + sb.size - inter
      if (union == 0) 0.0 else inter.toDouble / union
    }
    train0
      .select(col(idCol).as("train_id"), col(textCol).as("t"),
        Dedup.minhashUdf(col(textCol), lit(shingleK), lit(numHashes)).as("sig"))
      .select(col("train_id"), col("t"),
        explode(Dedup.bandKeysUdf(col("sig"), lit(bands), lit(rowsPerBand))).as("bucket"))
      .join(evalBuckets, "bucket")
      .join(evalTexts, "eval_id")
      .select(col("train_id"), col("eval_id"),
        jaccardUdf(col("t"), col("eval_text")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
      .groupBy("train_id", "eval_id") // same pair can match in several bands
      .agg(max("jaccard").as("jaccard"))
  }

  /** Keep stage for [[fuzzyHits]]: train rows not near-duplicate to any
    * eval doc. Same anti-join shape (and non-broadcast rationale) as
    * [[dropContaminated]].
    */
  def dropFuzzyContaminated(train: DataFrame, evalSet: DataFrame, idCol: String,
                            textCol: String, shingleK: Int = 3, bands: Int = 16,
                            rowsPerBand: Int = 2, minJaccard: Double = 0.8): DataFrame = {
    val h = fuzzyHits(train, evalSet, idCol, textCol, shingleK, bands,
      rowsPerBand, minJaccard)
    train.join(h.select(col("train_id").as("__contam_id")).distinct(),
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
