package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Corpus mixing (so
  * many %-points of each language/source/quality tier) needs samples that
  * are (a) stratified, (b) reproducible run-over-run and engine-over-engine
  * — no RNG state, no partition-order dependence — and (c) cheap at
  * 10^12 rows. Two variants with different exactness/cost trade-offs:
  *
  *  - [[stratifiedExact]]: EXACTLY ceil(frac·n_s) rows per stratum s,
  *    chosen by content-digest rank. Cost: one shuffle + per-stratum sort
  *    (window). Right for benchmark-sized strata and wherever exact
  *    per-stratum counts matter; a single dominant stratum makes the
  *    window sort the bottleneck (it is NOT the 100 TB path).
  *  - [[stratifiedThreshold]]: keep rows whose 64-bit content hash falls
  *    under frac·2^63 — map-only, ZERO shuffle, count per stratum is
  *    Binomial(n_s, frac) (±sqrt(n) jitter). The production path: at
  *    10^12 rows the jitter is 10^-6 relative and nothing is sorted.
  *
  * The digest/hash is computed over a caller-chosen column (content text
  * by default at call sites): sampling by content hash keeps exact
  * duplicates together (both in or both out), which is what a dedup-aware
  * mixing stage wants.
  */
object Sampling {

  /** Exact stratified sample: the ceil(count·keepNum/keepDen) rows of each
    * stratum with the smallest (md5(orderCol), tieCol) key. The fraction is
    * a RATIONAL, not a double, so the kept count is pure integer arithmetic
    * — `ceil(n·0.2)` differs between engines (DuckDB multiplies exact
    * DECIMALs, Spark doubles: ceil(70·0.2) = 14 vs 15), while
    * `(n·1 + 4) div 5` is the same everywhere. md5 renders as lowercase hex
    * in Spark and DuckDB alike, so the kept SET is engine-reproducible and
    * oracle-checkable.
    */
  def stratifiedExact(df: DataFrame, stratumCol: String, orderCol: String,
                      tieCol: String, keepNum: Int, keepDen: Int): DataFrame = {
    require(keepNum > 0 && keepDen > 0 && keepNum <= keepDen, s"bad fraction $keepNum/$keepDen")
    val w = Window.partitionBy(col(stratumCol)).orderBy(md5(col(orderCol)), col(tieCol))
    val wc = Window.partitionBy(col(stratumCol))
    df.withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wc))
      .filter(expr(s"__rk <= (__n * $keepNum + ${keepDen - 1}) div $keepDen"))
      .drop("__rk", "__n")
  }

  /** Map-only threshold sample: keep rows with xxhash64(keyCol) in the
    * lowest frac of the non-negative 63-bit hash range. Deterministic,
    * shuffle-free, per-stratum counts approximate (the stratum column is
    * not consulted — uniform hashing stratifies in expectation).
    */
  def stratifiedThreshold(df: DataFrame, keyCol: String, frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0, 1], got $frac")
    val threshold = (frac * Long.MaxValue).toLong
    // logical shift maps the hash into [0, 2^63) without abs()'s
    // Long.MinValue edge case
    df.filter(shiftrightunsigned(xxhash64(col(keyCol)), 1) < lit(threshold))
  }

  /** Temperature-based domain mixing (the exponentiated-sampling rule of
    * multilingual corpus construction — Conneau & Lample 2019 §3.1, XLM-R:
    * domains are resampled in proportion to n_s^α with α < 1, flattening
    * the head so low-resource domains are not drowned): keeps, per domain
    * s, the `min(n_s, T · w_s / Σw)` rows with the smallest
    * (md5(orderCol), tieCol) key, where w_s = ⌊√n_s⌋ (α = 1/2) and
    * T = total·targetNum/targetDen. Every quantity is integer (⌊√n⌋ is
    * exact in IEEE double for n < 2^52, identical across engines; the
    * rest is `div`), so the kept SET is engine-reproducible and the
    * DuckDB oracle compares exactly — the same rational-fraction
    * discipline as [[stratifiedExact]].
    *
    * Scale shape: domain targets come from a domain-count aggregate
    * (|domains| rows) cross-joined with its own 1-row total — no driver
    * action — and are BROADCAST back onto the corpus; the only large-data
    * cost is the per-domain rank window. Like [[stratifiedExact]], that
    * window is exact-counts-first (per-domain sort; a dominant domain
    * sorts in one task): at 10^12 rows swap the rank filter for a
    * per-domain hash threshold at fraction target_s/n_s joined the same
    * broadcast way — map-only, counts Binomial-approximate
    * ([[stratifiedThreshold]]'s trade, per domain).
    */
  def domainMixExact(df: DataFrame, domainCol: String, orderCol: String,
                     tieCol: String, targetNum: Int, targetDen: Int): DataFrame = {
    require(targetNum > 0 && targetDen > 0 && targetNum <= targetDen,
      s"bad fraction $targetNum/$targetDen")
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n"))).cast("long"))
    val targets = counts
      .crossJoin(broadcast(counts.agg(sum("__n").as("__nsum"), sum("__w").as("__wsum"))))
      .withColumn("__target",
        least(col("__n"),
          expr(s"((__nsum * $targetNum div $targetDen) * __w) div __wsum")))
      .select(col(domainCol), col("__target"))
    val w = Window.partitionBy(col(domainCol)).orderBy(md5(col(orderCol)), col(tieCol))
    df.join(broadcast(targets), Seq(domainCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("__target"))
      .drop("__rk", "__target")
  }

  /** Deterministic leakage-free holdout split (train/val/test): each row's
    * split is a pure function of its KEY — the 32-bit md5-prefix bucket
    * (`conv(substring(md5(key),1,8),16,10) % Σweights`, the same
    * engine-reproducible hex device as [[stratifiedExact]]) mapped through
    * the cumulative weight ranges. Three properties a random split lacks,
    * each load-bearing for training pipelines:
    *
    *  - STABLE under corpus growth: re-running after ingesting new data
    *    never moves an old row across splits (no silent eval
    *    contamination round over round).
    *  - LEAKAGE-FREE by key choice: keyed on url (or canonical url),
    *    every snapshot/recrawl/near-identical variant of a page lands in
    *    the SAME split — the page-level leakage a row-wise random split
    *    invites.
    *  - Engine-reproducible: the DuckDB oracle replays the identical
    *    bucket arithmetic, so split membership (pinned by id sums) is
    *    exact, not statistical.
    *
    * Map-only, zero shuffle, codegen'd built-ins only. Split sizes are
    * Binomial around weight/Σweights (hash uniformity), NOT exact counts
    * — exactness here would cost a global sort and break stability.
    */
  def holdoutSplit(df: DataFrame, keyCol: String,
                   splits: Seq[(String, Int)], splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "holdoutSplit: no splits")
    require(splits.forall(_._2 > 0), "holdoutSplit: weights must be positive")
    require(splits.map(_._1).distinct.length == splits.length, "holdoutSplit: duplicate split names")
    val total = splits.map(_._2.toLong).sum
    val bucket = pmod(conv(substring(md5(col(keyCol)), 1, 8), 16, 10).cast("long"), lit(total))
    val label = splits.init.scanLeft((lit(null).cast("string"), 0L)) {
      case ((_, cum), (name, w)) => (lit(name), cum + w)
    }.tail.foldRight(lit(splits.last._1): org.apache.spark.sql.Column) {
      case ((name, cumEnd), rest) => when(bucket < cumEnd, name).otherwise(rest)
    }
    df.withColumn(splitCol, label)
  }
}
