package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Adaptive revisit scheduling — the crawl-side complement of the recrawl
  * upsert: estimate per-url content change rates from crawl HISTORY
  * (url, ts, digest) and tier urls into revisit classes, so a 10^12-page
  * frontier spends its fetch budget on pages that actually change
  * (Cho & Garcia-Molina's revisit-policy result: uniform revisiting wastes
  * most of its budget on static pages). The history input is exactly what
  * the manifest table accumulates under [[ExtractJob.upsertChanged]]
  * (append history keeps every superseded row), so the scheduler closes
  * the loop: crawl → changed-only commit → change-rate estimate → next
  * crawl's priorities.
  *
  * Scale shape: one url-shuffle window (lag over ts) + one groupBy on the
  * SAME key — Catalyst reuses the partitioning, so the whole estimate is a
  * single Exchange; state per url is O(1) (counts, not digests).
  */
object Revisit {

  /** Per-url change statistics over a (url, ts, digest) history:
    * `n_obs` observations, `n_changes` adjacent digest changes in ts
    * order, `change_ratio` = n_changes / (n_obs - 1) (share of revisits
    * that found new content; 0 for single-observation urls).
    * Digest ties at equal ts are broken by the digest value so the lag
    * order — and therefore the count — is deterministic.
    */
  def changeRates(
      history: DataFrame,
      urlCol: String,
      tsCol: String,
      digestCol: String
  ): DataFrame = {
    val w = Window.partitionBy(F.col(urlCol))
      .orderBy(F.col(tsCol), F.col(digestCol))
    history
      .withColumn("__prev", F.lag(F.col(digestCol), 1).over(w))
      .withColumn("__chg",
        F.when(F.col("__prev").isNotNull &&
          F.col("__prev") =!= F.col(digestCol), 1L).otherwise(0L))
      .groupBy(F.col(urlCol))
      .agg(
        F.count(F.lit(1)).as("n_obs"),
        F.sum(F.col("__chg")).as("n_changes"))
      .withColumn("change_ratio",
        F.when(F.col("n_obs") > 1,
          F.col("n_changes").cast("double") / (F.col("n_obs") - 1))
          .otherwise(F.lit(0.0)))
  }

  /** Tier the [[changeRates]] output into revisit classes by change ratio:
    * `hot` (ratio >= hotMin) — revisit every cycle; `warm` (>= warmMin) —
    * revisit occasionally; `cold` — long revisit interval. Thresholds are
    * corpus policy, not constants of nature; defaults follow the common
    * daily/weekly/monthly split.
    */
  def tiered(
      rates: DataFrame,
      hotMin: Double = 0.8,
      warmMin: Double = 0.4
  ): DataFrame =
    rates.withColumn("tier",
      F.when(F.col("change_ratio") >= hotMin, "hot")
        .when(F.col("change_ratio") >= warmMin, "warm")
        .otherwise("cold"))
}
