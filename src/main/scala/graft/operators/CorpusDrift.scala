package graft.operators

import graft.functions.TextStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-distribution drift between two corpus snapshots — the data-
  * quality monitor a recurring crawl runs before admitting a new batch:
  * a topic shift, a scraper regression (boilerplate leaking back in), or
  * a spam wave all show up first as probability mass moving between
  * high-frequency tokens. Reported per token over the union's top-V
  * vocabulary as the EXACT scaled L1 term
  * `|c_a(w) * N_b  -  c_b(w) * N_a|` — the integer numerator of
  * `|p_a(w) - p_b(w)|` over the common denominator N_a*N_b, so the
  * ranking is bit-reproducible with no float division anywhere.
  *
  * Scale shape: one map-side-combined token count per side (shuffle
  * width = distinct tokens, not corpus tokens), a full-outer merge on
  * the token key, a bounded top-V cut (TakeOrderedAndProject — V rows,
  * parameter not data), and two scalar totals broadcast by a 1-row
  * cross join. Nothing driver-side grows with the corpus.
  */
object CorpusDrift {

  /** Top-`k` drifting tokens of the union top-V vocabulary:
    * (w, c_a, c_b, drift_num), ordered by drift DESC then token.
    * Totals N_a/N_b are the IN-VOCAB token masses, so adding a tail
    * token to neither side cannot reshuffle the report.
    */
  def tokenDrift(a: DataFrame, b: DataFrame, textCol: String,
                 topV: Int, k: Int): DataFrame = {
    require(topV > 0 && k > 0, s"topV and k must be positive, got $topV, $k")
    def counts(df: DataFrame, out: String) =
      df.select(explode(TextStats.lowerTokensUdf(col(textCol))).as("w"))
        .groupBy("w").agg(count(lit(1)).as(out))
    val merged = counts(a, "c_a").join(counts(b, "c_b"), Seq("w"), "full_outer")
      .select(col("w"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
    val vocab = merged
      .orderBy((col("c_a") + col("c_b")).desc, col("w")).limit(topV)
    val tot = vocab.agg(sum("c_a").as("n_a"), sum("c_b").as("n_b"))
    vocab.crossJoin(tot)
      .select(col("w"), col("c_a"), col("c_b"),
        abs(col("c_a") * col("n_b") - col("c_b") * col("n_a")).as("drift_num"))
      .orderBy(col("drift_num").desc, col("w")).limit(k)
  }
}
