package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.functions.TextStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (Xie et al. 2023, DSIR) —
  * the distribution-matching selection stage of a pretraining pipeline:
  * rank a raw web corpus by how target-like each document's hashed n-gram
  * distribution is, and keep the top slice.
  *
  * DSIR proper scores log w(x) = Σ_g [log p_target(b(g)) − log p_raw(b(g))]
  * over hashed unigram+bigram buckets. This implementation uses the
  * integer LINEAR analog — score(x) = Σ_g [cntT(b(g))·totR − cntR(b(g))·totT]
  * — the same per-gram SIGN (a gram scores positive iff it is relatively
  * more frequent in the target corpus than in the raw corpus) with
  * deterministic BIGINT document scores, the [[graft.operators.UnigramLm]]
  * / BM25 log-free discipline: float log sums are order-dependent across
  * partitionings, integer sums are not, and the DuckDB oracle can replay
  * them bit for bit. The aggregate ordering deviates from sum-of-logs
  * (linear weighting emphasizes high-frequency buckets more); swapping in
  * fixed-point log tables reuses the identical plan if log weighting is
  * required.
  *
  * Bucketing is the [[graft.functions.HashClassifier]] 16-bit-md5-prefix
  * discipline (`int(md5(g)[0..4 hex)) mod nBuckets`) so the oracle replays
  * the identical bucket from hex arithmetic; a trained production setup
  * swaps xxhash64 in without touching the plan.
  *
  * Scale shape: both distributions collapse to `nBuckets` longs — the
  * target table comes from the (small) target corpus, the raw table from
  * ONE map-side-combined aggregate over the corpus (nBuckets-sized
  * partials, int keys). Scoring is then map-only with both tables in the
  * task closure; selection is a TakeOrdered (never a global sort). At
  * 10^12 raw tokens, rescale both tables first (divide by q = ceil(tot /
  * 2^31) — see the overflow guard) and take the documented quantization
  * drift, or raise `score`'s guard bound.
  */
object Dsir {

  /** Hashed buckets of every unigram and adjacent bigram (lowercased
    * whitespace tokens, repeats kept — these are frequency features, not
    * the dedup SET features). Null/empty docs yield no grams.
    */
  def gramBuckets(text: String, nBuckets: Int): Array[Int] = {
    // the bucket source is a 16-bit md5 prefix: more than 65536 buckets
    // would leave the tail permanently empty (silent dead weight in the
    // delta table), and 0 would ArithmeticException inside a task
    require(nBuckets > 0 && nBuckets <= 65536,
      s"nBuckets $nBuckets outside the 16-bit prefix range 1..65536")
    val ws = TextStats.tokens(if (text == null) "" else text.toLowerCase)
    if (ws.isEmpty) return Array.empty
    val md = MessageDigest.getInstance("MD5")
    def b(g: String): Int = {
      md.reset()
      val d = md.digest(g.getBytes(StandardCharsets.UTF_8))
      (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % nBuckets
    }
    val out = new Array[Int](ws.length + ws.length - 1)
    var i = 0
    while (i < ws.length) { out(i) = b(ws(i)); i += 1 }
    var j = 0
    while (j + 1 < ws.length) { out(ws.length + j) = b(ws(j) + " " + ws(j + 1)); j += 1 }
    out
  }

  /** Corpus gram-bucket histogram as a dense Array[Long] (index = bucket).
    * One exchange of nBuckets-sized partials; only nBuckets longs reach the
    * driver.
    */
  def bucketCounts(docs: DataFrame, textCol: String, nBuckets: Int): Array[Long] = {
    val bUdf = udf((t: String) => gramBuckets(t, nBuckets))
    val rows = docs
      .select(explode(bUdf(col(textCol))).as("b"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
    val out = new Array[Long](nBuckets)
    rows.foreach(r => out(r.getInt(0)) = r.getLong(1))
    out
  }

  /** Per-document importance scores: (idCol, score, n_grams), map-only.
    *
    * The per-bucket contribution `delta(b) = cntT(b)·totR − cntR(b)·totT`
    * is a pure function of the two tables, so it is built ONCE on the
    * driver (nBuckets multiplies, each `multiplyExact` — table masses too
    * big for the cross products fail loudly there, not by wraparound in a
    * task) and shipped in the closure; the per-gram hot loop is then a
    * single array read + add. The overflow guard is EXACT for the tables
    * in hand: |score| ≤ n_grams · max_b|delta(b)|, so the per-doc require
    * uses the realized max, not the totT·totR worst case that would
    * reject ordinary corpora (rescale both tables, scaladoc, if it fires).
    */
  def scoreDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetCounts: Array[Long],
      rawCounts: Array[Long]
  ): DataFrame = {
    require(targetCounts.length == rawCounts.length, "bucket tables must share a width")
    val nBuckets = targetCounts.length
    val totT = targetCounts.foldLeft(0L)(Math.addExact)
    val totR = rawCounts.foldLeft(0L)(Math.addExact)
    require(totT > 0 && totR > 0, "both corpora must contribute grams")
    val delta = Array.tabulate(nBuckets) { b =>
      Math.subtractExact(
        Math.multiplyExact(targetCounts(b), totR),
        Math.multiplyExact(rawCounts(b), totT))
    }
    val maxAbsDelta = math.max(1L, delta.map(math.abs).max)
    val maxGrams = (Long.MaxValue / 2) / maxAbsDelta
    val scoreUdf = udf { (t: String) =>
      val bs = gramBuckets(t, nBuckets)
      require(bs.length <= maxGrams,
        s"doc with ${bs.length} grams exceeds the overflow-safe bound $maxGrams " +
          "for these table masses — rescale the bucket tables (scaladoc)")
      var s = 0L
      var i = 0
      while (i < bs.length) {
        s += delta(bs(i))
        i += 1
      }
      (s, bs.length.toLong)
    }
    docs.select(
      col(idCol),
      scoreUdf(col(textCol)).as("s"))
      .select(col(idCol), col("s._1").as("score"), col("s._2").as("n_grams"))
  }

  /** The selection: top `n` docs by (score DESC, id ASC) — a TakeOrdered,
    * never a global sort; ties cut deterministically by id.
    */
  def selectTop(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetCounts: Array[Long],
      rawCounts: Array[Long],
      n: Int
  ): DataFrame =
    scoreDocs(docs, idCol, textCol, targetCounts, rawCounts)
      .orderBy(col("score").desc, col(idCol))
      .limit(n)
}
