package graft.operators

import graft.functions.TextStats
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
  * the MOSS local-fingerprinting algorithm): from the rolling k-gram
  * hash sequence, every window of `w` consecutive hashes selects its
  * minimum (rightmost position on ties), and the distinct selections
  * are the document's fingerprints. Guarantees: any shared run of
  * w + k - 1 tokens between two documents yields at least one SHARED
  * fingerprint (the detection guarantee exhaustive k-gram sets pay ~w×
  * more storage for), and selection density is ~2/(w+1).
  *
  * Distinct from the minhash/simhash family: those sketch WHOLE-document
  * similarity; winnowing finds LOCAL overlaps (a copied paragraph inside
  * otherwise different documents) with position alignment — the
  * plagiarism/boilerplate-provenance shape.
  *
  * Engine-exact: gram hashes are md5-prefix integers, window minima are
  * frame aggregates over a (doc, pos) total order, and the rightmost
  * tie rule is a max(pos) among frame positions attaining the min — all
  * deterministic, so the fingerprint SET mirrors in SQL.
  *
  * Scale shape: everything partitions by document (window frames and
  * the pick join are doc-local; each gram row meets at most w window
  * starts), so the whole build is one doc-keyed exchange; cross-corpus
  * overlap mining then joins on fingerprint hash with the usual
  * hot-key cap upstream.
  */
object Winnowing {

  /** Documents are capped at 2^20 grams (~a million tokens) so the
    * (hash, rightmost-pos) pair packs into one BIGINT; a longer
    * document fails loudly, never selects wrong fingerprints.
    */
  val MaxGrams: Long = 1L << 20

  /** (doc, pos, h) distinct fingerprints; `pos` is the 0-based gram
    * position of the selected k-gram, `h` its 32-bit hash. Documents
    * with fewer than k + w - 1 tokens yield no fingerprints (no full
    * window exists).
    *
    * The rightmost-min pick is ONE window aggregate, not a join: the
    * packed key `h · 2^20 + (2^20 - 1 - pos)` orders by hash first and
    * by DESCENDING position among equal hashes, so the frame's min key
    * IS the window's rightmost minimal gram — and the packing is plain
    * integer arithmetic the SQL mirror replays (h < 2^32, so the
    * product stays under 2^52, exact everywhere).
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int, w: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    val grams = docs
      .select(F.col(idCol).as("doc"), TextStats.lowerTokensUdf(F.col(textCol)).as("l"))
      // size guard: sequence(0, negative) would count DOWN (step -1)
      .filter(F.size(F.col("l")) >= k)
      .select(F.col("doc"), F.explode(F.transform(
        F.sequence(F.lit(0), F.size(F.col("l")) - k),
        j => F.struct(j.as("pos"),
          F.array_join(F.slice(F.col("l"), j + 1, F.lit(k)), " ").as("g")))).as("z"))
      .select(F.col("doc"), F.col("z.pos").cast("long").as("pos"),
        F.conv(F.substring(F.md5(F.col("z.g")), 1, 8), 16, 10).cast("long").as("h"))
      .withColumn("wkey",
        F.when(F.col("pos") >= MaxGrams, F.raise_error(
          F.lit(s"winnowing: document exceeds $MaxGrams grams")))
          .otherwise(F.col("h") * MaxGrams + (F.lit(MaxGrams - 1) - F.col("pos"))))
    val frame = Window.partitionBy(F.col("doc")).orderBy(F.col("pos"))
      .rowsBetween(0, w - 1)
    val nG = Window.partitionBy(F.col("doc"))
    grams
      .withColumn("win", F.min(F.col("wkey")).over(frame))
      .withColumn("ng", F.count(F.lit(1)).over(nG))
      // a window start is valid only when its full w-frame exists
      .filter(F.col("pos") <= F.col("ng") - w)
      .select(F.col("doc"),
        (F.lit(MaxGrams - 1) - F.col("win") % MaxGrams).as("pos"),
        F.expr(s"win div $MaxGrams").as("h"))
      .distinct()
  }
}
