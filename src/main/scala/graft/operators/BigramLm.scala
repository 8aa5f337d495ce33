package graft.operators

import graft.functions.TextStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Word-order-aware corpus-LM scoring — the bigram upgrade of
  * [[UnigramLm]], completing the CCNet quality-filter shape (Wenzek et
  * al. 2020 §4.2): CCNet gates documents on the perplexity of a trained
  * 5-gram LM precisely because perplexity is ORDER-sensitive — shuffled
  * or machine-mangled text keeps its unigram profile but loses its
  * n-gram profile. This operator keeps that discriminating power while
  * staying integer-exact and oracle-checkable: the "LM" is the training
  * corpus's own top-B bigram table, and a document's `fluency` (summed
  * corpus frequency of its in-vocab bigrams) is the integer analog of
  * negative log-perplexity. A reversed-token document scores near zero
  * here while scoring identically to its original under [[UnigramLm]] —
  * the driver query pins exactly that contrast.
  *
  * Scale shape: the bigram-table build is one map-side-combined count
  * (shuffle width = distinct bigrams per partition, not corpus tokens)
  * finished by TakeOrderedAndProject, so only B rows reach the driver
  * and B is a parameter. Scoring broadcasts the B-entry table and
  * touches each document once, map-only — no join, no shuffle. At
  * production scale the training frame is a held-out sample (pass any
  * DataFrame as `train`), and swapping in a real trained LM changes the
  * broadcast payload, nothing else. Reference analog: quality gating on
  * per-document scores (enhanced_extract.py:629 counts feeding filters).
  */
object BigramLm {

  /** Adjacent lowercase-token pairs of one text, in order. */
  private[graft] def bigrams(text: String): Array[(String, String)] = {
    val ws = if (text == null) Array.empty[String] else TextStats.tokens(text.toLowerCase)
    if (ws.length < 2) Array.empty
    else Array.tabulate(ws.length - 1)(i => (ws(i), ws(i + 1)))
  }

  /** The top-B training-corpus bigram table by (count DESC, w1 ASC,
    * w2 ASC) — a total order, so the B-boundary is deterministic and
    * engine-reproducible. Columns: (w1, w2, cnt).
    */
  def vocab(train: DataFrame, textCol: String, topB: Int): DataFrame = {
    require(topB > 0, s"topB must be positive, got $topB")
    val bigramsUdf = udf((t: String) => bigrams(t))
    train.select(explode(bigramsUdf(col(textCol))).as("b"))
      .select(col("b._1").as("w1"), col("b._2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w1"), col("w2"))
      .limit(topB)
  }

  /** Collects the top-B bigram table of `train` to a driver map — the
    * broadcastable "LM". Only B rows ever reach the driver.
    */
  def table(train: DataFrame, textCol: String, topB: Int): Map[(String, String), Long] =
    vocab(train, textCol, topB).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  /** Appends (n_bigrams, n_oov_bigrams, fluency) columns to `docs`,
    * scored against an explicit bigram table (a [[table]] result, or any
    * pre-trained frequency map). Broadcast + map-only — no join, no
    * shuffle. Docs with fewer than two tokens score (0, 0, 0).
    * Pre-existing columns with those names (or `s`) are replaced.
    */
  def scoreWith(tbl: Map[(String, String), Long], docs: DataFrame, textCol: String): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(tbl)
    val scoreUdf = udf { (t: String) =>
      val bs = bigrams(t)
      var oov = 0L
      var flu = 0L
      bs.foreach { b =>
        bc.value.get(b) match {
          case Some(c) => flu += c
          case None => oov += 1
        }
      }
      (bs.length.toLong, oov, flu)
    }
    docs.withColumn("s", scoreUdf(col(textCol)))
      .withColumn("n_bigrams", col("s._1"))
      .withColumn("n_oov_bigrams", col("s._2"))
      .withColumn("fluency", col("s._3"))
      .drop("s")
  }

  /** Scores each doc in `docs` against the top-B bigram table of
    * `train`: (idCol, n_bigrams, n_oov_bigrams, fluency) — the
    * [[UnigramLm.scoreDocs]]-parallel surface.
    */
  def scoreDocs(
      train: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      topB: Int
  ): DataFrame =
    scoreWith(table(train, textCol, topB), docs, textCol)
      .select(col(idCol), col("n_bigrams"), col("n_oov_bigrams"), col("fluency"))

  /** The CCNet-style keep gate, integer-rational so no float division
    * ever happens: keep docs whose average in-vocab bigram frequency is
    * at least minNum/minDen, i.e. `fluency * minDen >= n_bigrams *
    * minNum`. Degenerate docs (fewer than two tokens, n_bigrams = 0)
    * pass vacuously — gate those on length upstream, where the signal
    * actually lives. Returns `docs` rows (all columns) that pass.
    */
  def keepFluent(
      train: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      topB: Int,
      minNum: Long,
      minDen: Long
  ): DataFrame = {
    require(minDen > 0, s"minDen must be positive, got $minDen")
    require(minNum >= 0, s"minNum must be non-negative, got $minNum")
    val bc = docs.sparkSession.sparkContext.broadcast(table(train, textCol, topB))
    // score in-row and filter, never joining back: at corpus scale the
    // kept set is most of the corpus, so a score-then-join-back plan
    // would shuffle (or worse, broadcast) a corpus-sized id list — this
    // stays one map-only pass over docs
    val gateUdf = udf { (t: String) =>
      val bs = bigrams(t)
      var flu = 0L
      bs.foreach(b => flu += bc.value.getOrElse(b, 0L))
      flu * minDen >= bs.length.toLong * minNum
    }
    docs.where(gateUdf(col(textCol)))
  }
}
