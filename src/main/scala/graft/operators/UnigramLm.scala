package graft.operators

import graft.functions.TextStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-statistics language-model scoring — the two-phase shape of
  * CCNet's perplexity filter (Wenzek et al. 2020 §4.2: score each
  * document against a language model and gate on the score), with the
  * trained LM replaced by the corpus's OWN unigram statistics so the
  * whole path stays integer-exact and oracle-checkable: phase one
  * aggregates a bounded top-V vocabulary (count-ranked, deterministic
  * ties), phase two broadcasts it and scores every document in one
  * map-only pass — `commonness` (summed corpus frequency of in-vocab
  * tokens) is the integer analog of negative log-perplexity, and the
  * OOV count is the quality signal CCNet derives from it.
  *
  * Scale shape: the vocab build is a map-side-combined token count
  * (shuffle width = distinct tokens per partition, NOT corpus tokens)
  * finished by TakeOrderedAndProject — only V rows ever reach the
  * driver, and V is a parameter, not data-dependent. The scoring pass
  * ships the V-entry table to executors via a broadcast variable and
  * touches each document exactly once. Swapping in a real trained LM
  * (KenLM-style log-prob table) changes the broadcast payload, nothing
  * else.
  */
object UnigramLm {

  /** The top-V corpus vocabulary by (count DESC, token ASC) — a total
    * order, so the V-boundary is deterministic and engine-reproducible.
    * Tokens are lowercased whitespace tokens ([[TextStats.tokens]]).
    */
  def vocab(docs: DataFrame, textCol: String, topV: Int): DataFrame = {
    require(topV > 0, s"topV must be positive, got $topV")
    docs.select(explode(TextStats.lowerTokensUdf(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(topV)
  }

  /** Scores each doc against the corpus's own top-V vocabulary:
    * (idCol, n_tokens, n_oov, commonness). Collects only the V vocab rows
    * to the driver and broadcasts them; the scoring pass is map-only.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String, topV: Int): DataFrame = {
    val v = vocab(docs, textCol, topV).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bc = docs.sparkSession.sparkContext.broadcast(v)
    val scoreUdf = udf { (t: String) =>
      val ws = if (t == null) Array.empty[String] else TextStats.tokens(t.toLowerCase)
      var oov = 0L; var common = 0L
      ws.foreach { w =>
        bc.value.get(w) match {
          case Some(c) => common += c
          case None => oov += 1
        }
      }
      (ws.length.toLong, oov, common)
    }
    docs.select(col(idCol), scoreUdf(col(textCol)).as("s"))
      .select(col(idCol), col("s._1").as("n_tokens"), col("s._2").as("n_oov"),
        col("s._3").as("commonness"))
  }
}
