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

  /** CCNet's signature move (Wenzek et al. 2020 §4.3): bucket each
    * language's documents into head/middle/tail TERCILES of the LM score
    * — head feeds the clean corpus, middle is kept for diversity, tail is
    * dropped or down-weighted. The per-document score is the integer
    * commonness-per-token rate `commonness * scale / n_tokens` (floor
    * division — exact and engine-reproducible, unlike a float perplexity),
    * ranked DESC within language with doc_id tie-break; the tercile cut is
    * pure integer arithmetic on (rank, n): `rk*3 <= n` → head,
    * `rk*3 <= 2n` → middle, else tail. Zero-token documents score 0 (the
    * tail, where CCNet puts undecodable docs).
    *
    * Scale shape: scoring is the map-only [[scoreDocs]] pass; bucketing
    * adds ONE window (rank within language) — a single shuffle keyed by
    * language. A thousand-language corpus partitions evenly; a single
    * dominant language makes this window the same cost as any global
    * rank, which is what the CCNet pipeline pays too.
    */
  def ccnetBuckets(docs: DataFrame, idCol: String, textCol: String,
                   langCol: String, topV: Int,
                   scale: Long = 1000000L): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    // integral `div`, not `/` (which is DOUBLE division in Spark SQL and
    // would lose exactness past 2^53)
    val scored = scoreDocs(docs, idCol, textCol, topV)
      .select(col(idCol),
        expr(s"CASE WHEN n_tokens > 0 THEN (commonness * CAST($scale AS BIGINT)) div n_tokens " +
          "ELSE CAST(0 AS BIGINT) END").as("rate"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol)).orderBy(col("rate").desc, col(idCol))
    docs.join(scored, idCol)
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(langCol))))
      .withColumn("bucket",
        when(col("rk") * 3 <= col("n"), lit("head"))
          .when(col("rk") * 3 <= col("n") * 2, lit("middle"))
          .otherwise(lit("tail")))
      .drop("rk", "n")
  }
}
