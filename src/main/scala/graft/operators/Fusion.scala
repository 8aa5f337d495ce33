package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-fusion operators for hybrid retrieval — combining the sparse
  * (BM25 inverted-index) and dense (embedding ANN) top-k lists that the
  * library already produces into one ranking per query.
  *
  * Reference analog: the reference exposes keyword search over extracted
  * text as its query surface (`enhanced_extract.py` keyword path); a
  * production retrieval stack over the same corpus runs BOTH a lexical
  * and an embedding leg and fuses them. Reciprocal Rank Fusion
  * (Cormack, Clarke & Buettcher, SIGIR 2009) is the standard
  * score-free fusion: contribution `1/(k + rank)` per leg, summed.
  * Using RANKS rather than raw scores sidesteps score-scale mismatch
  * between BM25 doubles and cosine floats — and makes the fused score
  * bit-deterministic across engines (pure arithmetic on small
  * integers), so it oracle-hashes exactly.
  *
  * Scale shape: the INPUTS are already-reduced top-k lists (Q x k rows
  * per leg — thousands of rows where the corpus is 10^12), so the
  * fusion itself is a sequence of tiny equi-joins AQE will broadcast;
  * all heavy lifting (postings shuffle, ANN probe) happened inside the
  * legs, which carry their own scale arguments. Float-combine order is
  * part of the contract: legs are added left to right (reduceLeft), so
  * any leg count is deterministic, not just the commutative 2-leg case.
  */
object Fusion {

  /** Fuse per-query rankings by Reciprocal Rank Fusion. Each leg must
    * carry columns (`qid`, `doc`, `rank`) with rank 1-based within qid;
    * a document absent from a leg contributes 0 from it. Returns
    * (`qid`, `doc`, `rrf`, `rank`) — the fused top `topK` per query,
    * rank 1-based in (rrf desc, doc asc) order (the doc-ascending
    * tie-break matters: equal ranks in disjoint legs collide exactly).
    */
  def rrfFuse(legs: Seq[DataFrame], kk: Int = 60, topK: Int = 10): DataFrame = {
    require(legs.size >= 2, s"rrfFuse needs >= 2 legs, got ${legs.size}")
    require(kk >= 1, s"rrf k must be >= 1, got $kk")
    val contribs = legs.zipWithIndex.map { case (l, i) =>
      l.select(
        col("qid"),
        col("doc"),
        (lit(1.0) / (lit(kk.toDouble) + col("rank").cast("double"))).as(s"c_$i"))
    }
    val joined = contribs.reduceLeft((a, b) => a.join(b, Seq("qid", "doc"), "full_outer"))
    val score = contribs.indices
      .map(i => coalesce(col(s"c_$i"), lit(0.0)))
      .reduceLeft[Column](_ + _)
    val w = Window.partitionBy(col("qid")).orderBy(col("rrf").desc, col("doc").asc)
    joined
      .select(col("qid"), col("doc"), score.as("rrf"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }
}
