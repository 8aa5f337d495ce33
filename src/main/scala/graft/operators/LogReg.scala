package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** In-cluster linear-classifier TRAINING by full-batch gradient descent —
  * the second trainer tier next to [[Rocchio]] (centroids): where Rocchio
  * is one aggregation pass, this is the iterative-optimization shape every
  * modern corpus-quality classifier uses (a FastText/linear probe trained
  * on in-corpus labels, then swept over the full corpus as a keep gate).
  * The reference's classification is a static keyword map
  * (document_classifier.py analog cited at TextStats.classify); training
  * the gate IN the engine is what a 10^12-document corpus needs — no
  * sidecar ML stack, one scan per epoch.
  *
  * Determinism contract (same discipline as LinkGraph.pagerankInt): the
  * model is trained in SCALED INTEGER arithmetic end to end, so the
  * learned weights — not just the predictions — are deterministic BIGINTs
  * reproducible bit-for-bit by a SQL mirror. The logistic sigmoid is
  * replaced by the HARD sigmoid (piecewise-rational; Collobert 2004's
  * hard tanh relative)
  *
  *   p = clamp(1/2 + z/4, 0, 1),  z = w·x
  *
  * which keeps every quantity rational with a fixed denominator: with
  * weights at scale S (`scale`, default 1024) and integer features x,
  * z = Σ w_i·x_i is at scale S and
  *
  *   p_scaled   = clamp(S/2 + tdiv(z, 4), 0, S)          ∈ [0, S]
  *   err        = p_scaled − S·y                          ∈ [−S, S]
  *   G_i        = Σ_train err · x_i                       (exact long sum)
  *   w_i       ← w_i − tdiv(G_i, n·lrDen)
  *
  * (tdiv = truncation toward zero: Spark `div`, DuckDB `//`, Java `/` —
  * all three agree, including on negatives). Integer sums commute, so the
  * weights are independent of partitioning and reduce order; an epoch is
  * mirrorable as one SQL aggregate per round.
  *
  * Scale shape: each epoch is ONE map-side-combined aggregate over the
  * cached train set (k partial sums per task, k = |features|); the model
  * lives on the driver as k longs and re-enters the next epoch inlined as
  * literals — the treeAggregate pattern of every distributed GD, with no
  * per-row state and nothing driver-side that grows with the data.
  * Inference ([[predictExpr]]) is a pure codegen'd column over the
  * broadcast-free literal weights: a map-only keep gate at any scale.
  *
  * Overflow bound: |err·x_i| ≤ S·max|x|, summed over n train rows —
  * callers keep S·max|x|·n below 2^63 (at the defaults, features ≤ 10^3
  * and n ≤ 10^15 are safe). ANSI mode makes a violation loud.
  */
object LogReg {

  /** Train by `epochs` rounds of full-batch hard-sigmoid GD over integer
    * feature columns `xCols` and 0/1 long label `yCol`. Returns (weights
    * at scale `scale`, n_train). Callers cache `train` — every epoch
    * re-scans it.
    */
  def trainHardSigmoid(
      train: DataFrame,
      xCols: Seq[String],
      yCol: String,
      epochs: Int,
      lrDen: Long,
      scale: Long = 1024L): (Array[Long], Long) = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    require(lrDen >= 1, s"lrDen must be >= 1, got $lrDen")
    require(scale % 2 == 0, s"scale must be even, got $scale")
    val n = train.count()
    require(n > 0, "trainHardSigmoid needs a non-empty train set")
    var w = Array.fill(xCols.length)(0L)
    for (_ <- 1 to epochs) {
      val err = errExpr(xCols, w, yCol, scale)
      val gs = xCols.zipWithIndex.map { case (c, i) =>
        F.coalesce(F.sum(F.expr(s"($err) * $c")), F.lit(0L)).as(s"g$i")
      }
      val row = train.agg(gs.head, gs.tail: _*).head()
      w = w.indices.map(i => w(i) - row.getLong(i) / (n * lrDen)).toArray
    }
    (w, n)
  }

  /** The scaled hard-sigmoid error term (p_scaled − S·y) as a SQL
    * expression string with the weights inlined as literals — the ONE
    * Scala-side definition of the arithmetic (train and predict both
    * derive from it, mirroring how the SQL oracle shares its CTE).
    */
  private def errExpr(xCols: Seq[String], w: Array[Long], yCol: String, scale: Long): String = {
    val z = xCols.zipWithIndex.map { case (c, i) => s"${w(i)}L * $c" }.mkString(" + ")
    s"greatest(0L, least(${scale}L, ${scale / 2}L + ($z) div 4L)) - ${scale}L * $yCol"
  }

  /** Codegen'd 0/1 prediction column for trained weights: 1 iff the
    * clamped p_scaled ≥ S/2 — the SAME clamped quantity the trainer uses,
    * so the decision boundary is replayable exactly (a bare `z ≥ 0` test
    * would disagree with tdiv truncation for z ∈ [−3, −1]).
    */
  def predictExpr(xCols: Seq[String], w: Array[Long], scale: Long = 1024L): Column = {
    val z = xCols.zipWithIndex.map { case (c, i) => s"${w(i)}L * $c" }.mkString(" + ")
    F.expr(s"CAST(greatest(0L, least(${scale}L, ${scale / 2}L + ($z) div 4L)) >= ${scale / 2}L AS INT)")
      .cast("long")
  }
}
