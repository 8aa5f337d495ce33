package graft.operators

import graft.functions.TextStats
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed TRAINING of a centroid (Rocchio 1971) text classifier —
  * the missing half of [[graft.functions.HashClassifier]], which applies
  * a weight table trained elsewhere. Every production quality filter in
  * the CCNet/fastText lineage is trained the same way this operator is:
  * one aggregation pass over labeled seed documents builds per-class
  * token statistics, the bounded model is broadcast, and inference is a
  * map-only pass over the unlabeled corpus.
  *
  * The model is the per-class token-frequency centroid restricted to the
  * global top-V vocabulary: `n_wc` (count of token w in class c) and
  * `N_c` (total in-vocab tokens of class c). A document's class score is
  * the mean class frequency of its tokens,
  * `score_c = sum_w x_w * n_wc / N_c`, and the prediction is the argmax
  * — multinomial Naive Bayes with the log-pooling replaced by linear
  * pooling, which keeps every quantity INTEGER so the argmax can be
  * decided by exact cross-multiplication (`num_c * N_c' > num_c' * N_c`)
  * instead of float log-sums: the decision is bit-reproducible in any
  * engine, which is what lets a DuckDB oracle replay the whole
  * train-then-classify path. Ties (e.g. a document with zero vocabulary
  * overlap scores 0 in every class) break to the lexicographically
  * smallest class label.
  *
  * Scale shape (the point of the operator):
  *   - training is ONE shuffle of (label, token) partial counts —
  *     map-side combined, so shuffle width is distinct-tokens-per-
  *     partition, not corpus tokens;
  *   - the vocabulary is capped at top-V by global count (count DESC,
  *     token ASC — a total order), finished by TakeOrderedAndProject, so
  *     AT MOST V*C model rows ever reach the driver no matter the corpus
  *     size: V and C are parameters, not data;
  *   - inference broadcasts the V*C-entry model and touches each
  *     document exactly once (map-only, no shuffle) — the same plan
  *     HashClassifier inference uses, now fed by in-cluster training.
  *
  * The cross-multiplied comparison uses BigInt: num_c is bounded by
  * (tokens per doc) * max_w n_wc, and n_wc/N_c grow with the training
  * corpus, so at 10^12-document scale Long products could overflow;
  * the BigInt cost is C^2 comparisons per document, independent of
  * corpus size.
  */
object Rocchio {

  /** Per-class in-vocabulary token counts: (label, w, n_wc) for the
    * global top-V vocabulary of the training set. One aggregation plus a
    * bounded top-V: the model-build pass.
    */
  def trainCounts(train: DataFrame, labelCol: String, textCol: String, topV: Int): DataFrame = {
    require(topV > 0, s"topV must be positive, got $topV")
    val tok = train.select(col(labelCol).as("label"),
      explode(TextStats.lowerTokensUdf(col(textCol))).as("w"))
    val cnt = tok.groupBy(col("label"), col("w")).agg(count(lit(1)).as("n_wc"))
    val vocab = cnt.groupBy(col("w")).agg(sum(col("n_wc")).as("g"))
      .orderBy(col("g").desc, col("w")).limit(topV).select("w")
    cnt.join(broadcast(vocab), Seq("w")).select("label", "w", "n_wc")
  }

  /** The broadcastable model: sorted class labels, per-class totals N_c,
    * and token -> per-class count rows. Collects only the bounded
    * (<= V*C) count table.
    */
  final case class Model(classes: Array[String], totals: Array[Long],
                         counts: Map[String, Array[Long]]) extends Serializable

  def buildModel(counts: DataFrame): Model = {
    val rows = counts.collect()
    val classes = rows.map(_.getString(0)).distinct.sorted
    val idx = classes.zipWithIndex.toMap
    val m = scala.collection.mutable.Map.empty[String, Array[Long]]
    val totals = new Array[Long](classes.length)
    rows.foreach { case Row(label: String, w: String, n: Long) =>
      val a = m.getOrElseUpdate(w, new Array[Long](classes.length))
      a(idx(label)) += n
      totals(idx(label)) += n
    }
    Model(classes, totals, m.toMap)
  }

  /** Map-only inference: appends `predicted` to `docs`. Argmax of
    * score_c = num_c / N_c by exact cross-multiplication; ties go to the
    * smaller class label (classes are pre-sorted). Classes with N_c = 0
    * score as rational 0/1 so an empty class never divides by zero and
    * never beats a positive score.
    */
  def classify(docs: DataFrame, textCol: String, model: Model): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val predictUdf = udf { (t: String) =>
      val m = bc.value
      val c = m.classes.length
      val nums = new Array[Long](c)
      val ws = if (t == null) Array.empty[String] else TextStats.tokens(t.toLowerCase)
      ws.foreach { w =>
        m.counts.get(w) match {
          case Some(a) =>
            var i = 0
            while (i < c) { nums(i) += a(i); i += 1 }
          case None => ()
        }
      }
      var best = 0
      var i = 1
      while (i < c) {
        // score_i > score_best  <=>  num_i * den_best > num_best * den_i
        // with den = max(N_c, 1) (empty class => exact 0 score)
        val di = math.max(m.totals(i), 1L)
        val db = math.max(m.totals(best), 1L)
        val l = BigInt(nums(i)) * BigInt(db)
        val r = BigInt(nums(best)) * BigInt(di)
        if (l > r) best = i
        i += 1
      }
      m.classes(best)
    }
    docs.withColumn("predicted", predictUdf(col(textCol)))
  }

  /** Train on `train`, classify `test`, return the confusion matrix
    * (actual, predicted, n, sum of ids — pins exact set membership).
    */
  def confusion(train: DataFrame, test: DataFrame, idCol: String,
                labelCol: String, textCol: String, topV: Int): DataFrame = {
    val model = buildModel(trainCounts(train, labelCol, textCol, topV))
    classify(test, textCol, model)
      .groupBy(col(labelCol).as("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"), sum(col(idCol)).as("sum_ids"))
      .orderBy(col("actual"), col("predicted"))
  }
}
