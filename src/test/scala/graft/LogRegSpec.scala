package graft

import graft.operators.LogReg
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integer-exact hard-sigmoid GD trainer, validated against a sequential
  * replay of the recurrence (the same discipline as the PageRank specs).
  */
class LogRegSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-logreg")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tdiv(a: Long, b: Long): Long = a / b // JVM / truncates toward zero

  /** Sequential replay of LogReg.trainHardSigmoid. */
  private def refTrain(rows: Seq[(Long, Array[Long])], epochs: Int, lrDen: Long,
                       scale: Long): Array[Long] = {
    val k = rows.head._2.length
    val n = rows.size.toLong
    var w = Array.fill(k)(0L)
    for (_ <- 1 to epochs) {
      val g = Array.fill(k)(0L)
      for ((y, x) <- rows) {
        val z = (0 until k).map(i => w(i) * x(i)).sum
        val p = math.max(0L, math.min(scale, scale / 2 + tdiv(z, 4)))
        val err = p - scale * y
        for (i <- 0 until k) g(i) += err * x(i)
      }
      w = w.indices.map(i => w(i) - tdiv(g(i), n * lrDen)).toArray
    }
    w
  }

  // a linearly separable toy set: y = 1 iff x1 > 0 (bias + one signed feature)
  private val toy: Seq[(Long, Array[Long])] = Seq(
    (1L, Array(1L, 8L)), (1L, Array(1L, 5L)), (1L, Array(1L, 12L)), (1L, Array(1L, 3L)),
    (0L, Array(1L, -7L)), (0L, Array(1L, -4L)), (0L, Array(1L, -10L)), (0L, Array(1L, -2L)))

  test("trainHardSigmoid matches the sequential integer recurrence; partition-invariant") {
    import spark.implicits._
    val df = toy.map { case (y, x) => (y, x(0), x(1)) }.toDF("y", "x0", "x1")
    val (w, n) = LogReg.trainHardSigmoid(df, Seq("x0", "x1"), "y", epochs = 4, lrDen = 2L)
    assert(n == 8L)
    assert(w.toSeq == refTrain(toy, 4, 2L, 1024L).toSeq)
    val (w2, _) = LogReg.trainHardSigmoid(df.repartition(7), Seq("x0", "x1"), "y",
      epochs = 4, lrDen = 2L)
    assert(w2.toSeq == w.toSeq) // integer sums commute across partitionings
    // and the learned model separates the toy set perfectly
    val preds = df.select($"y", LogReg.predictExpr(Seq("x0", "x1"), w).as("p"))
      .as[(Long, Long)].collect()
    assert(preds.forall { case (y, p) => y == p })
  }

  test("predictExpr replays the clamped decision boundary, incl. the tdiv(-3..-1,4)=0 edge") {
    import spark.implicits._
    // w = [0, 1]: z = x1; p_scaled = clamp(512 + z div 4). z in [-3, -1]
    // truncates to 512 -> predicts 1 even though z < 0 — the documented
    // reason predictExpr must clamp exactly like the trainer.
    val df = Seq(-5L, -4L, -3L, -1L, 0L, 3L, 4L).toDF("x1").withColumn("x0", lit(1L))
    val got = df.select(col("x1"), LogReg.predictExpr(Seq("x0", "x1"), Array(0L, 1L)).as("p"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(-5L -> 0L, -4L -> 0L, -3L -> 1L, -1L -> 1L, 0L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("trainHardSigmoid rejects empty train sets and bad hyperparameters") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("y", "x0", "x1")
    assertThrows[IllegalArgumentException] {
      LogReg.trainHardSigmoid(empty, Seq("x0", "x1"), "y", epochs = 1, lrDen = 2L)
    }
    val df = toy.map { case (y, x) => (y, x(0), x(1)) }.toDF("y", "x0", "x1")
    assertThrows[IllegalArgumentException] {
      LogReg.trainHardSigmoid(df, Seq("x0", "x1"), "y", epochs = 0, lrDen = 2L)
    }
    assertThrows[IllegalArgumentException] {
      LogReg.trainHardSigmoid(df, Seq("x0", "x1"), "y", epochs = 1, lrDen = 2L, scale = 1023L)
    }
  }
}
