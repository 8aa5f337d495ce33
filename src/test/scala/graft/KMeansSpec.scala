package graft

import graft.operators.KMeans
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Integer-grid Lloyd k-means vs a sequential replay of the same exact
  * integer recurrence (quantize, integer argmin with low-label ties,
  * floorDiv recentering).
  */
class KMeansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-kmeans")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def refLloyd(
      pts: Seq[(Long, Array[Float])],
      k: Int, iters: Int, scale: Long): Map[Long, (Long, Long)] = {
    val q = pts.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * scale).toLong)
    }.sortBy(_._1)
    val dim = q.head._2.length
    var cs: Seq[(Long, Array[Long])] = q.take(k).map { case (id, v) => (id, v.clone()) }
    var assigned: Map[Long, (Long, Long)] = Map.empty
    for (t <- 1 to iters) {
      assigned = q.map { case (id, v) =>
        val best = cs.sortBy(_._1).minBy { case (cl, c) =>
          (c.zip(v).map { case (a, b) => (b - a) * (b - a) }.sum, cl)
        }
        val d = best._2.zip(v).map { case (a, b) => (b - a) * (b - a) }.sum
        id -> (best._1, d)
      }.toMap
      if (t < iters) {
        cs = assigned.groupBy(_._2._1).toSeq.map { case (cl, members) =>
          val vs = members.keys.toSeq.map(id => q.find(_._1 == id).get._2)
          val n = vs.size.toLong
          (cl, Array.tabulate(dim)(i => Math.floorDiv(vs.map(_(i)).sum, n)))
        }
      }
    }
    assigned
  }

  test("lloydIntGrid matches the sequential integer replay; partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pts = (0L until 60L).map(id =>
      (id, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)))
    val df = pts.toDF("vec_id", "embedding")
    val got = KMeans.lloydIntGrid(df, "vec_id", "embedding", k = 4, iters = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val want = refLloyd(pts, k = 4, iters = 3, scale = 100L)
    assert(got === want)
    val got2 = KMeans.lloydIntGrid(df.repartition(7), "vec_id", "embedding", k = 4, iters = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got2 === want)
  }

  test("ties assign to the lowest centroid label; empty clusters die") {
    import spark.implicits._
    // two coincident init points (0 and 1): every vector is equidistant to
    // both, so ALL rows must go to centroid 0 and cluster 1 must be empty
    // after round 1 — and stay dead through the next round's recenter.
    val pts = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0f, 0f)),
      (2L, Array(1f, 1f)), (3L, Array(-1f, 2f)))
    val out = KMeans.lloydIntGrid(pts.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 2, iters = 2)
      .as[(Long, Long, Long)].collect()
    assert(out.forall(_._2 == 0L))
    // recentered grid centroid = floorDiv of sums over all 4 points:
    // dim0: (0+0+100-100)/4 = 0; dim1: (0+0+100+200)/4 = 75
    val d2 = out.find(_._1 == 2L).get._3
    assert(d2 == (100L - 0L) * (100L - 0L) + (100L - 75L) * (100L - 75L))
  }

  test("rejects k larger than the corpus and malformed vectors") {
    import spark.implicits._
    val tiny = Seq((0L, Array(1f, 2f))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      KMeans.lloydIntGrid(tiny, "vec_id", "embedding", k = 3, iters = 1)
    }
    assert(ex.getMessage.contains("need at least"))
    val bad = Seq((0L, Array(1f, 2f)), (1L, Array(1f, 2f, 3f)))
      .toDF("vec_id", "embedding")
    val ex2 = intercept[Exception] {
      KMeans.lloydIntGrid(bad, "vec_id", "embedding", k = 1, iters = 1).collect()
    }
    assert(ex2.getMessage.contains("dimensionality") ||
      ex2.getCause != null)
  }
}
