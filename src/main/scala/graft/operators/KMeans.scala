package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-grid Lloyd k-means over embedding vectors — the clustering
  * primitive the embedding tier leans on (SemDedup cluster structure,
  * IVF coarse quantizers, corpus topic maps). Classic float k-means is
  * not reproducible across engines or partitionings (float sums commute
  * only approximately); this variant makes every step EXACT INTEGER
  * arithmetic so the result is bit-for-bit deterministic and SQL-
  * mirrorable, the same design contract as pagerankInt/hitsInt:
  *
  *   - points are quantized once: q_i = floor(double(e_i) * scale)
  *     (IEEE double multiply + floor — identical in any engine);
  *   - assignment = argmin over centroids of the exact integer squared
  *     L2 distance, ties to the LOWEST centroid label;
  *   - recentering snaps to the integer grid: c_i = floorDiv(sum_i, n)
  *     (floor division, exact) — a deterministic, documented quantization
  *     of the Lloyd mean (error <= 1 grid unit per coordinate per round);
  *   - empty clusters die (standard Lloyd; labels of survivors are
  *     stable: the init point's id).
  *
  * Scale shape: assignment is map-only (centroids ride the task closure
  * — k x dim longs; broadcast explicitly past ~10^5 centroids). The
  * recenter is one shuffle of (cluster, dim) partial sums — posexplode
  * feeds a partial-aggregating groupBy, so each task emits at most
  * k*dim partials regardless of row count — and only k*dim longs ever
  * reach the driver (the k centroid vectors themselves, which the next
  * round's closure needs anyway). Iteration count is a fixed parameter
  * (the production pattern for billion-row corpora: few fixed rounds
  * from a seeded init, not convergence-chasing).
  */
object KMeans {

  /** Run `iters` rounds: assign to current centroids, then (except after
    * the last round) recenter on the integer grid. Returns one row per
    * input: (idCol, cluster: long, sq_dist: long) — the LAST assignment
    * with its exact squared distance. Init centroids are the quantized
    * vectors of the k smallest ids (deterministic, join-free).
    */
  def lloydIntGrid(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      scale: Long = 100L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val q = embs.select(
        col(idCol).cast("long").as("id"),
        transform(col(vecCol),
          x => floor(x.cast("double") * lit(scale.toDouble))).as("q"))
      .cache()
    val init = q.orderBy(col("id")).limit(k)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    require(init.length == k, s"need at least $k points, got ${init.length}")
    val dim = init.head._2.length

    def assignTo(cs: Array[(Long, Array[Long])]): DataFrame = {
      val sorted = cs.sortBy(_._1)
      val assignUdf = udf { (v: Seq[Long]) =>
        require(v != null && v.length == dim,
          s"vector of length ${if (v == null) "null" else v.length} " +
            s"does not match centroid dimensionality $dim")
        var best = 0
        var bestD = Long.MaxValue
        var c = 0
        while (c < sorted.length) {
          val cv = sorted(c)._2
          var d = 0L
          var i = 0
          while (i < dim) { val t = v(i) - cv(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c } // strict: ties keep lowest label
          c += 1
        }
        (sorted(best)._1, bestD)
      }
      q.withColumn("a", assignUdf(col("q")))
        .select(col("id"), col("q"),
          col("a._1").as("cluster"), col("a._2").as("sq_dist"))
    }

    var centroids = init
    var assigned: DataFrame = null
    for (t <- 1 to iters) {
      assigned = assignTo(centroids)
      if (t < iters) {
        // one shuffle: (cluster, dim) partial sums + per-cluster counts
        val sums = assigned
          .select(col("cluster"), posexplode(col("q")).as(Seq("i", "v")))
          .groupBy("cluster", "i").agg(sum("v").as("s"))
        val cnts = assigned.groupBy("cluster").agg(count(lit(1)).as("n"))
        val rows = sums.join(cnts, "cluster")
          .collect() // k*dim rows — the centroid vectors themselves
        centroids = rows.groupBy(_.getLong(0)).toArray.map { case (cl, rs) =>
          val v = new Array[Long](dim)
          rs.foreach { r =>
            v(r.getInt(1)) = Math.floorDiv(r.getLong(2), r.getLong(3))
          }
          (cl, v)
        }
      }
    }
    assigned.select(col("id").as(idCol), col("cluster"), col("sq_dist"))
  }
}
