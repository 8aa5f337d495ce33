package graft.operators

import graft.functions.expressions.cosine_sim
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication") — embedding-cluster semantic
  * dedup: cluster the corpus in embedding space, then within each cluster
  * drop every document that has a higher-priority semantic duplicate
  * (cosine ≥ eps). Clustering is the paper's cost device: the quadratic
  * pair scan runs per CLUSTER (O(Σ c_k²), with K sized so c_k ≈ N/K stays
  * small), never over the corpus.
  *
  * This is the semantic tier of the dedup ladder — exact
  * ([[Dedup.exactGroups]]) → lexical near-dup ([[Dedup.minhashPairs]]) →
  * semantic (here): two documents saying the same thing in different words
  * share no shingles but sit close in embedding space. Reference analog:
  * none (the reference extracts single documents); this belongs to the
  * LLM-training-data tier layered over SURVEY §2.
  *
  * Cluster assignment is nearest-SEED (argmax cosine against a broadcast
  * centroid array, ties to the lowest centroid id) — a deterministic pure
  * function of the row, so it is map-only, reproducible across jobs, and
  * replayable by the SQL oracle. The paper's k-means centroids drop in by
  * passing trained centroids; nothing in the plan changes. At 10^5
  * centroids × 64 dims × 4 B the broadcast is ~25 MB — still a broadcast,
  * not a join.
  *
  * The dedup rule is the paper's upper-triangle greedy: doc y drops iff
  * SOME doc x in the same cluster with rank(x) < rank(y) has
  * cos(x, y) ≥ eps — x itself need not survive (no transitive closure;
  * that variant is [[Dedup.connectedComponents]] over the pair set). Rank
  * defaults to the id column (deterministic, join-free); the paper ranks
  * by distance from the centroid — pass `rankCol` pointing at any
  * precomputed priority column (smaller = kept first) for that or any
  * other policy.
  *
  * Scale shape: assignment is map-only; the pair scan shuffles once on the
  * cluster key and the within-cluster join is bounded by the largest
  * cluster (size the centroid count so clusters fit a task — the paper
  * runs K = N/5000; a skew-heavy corpus wants AQE skew-join or a salted
  * two-level split of megaclusters). The cosine predicate is the
  * codegen'd [[graft.functions.expressions.cosine_sim]], evaluated inside
  * the join — no UDF boundary in the quadratic loop.
  */
object SemDedup {

  /** Map-only nearest-seed cluster assignment: adds `cluster` = the id of
    * the centroid with the highest cosine (ties → lowest centroid id).
    * Centroids ride the task closure (broadcast by Spark's task
    * serialization; pass sc.broadcast for very large centroid sets).
    * Zero-vector rows (cosine undefined) go to the lowest centroid id.
    */
  def assignClusters(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[(Long, Array[Float])]
  ): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val dim = centroids.head._2.length
    require(centroids.forall(_._2.length == dim),
      "centroids must share one dimensionality")
    // precompute inverse norms once per JVM; cosine argmax over centroids
    // = argmax of dot(v, c)/|c| (|v| is constant per row)
    val cs = centroids.sortBy(_._1)
    val invNorms = cs.map { case (_, c) =>
      val n = math.sqrt(c.foldLeft(0.0)((a, x) => a + x.toDouble * x))
      if (n == 0.0) 0.0 else 1.0 / n
    }
    val assignUdf = udf { (v: Seq[Float]) =>
      // a null or off-dimension embedding is corrupt input — a silent
      // prefix dot product would mis-assign the row with no trace
      require(v != null && v.length == dim,
        s"embedding of length ${if (v == null) "null" else v.length} " +
          s"does not match centroid dimensionality $dim")
      var best = 0
      var bestDot = Double.NegativeInfinity
      var k = 0
      while (k < cs.length) {
        val c = cs(k)._2
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += c(i).toDouble * v(i); i += 1 }
        dot *= invNorms(k)
        if (dot > bestDot) { bestDot = dot; best = k }
        k += 1
      }
      cs(best)._1
    }
    embs.withColumn("cluster", assignUdf(col(vecCol)))
  }

  /** SemDeDup proper: one row per input doc —
    * (idCol, cluster, is_kept). `rankCol` (smaller = higher keep
    * priority, ties broken by id) defaults to the id column.
    */
  def semDeDup(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[(Long, Array[Float])],
      eps: Double,
      rankCol: Option[String] = None
  ): DataFrame = {
    val rk = rankCol.getOrElse(idCol)
    // cached: the argmax UDF is the dominant per-row cost and this frame
    // feeds the drop scan's BOTH sides plus the final outer join — without
    // the cache the assignment would run three times per action
    val assigned = assignClusters(embs, idCol, vecCol, centroids)
      .select(col(idCol).as("id"), col(rk).as("rk"), col("cluster"), col(vecCol).as("v"))
      .cache()
    // within-cluster upper-triangle scan: y drops iff some lower-rank x in
    // the same cluster is eps-close; left-semi keeps only the drop SET
    // (one row per dropped doc, no pair materialization)
    val x = assigned.select(
      col("cluster").as("xcl"), col("rk").as("xrk"), col("id").as("xid"), col("v").as("xv"))
    val drops = assigned
      .join(
        x,
        col("cluster") === col("xcl") &&
          (col("xrk") < col("rk") || (col("xrk") === col("rk") && col("xid") < col("id"))) &&
          cosine_sim(col("v"), col("xv")) >= lit(eps),
        "left_semi")
      .select(col("id"))
    assigned
      .join(drops.withColumn("dropped", lit(true)), Seq("id"), "left")
      .select(col("id").as(idCol), col("cluster"),
        coalesce(!col("dropped"), lit(true)).as("is_kept"))
  }

  /** Seed centroids taken from the corpus itself: the embeddings of the
    * rows whose id is in `seedIds` (collected once — K rows, not a scan).
    */
  def seedCentroids(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      seedIds: Seq[Long]
  ): Array[(Long, Array[Float])] = {
    val rows = embs
      .filter(col(idCol).isin(seedIds: _*))
      .select(col(idCol), col(vecCol))
      .collect()
    require(rows.length == seedIds.distinct.length,
      s"seed ids missing from the corpus: found ${rows.length} of ${seedIds.distinct.length}")
    rows.map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
  }
}
