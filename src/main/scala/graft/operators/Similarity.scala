package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Brute-force path (the exactness baseline): broadcast the query matrix,
  * one `mapPartitions` pass over the corpus computing partial top-k per
  * query in primitive-array heaps, then a tiny reduce of Q×k candidates —
  * the shuffle carries only per-partition top-k rows (Q·k·P), never the
  * corpus. This is the scalable shape at 10^12 vectors; the cross-join +
  * window alternative would shuffle the whole corpus per query.
  *
  * LSH path (the scale path): hyperplane sign-bit buckets; probe the exact
  * bucket (and optionally all 1-bit neighbors), verify with exact cosine.
  */
object Similarity {

  final case class Neighbor(query_id: Long, neighbor_id: Long, cosine: Double)

  /** Sign-bit signature from `nBits` fixed pseudo-random hyperplanes
    * (deterministic Gaussian-free variant: hyperplane components are ±1
    * derived from splitmix64 of (bit, dim) — adequate for cosine LSH).
    * `seedOffset` selects an independent hyperplane family — the
    * OR-construction tables of [[Dedup.embeddingNearDup]]; offset 0 keeps
    * the original family.
    *
    * The ±1 sign matrix is a pure function of (nBits, seedOffset, dim), so
    * it is derived ONCE per JVM per config and cached, stored as ±1.0f so
    * the per-vector loop is a branchless multiply-accumulate (the naive
    * form pays a splitmix64 mix AND a data-dependent branch per element —
    * at 10^9 vectors x 16 bits x 64 dims that is 10^12 avoidable hash
    * evaluations per table, and the random branch is what actually
    * dominates on modern cores; the micro-probe in BENCH.md quantifies
    * both). Multiplying by exactly ±1.0 is bit-identical to the old
    * add/subtract branch (IEEE-754 sign flip), asserted against the direct
    * derivation in OperatorSpecs.
    */
  def hyperplaneSig(v: Array[Float], nBits: Int, seedOffset: Int = 0): Long = {
    val signs = signMatrix(nBits, seedOffset, v.length)
    var sig = 0L
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      val row = b * v.length
      var i = 0
      while (i < v.length) {
        dot += signs(row + i) * v(i)
        i += 1
      }
      if (dot >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** ±1.0f at (b*dim + i): hyperplane bit `b`'s component at dimension `i`
    * — sign from the low bit of splitmix64((b + seedOffset<<20)*phi + i),
    * exactly the per-element derivation the uncached loop used. One entry
    * per (nBits, seedOffset, dim) config per JVM; executor threads share it.
    */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Float]]()

  private[graft] def signMatrix(nBits: Int, seedOffset: Int, dim: Int): Array[Float] =
    signCache.computeIfAbsent((nBits, seedOffset, dim), { key =>
      val (bits, off, d) = key
      val m = new Array[Float](bits * d)
      var b = 0
      while (b < bits) {
        var i = 0
        while (i < d) {
          val h = graft.functions.TextStats.mix64(
            (b.toLong + (off.toLong << 20)) * 0x9E3779B97F4A7C15L + i.toLong)
          m(b * d + i) = if ((h & 1L) == 1L) 1.0f else -1.0f
          i += 1
        }
        b += 1
      }
      m
    })

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Exact top-k cosine neighbors for each query vector (brute force).
    * `queries` must be small (broadcast); excludes self-matches by id.
    */
  def knnBrute(
      corpus: Dataset[(Long, Array[Float])],
      queries: Array[(Long, Array[Float])],
      k: Int
  ): Dataset[Neighbor] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bq = spark.sparkContext.broadcast(queries)
    val partial: Dataset[Neighbor] = corpus.mapPartitions { it =>
      val qs = bq.value
      // worst-first comparator: lower cosine is worse; exact cosine ties
      // broken by HIGHER neighbor_id being worse — identical to the final
      // (-cosine, neighbor_id) sort, so partition iteration order can never
      // change which of two tied candidates survives the heap
      val worstFirst: java.util.Comparator[Neighbor] = (x: Neighbor, y: Neighbor) => {
        val c = java.lang.Double.compare(x.cosine, y.cosine)
        if (c != 0) c else java.lang.Long.compare(y.neighbor_id, x.neighbor_id)
      }
      // per-query bounded min-heaps (size k) over this partition
      val heaps = Array.fill(qs.length)(new java.util.PriorityQueue[Neighbor](k + 1, worstFirst))
      it.foreach { case (id, vec) =>
        var qi = 0
        while (qi < qs.length) {
          val (qid, qv) = qs(qi)
          if (qid != id && qv.length == vec.length) {
            val c = cosine(qv, vec)
            val h = heaps(qi)
            val cand = Neighbor(qid, id, c)
            if (h.size < k) h.add(cand)
            else if (worstFirst.compare(h.peek(), cand) < 0) { h.poll(); h.add(cand) }
          }
          qi += 1
        }
      }
      heaps.iterator.flatMap(h => scala.jdk.CollectionConverters.IteratorHasAsScala(h.iterator()).asScala)
    }
    // final reduce: only Q·k·P rows reach this tiny aggregation
    partial
      .groupByKey(_.query_id)
      .flatMapGroups { (_, ns) =>
        ns.toSeq
          .sortBy(n => (-n.cosine, n.neighbor_id))
          .take(k)
          .iterator
      }
  }

  /** Deterministic Lloyd k-means for the IVF coarse quantizer: init = the
    * first k sample vectors (callers pass an id-ordered sample, so the init
    * is reproducible), FIXED iteration count (no convergence branch), empty
    * cells keep their previous centroid, accumulation in fixed index order.
    */
  /** Deterministic hash-bounded training sample: a global
    * orderBy(id).limit would be a full TakeOrdered over the corpus at
    * 10^12 rows. pmod(xxhash64(id), m) keeps ~maxSample/2 expected rows
    * in one map-only pass; the driver-side sort of that bounded set (not
    * the corpus) restores a reproducible order for centroid seeding. At
    * test scale m = 1, so the sample is the whole id-ordered table.
    * `countHint` MUST be an upper bound (a manifest row count, or the
    * catalog's statistics) — it skips the sizing pass, and an
    * over-estimate just thins the sample. An UNDER-estimate is
    * dangerous: the modulus comes out too small, the "sample" balloons
    * toward the whole corpus on the driver, and take(maxSample)
    * degrades to an id-prefix instead of a hash-spread subset. The
    * tripwire turns that silent skew into a loud error. Shared by the
    * IVF and PQ index builds.
    */
  private def boundedSample(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      maxSample: Int,
      countHint: Option[Long]
  ): Array[Array[Float]] = {
    val spark = embs.sparkSession
    import spark.implicits._
    val n = countHint.getOrElse(embs.count())
    val mod = math.max(1L, math.ceil(2.0 * n / maxSample).toLong)
    val sampled = embs
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .filter(pmod(xxhash64(col("id")), lit(mod)) === 0)
      .as[(Long, Array[Float])]
      .collect()
    require(sampled.length <= 8 * maxSample,
      s"boundedSample drew ${sampled.length} rows for maxSample=$maxSample — " +
        s"countHint ($countHint) is far below the actual row count; pass an upper bound")
    sampled.sortBy(_._1).take(maxSample).map(_._2)
  }

  def kmeansCentroids(sample: Array[Array[Float]], k: Int, iters: Int = 10): Array[Array[Float]] = {
    require(sample.nonEmpty, "empty kmeans sample")
    val kk = math.min(k, sample.length)
    val dim = sample(0).length
    var centroids = Array.tabulate(kk)(i => sample(i).map(_.toDouble))
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      var s = 0
      while (s < sample.length) {
        val c = nearestCentroid(sample(s), centroids)
        var d = 0
        while (d < dim) { sums(c)(d) += sample(s)(d); d += 1 }
        counts(c) += 1
        s += 1
      }
      centroids = Array.tabulate(kk) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
      it += 1
    }
    centroids.map(_.map(_.toFloat))
  }

  /** Index of the nearest centroid by L2; ties break to the lowest index. */
  def nearestCentroid(v: Array[Float], centroids: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      var d = 0.0
      var i = 0
      val ct = centroids(c)
      while (i < v.length) { val x = v(i) - ct(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The `nProbe` nearest cells for a query, ordered; ties by cell index. */
  def probeCells(v: Array[Float], centroids: Array[Array[Double]], nProbe: Int): Array[Int] = {
    val ds = centroids.indices.map { c =>
      var d = 0.0
      var i = 0
      val ct = centroids(c)
      while (i < v.length) { val x = v(i) - ct(i); d += x * x; i += 1 }
      (d, c)
    }
    ds.sortBy(identity).take(math.min(nProbe, centroids.length)).map(_._2).toArray
  }

  /** IVF ANN (the second scale path, alongside [[knnLsh]]): a k-means coarse
    * quantizer partitions the corpus into `nCells` inverted lists; each
    * query probes its `nProbe` nearest cells and exact-cosine-verifies only
    * those lists. Cost per query ~ nProbe/nCells of the corpus; recall is
    * tuned by nProbe (nProbe = nCells degenerates to exact brute force).
    *
    * Scale shape: centroids come from a BOUNDED id-ordered sample
    * (`maxSample` rows collected once — at 10^12 vectors the sample, not
    * the corpus, fits the driver), assignment is a map-only stage, and the
    * probe join shuffles only (cell, query) pairs. At real scale nCells ~
    * sqrt(N) keeps lists O(sqrt(N)).
    */
  def knnIvf(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      maxSample: Int = 10000,
      countHint: Option[Long] = None
  ): DataFrame = {
    import graft.functions.expressions.cosine_sim
    val spark = embs.sparkSession
    import spark.implicits._
    val sample = boundedSample(embs, idCol, vecCol, maxSample, countHint)
    val centroids = kmeansCentroids(sample, nCells)
    val bc = spark.sparkContext.broadcast(centroids.map(_.map(_.toDouble)))
    val cellUdf = udf((v: Seq[Float]) => nearestCentroid(v.toArray, bc.value))
    val probeUdf = udf((v: Seq[Float]) => probeCells(v.toArray, bc.value, nProbe))
    val c = embs.select(col(idCol).as("nid"), col(vecCol).as("nv"), cellUdf(col(vecCol)).as("cell"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"), explode(probeUdf(col(vecCol))).as("cell"))
    val cand = q
      .join(c, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine_sim(col("qv"), col("nv")).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid")
      .orderBy(col("cosine").desc, col("nid").asc)
    cand
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** LSH-bucketed ANN with MULTI-PROBE + OR-construction tables:
    * corpus vectors hash to one bucket per table (`tables` independent
    * hyperplane families); each query probes its own bucket plus every
    * 1-bit-flip neighbor bucket per table ((nBits+1)*tables probes), which
    * recovers near-misses where one hyperplane puts query and neighbor on
    * opposite sides. Exact cosine verify on the deduped candidates,
    * per-query top-k (deterministic tie-break by nid).
    *
    * Recall model (per true neighbor at angle θ, p = 1-θ/π):
    * hit/table = p^nBits + nBits·p^(nBits-1)(1-p); miss = (1-hit)^tables —
    * recall is tuned by ADDING TABLES, never by shrinking nBits (which makes
    * buckets quadratic). Cost: each query touches ~tables·(nBits+1)·N/2^nBits
    * corpus rows in expectation — at nBits=16, tables=8 that is 0.2% of a
    * 10^9-vector corpus. Quantified recall vs knnBrute is asserted in
    * OperatorSpecs on the synthetic embeddings.
    */
  def knnLsh(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      k: Int,
      nBits: Int = 8,
      tables: Int = 8,
      multiProbe: Boolean = true
  ): DataFrame = {
    import graft.functions.expressions.cosine_sim
    val sigUdf = udf { (v: Seq[Float]) =>
      val a = v.toArray
      Array.tabulate(tables)(t => (t.toLong << 56) | hyperplaneSig(a, nBits, seedOffset = t))
    }
    val probeUdf = udf { (v: Seq[Float]) =>
      val a = v.toArray
      Array.tabulate(tables) { t =>
        val sig = (t.toLong << 56) | hyperplaneSig(a, nBits, seedOffset = t)
        if (multiProbe) sig +: Array.tabulate(nBits)(b => sig ^ (1L << b)) else Array(sig)
      }.flatten
    }
    val c = embs.select(col(idCol).as("nid"), col(vecCol).as("nv"), explode(sigUdf(col(vecCol))).as("bucket"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"), explode(probeUdf(col(vecCol))).as("bucket"))
    val cand = q
      .join(c, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .dropDuplicates("qid", "nid") // a pair can match via several probes
      .select(col("qid"), col("nid"), cosine_sim(col("qv"), col("nv")).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid")
      .orderBy(col("cosine").desc, col("nid").asc)
    cand
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Max-abs symmetric int8 quantization of a vector: q_i = round(v_i ·
    * 127/maxAbs). The scale is per-vector, so cosine needs no dequant — it
    * is scale-invariant and the int dot product over (qa, qb) preserves
    * ordering up to ~1/254 relative error per component.
    */
  def quantizeSq8(v: Array[Float]): Array[Byte] = {
    var maxAbs = 0.0f
    var i = 0
    while (i < v.length) { val a = math.abs(v(i)); if (a > maxAbs) maxAbs = a; i += 1 }
    val s = if (maxAbs == 0.0f) 0.0f else 127.0f / maxAbs
    val out = new Array[Byte](v.length)
    i = 0
    while (i < v.length) { out(i) = math.round(v(i) * s).toByte; i += 1 }
    out
  }

  /** Cosine over int8-quantized vectors — integer multiply-accumulate (the
    * SIMD-friendly inner loop a production int8 index runs), normalized in
    * double at the end.
    */
  def cosineSq8(a: Array[Byte], b: Array[Byte]): Double = {
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < a.length) {
      dot += a(i).toLong * b(i); na += a(i).toLong * a(i); nb += b(i).toLong * b(i)
      i += 1
    }
    if (na == 0L || nb == 0L) -1.0
    else dot / math.sqrt(na.toDouble * nb.toDouble)
  }

  /** Scalar-quantized (int8) ANN — the memory-side scale lever the LSH/IVF
    * paths don't touch: a 10^9×64-float corpus is 256 GB of vectors, its
    * int8 form 64 GB (4×), which is the difference between an index that
    * fits executor memory and one that thrashes. Two stages:
    *
    *  1. QUANTIZED SCAN — one `mapPartitions` pass over the corpus scoring
    *     int8 cosine against the broadcast (quantized) queries into bounded
    *     per-query heaps of `k·overfetch` candidates; only Q·k·overfetch·P
    *     (id, approx) rows leave the pass (the knnBrute shuffle shape, never
    *     the corpus). In production the int8 codes are the STORED index and
    *     the floats stay in cold storage; here they are derived on the fly
    *     from the same rows, which adds a quantize per row but keeps the
    *     measured loop the integer one.
    *  2. EXACT RERANK — the winning candidate ids (a few hundred) are
    *     broadcast-semi-joined back to the corpus and scored with float
    *     cosine; final top-k by exact score. Rerank makes the result exact
    *     whenever the true top-k survive stage 1 — measured 100% vs
    *     knnBrute on the synthetic embeddings at both verify scales with
    *     overfetch 4 (planted near-dup families and all; asserted in
    *     TemporalQuantileSpec, oracle-checked by the shared brute-force
    *     rank SQL).
    *
    * Returns (qid, nid, cosine) with EXACT cosine, top-k per query.
    */
  def knnSq8(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Array[(Long, Array[Float])],
      k: Int,
      overfetch: Int = 4
  ): DataFrame = {
    require(k >= 1 && overfetch >= 1, s"knnSq8: bad k=$k overfetch=$overfetch")
    val spark = embs.sparkSession
    import spark.implicits._
    val m = k * overfetch
    val corpus = embs.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
    val bq = spark.sparkContext.broadcast(queries.map { case (id, v) => (id, quantizeSq8(v)) })
    // stage 1: int8 scan, bounded heaps of (approx, nid) per query
    val partial = corpus.mapPartitions { it =>
      val qs = bq.value
      val worstFirst: java.util.Comparator[(Long, Long, Double)] =
        (x: (Long, Long, Double), y: (Long, Long, Double)) => {
          val c = java.lang.Double.compare(x._3, y._3)
          if (c != 0) c else java.lang.Long.compare(y._2, x._2)
        }
      val heaps = Array.fill(qs.length)(
        new java.util.PriorityQueue[(Long, Long, Double)](m + 1, worstFirst))
      it.foreach { case (id, vec) =>
        val qv = quantizeSq8(vec)
        var qi = 0
        while (qi < qs.length) {
          val (qid, q8) = qs(qi)
          if (qid != id && q8.length == qv.length) {
            val approx = cosineSq8(q8, qv)
            val h = heaps(qi)
            val cand = (qid, id, approx)
            if (h.size < m) h.add(cand)
            else if (worstFirst.compare(h.peek(), cand) < 0) { h.poll(); h.add(cand) }
          }
          qi += 1
        }
      }
      heaps.iterator.flatMap(h =>
        scala.jdk.CollectionConverters.IteratorHasAsScala(h.iterator()).asScala)
    }.toDF("qid", "nid", "approx")
    // reduce partials to the global candidate set per query
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("approx").desc, col("nid").asc)
    val candIds = partial
      .withColumn("rn", row_number().over(wa))
      .filter(col("rn") <= m)
      .select(col("qid"), col("nid"))
    // stage 2: broadcast the tiny candidate set, exact-rerank on the floats
    val bqf = spark.sparkContext.broadcast(queries)
    val exact = udf { (qid: Long, nv: Seq[Float]) =>
      bqf.value.find(_._1 == qid).map(q => cosine(q._2, nv.toArray)).getOrElse(-2.0)
    }
    val we = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cosine").desc, col("nid").asc)
    embs.select(col(idCol).cast("long").as("nid"), col(vecCol).as("nv"))
      .join(broadcast(candIds), Seq("nid"))
      .select(col("qid"), col("nid"), exact(col("qid"), col("nv")).as("cosine"))
      .withColumn("rn", row_number().over(we))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Sign-bit binarization of a vector: bit i set iff v_i >= 0, packed
    * into ceil(dim/64) longs. The most aggressive quantization tier —
    * 32x smaller than float32 PER COMPONENT (1 bit vs 4 bytes), so a
    * dim=64 corpus indexes at 8 bytes/vector. Hamming distance between
    * sign patterns is a monotone proxy for angular distance (each
    * differing bit is a hyperplane — here a coordinate axis — separating
    * the two vectors; cf. the random-hyperplane LSH bound, Charikar 2002):
    * XOR + popcount, the cheapest candidate-generation loop that exists.
    */
  def binarizeSign(v: Array[Float]): Array[Long] = {
    val out = new Array[Long]((v.length + 63) >>> 6)
    var i = 0
    while (i < v.length) {
      if (v(i) >= 0.0f) out(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    out
  }

  /** nWords·64-bit hyperplane sign sketch: word w is [[hyperplaneSig]] at
    * seedOffset w, so the sketch can carry MORE bits than the vector has
    * dimensions — the resolution knob raw coordinate signs
    * ([[binarizeSign]]) lack (measured: dim=64 coordinate signs never
    * reach rerank parity on near-uniform vectors; 512 projection bits
    * do at overfetch 16, with nb=512/of=8 already down to <=1 missed
    * query per scale). Uses the cached ±1 sign matrix, so each word is pure adds.
    */
  def binarySketch(v: Array[Float], nWords: Int): Array[Long] =
    Array.tabulate(nWords)(w => hyperplaneSig(v, 64, seedOffset = w))

  /** The float query's projections onto the same nWords·64 hyperplanes,
    * laid out to index-align with [[binarySketch]] bits (word w bit b ↔
    * slot w·64+b) — the asymmetric side of the scorer: the index stores
    * only sign bits, the query keeps the projection magnitudes.
    */
  def querySketchProj(q: Array[Float], nWords: Int): Array[Float] = {
    val p = new Array[Float](nWords << 6)
    var w = 0
    while (w < nWords) {
      val signs = signMatrix(64, w, q.length)
      var b = 0
      while (b < 64) {
        var dot = 0.0
        val row = b * q.length
        var i = 0
        while (i < q.length) { dot += signs(row + i) * q(i); i += 1 }
        p((w << 6) + b) = dot.toFloat
        b += 1
      }
      w += 1
    }
    p
  }

  /** Hamming distance between packed sign signatures (equal length). */
  def hammingSig(a: Array[Long], b: Array[Long]): Int = {
    var d = 0; var i = 0
    while (i < a.length) { d += java.lang.Long.bitCount(a(i) ^ b(i)); i += 1 }
    d
  }

  /** Asymmetric binary score: the float QUERY dotted against a stored
    * sign pattern, q · sign(v) = Σ_set q_i − Σ_clear q_i = 2·Σ_set q_i − Σq.
    * Queries are few and stay float; the INDEX is the 1-bit signature.
    * Asymmetric scoring is what makes 1-bit indexes usable: symmetric
    * 64-bit hamming has only 65 distinct values (measured: parity
    * unreachable even at overfetch 64 on the planted near-dup families),
    * while q·sign(v) is real-valued and ranks candidates by the query's
    * own coordinates. Iterates set bits only (tsz loop), plus one
    * precomputed Σq per query.
    */
  def asymBinaryScore(q: Array[Float], qSum: Double, sig: Array[Long]): Double = {
    var setSum = 0.0
    var w = 0
    while (w < sig.length) {
      var bits = sig(w)
      val base = w << 6
      while (bits != 0L) {
        val i = base + java.lang.Long.numberOfTrailingZeros(bits)
        if (i < q.length) setSum += q(i)
        bits &= bits - 1
      }
      w += 1
    }
    2.0 * setSum - qSum
  }

  /** Binary-quantized ANN — the memory-floor tier below [[knnSq8]] (int8)
    * and [[knnPq]] (coded): the stored index is ONE long per 64 dims.
    * Identical two-stage contract:
    *
    *  1. BINARY SCAN — one `mapPartitions` pass scoring each stored sign
    *     pattern ASYMMETRICALLY against the broadcast float queries
    *     (q · sign(v), [[asymBinaryScore]] — symmetric hamming was
    *     measured too coarse: 65 distinct values on 64 bits never reach
    *     rerank parity here) into bounded per-query heaps of
    *     `k·overfetch` candidates (score ties break to the smaller id,
    *     so the candidate set is deterministic under repartition); only
    *     Q·k·overfetch·P (id, approx) rows leave the pass, never the
    *     corpus.
    *  2. EXACT RERANK — candidate ids broadcast-semi-joined back and
    *     scored with float cosine, top-k by exact score. Exact whenever
    *     the true top-k survive stage 1; 1-bit signatures are the
    *     coarsest proxy in the family, so the default overfetch is 16
    *     (vs 4 for int8) — measured 100% top-5 parity vs knnBrute on the
    *     synthetic embeddings at sf0.001/0.01/0.1 with that setting,
    *     oracle-checked by the shared brute-force rank SQL.
    *
    * At 10^9 vectors the signature scan streams 8 GB (dim=64) instead of
    * 256 GB of floats — it fits in the page cache of a small cluster —
    * and the rerank reads only Q·k·overfetch float rows from cold
    * storage. Returns (qid, nid, cosine) with EXACT cosine, top-k per
    * query.
    */
  def knnBq(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Array[(Long, Array[Float])],
      k: Int,
      overfetch: Int = 16,
      nBits: Int = 512
  ): DataFrame = {
    require(k >= 1 && overfetch >= 1, s"knnBq: bad k=$k overfetch=$overfetch")
    require(nBits >= 64 && nBits % 64 == 0, s"knnBq: nBits must be a positive multiple of 64, got $nBits")
    val spark = embs.sparkSession
    import spark.implicits._
    val m = k * overfetch
    val nWords = nBits >>> 6
    val corpus = embs.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
    val bq = spark.sparkContext.broadcast(
      queries.map { case (id, v) =>
        val p = querySketchProj(v, nWords)
        (id, v.length, p, p.foldLeft(0.0)(_ + _))
      })
    // stage 1: packed-long sketch scan, asymmetric projection scoring
    // into bounded per-query heaps
    val partial = corpus.mapPartitions { it =>
      val qs = bq.value
      val worstFirst: java.util.Comparator[(Long, Long, Double)] =
        (x: (Long, Long, Double), y: (Long, Long, Double)) => {
          val c = java.lang.Double.compare(x._3, y._3)
          if (c != 0) c else java.lang.Long.compare(y._2, x._2)
        }
      val heaps = Array.fill(qs.length)(
        new java.util.PriorityQueue[(Long, Long, Double)](m + 1, worstFirst))
      it.foreach { case (id, vec) =>
        val sig = binarySketch(vec, nWords)
        var qi = 0
        while (qi < qs.length) {
          val (qid, qDim, qProj, qSum) = qs(qi)
          if (qid != id && qDim == vec.length) {
            val approx = asymBinaryScore(qProj, qSum, sig)
            val h = heaps(qi)
            val cand = (qid, id, approx)
            if (h.size < m) h.add(cand)
            else if (worstFirst.compare(h.peek(), cand) < 0) { h.poll(); h.add(cand) }
          }
          qi += 1
        }
      }
      heaps.iterator.flatMap(h =>
        scala.jdk.CollectionConverters.IteratorHasAsScala(h.iterator()).asScala)
    }.toDF("qid", "nid", "approx")
    // reduce partials to the global candidate set per query
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("approx").desc, col("nid").asc)
    val candIds = partial
      .withColumn("rn", row_number().over(wa))
      .filter(col("rn") <= m)
      .select(col("qid"), col("nid"))
    // stage 2: broadcast the tiny candidate set, exact-rerank on the floats
    val bqf = spark.sparkContext.broadcast(queries)
    val exact = udf { (qid: Long, nv: Seq[Float]) =>
      bqf.value.find(_._1 == qid).map(q => cosine(q._2, nv.toArray)).getOrElse(-2.0)
    }
    val we = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cosine").desc, col("nid").asc)
    embs.select(col(idCol).cast("long").as("nid"), col(vecCol).as("nv"))
      .join(broadcast(candIds), Seq("nid"))
      .select(col("qid"), col("nid"), exact(col("qid"), col("nv")).as("cosine"))
      .withColumn("rn", row_number().over(we))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Product-quantization ANN (Jégou et al. 2011) — the storage-budget
    * path at 10^9+ vectors: each vector compresses to `m` one-byte
    * codes (per-subspace 256-centroid k-means codebooks trained on a
    * [[boundedSample]]), so a dim=64 float corpus shrinks 32x (256 B ->
    * 8 B/vector). Query scoring is Asymmetric Distance Computation: ONE
    * m x 256 table of subspace dot products per query, after which every
    * candidate costs m table lookups instead of dim multiplies; the
    * approximate cosine divides by the code-reconstructed norm (also
    * table lookups). Overfetched ADC top candidates are exactly
    * reranked on the float vectors — identical contract to [[knnSq8]]:
    * ADC is the recall knob, the rerank restores exact ordering among
    * survivors. In a production index the codes are computed ONCE at
    * ingest and stored; here they are recomputed in the scan because
    * the fixture tables are read-only.
    */
  def knnPq(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Array[(Long, Array[Float])],
      k: Int,
      m: Int = 8,
      overfetch: Int = 8,
      maxSample: Int = 10000,
      countHint: Option[Long] = None
  ): DataFrame = {
    require(k >= 1 && overfetch >= 1 && m >= 1, s"knnPq: bad k=$k overfetch=$overfetch m=$m")
    val spark = embs.sparkSession
    import spark.implicits._
    val sample = boundedSample(embs, idCol, vecCol, maxSample, countHint)
    val dim = sample(0).length
    require(dim % m == 0, s"knnPq: dim $dim not divisible by m=$m")
    val sub = dim / m
    // per-subspace codebooks + per-code squared norms (driver-side train:
    // m * 256 * |sample| * sub work, bounded by maxSample by construction)
    val books: Array[Array[Array[Float]]] = Array.tabulate(m) { s =>
      kmeansCentroids(sample.map(v => java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub)), 256)
    }
    val normSq: Array[Array[Double]] = books.map(_.map { c =>
      var t = 0.0; var i = 0
      while (i < c.length) { t += c(i).toDouble * c(i); i += 1 }
      t
    })
    // per-query ADC dot tables (Q * m * 256 * sub driver work)
    val dts: Array[(Long, Array[Array[Double]])] = queries.map { case (qid, qv) =>
      qid -> Array.tabulate(m) { s =>
        books(s).map { c =>
          var t = 0.0; var i = 0
          while (i < sub) { t += qv(s * sub + i).toDouble * c(i); i += 1 }
          t
        }
      }
    }
    val bb = spark.sparkContext.broadcast((books, normSq, dts))
    val cap = k * overfetch
    val corpus = embs.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
    // stage 1: encode + ADC scan, bounded heaps per query (knnBrute shape)
    val partial = corpus.mapPartitions { it =>
      val (bks, nsq, tables) = bb.value
      val worstFirst: java.util.Comparator[(Long, Long, Double)] =
        (x: (Long, Long, Double), y: (Long, Long, Double)) => {
          val c = java.lang.Double.compare(x._3, y._3)
          if (c != 0) c else java.lang.Long.compare(y._2, x._2)
        }
      val heaps = Array.fill(tables.length)(
        new java.util.PriorityQueue[(Long, Long, Double)](cap + 1, worstFirst))
      it.foreach { case (id, vec) =>
        if (vec.length == bks.length * bks(0)(0).length) {
          // nearest centroid per subspace = the vector's PQ code
          val codes = new Array[Int](bks.length)
          var s = 0
          while (s < bks.length) {
            val book = bks(s)
            var best = 0
            var bestD = Double.MaxValue
            var c = 0
            while (c < book.length) {
              var d = 0.0
              var i = 0
              while (i < book(c).length) {
                val t = vec(s * book(c).length + i) - book(c)(i)
                d += t * t
                i += 1
              }
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            codes(s) = best
            s += 1
          }
          // code-reconstructed norm: query-independent, one pass per row
          var dn = 0.0
          var jn = 0
          while (jn < codes.length) { dn += nsq(jn)(codes(jn)); jn += 1 }
          val invNorm = if (dn == 0.0) 0.0 else 1.0 / math.sqrt(dn)
          var qi = 0
          while (qi < tables.length) {
            val (qid, dt) = tables(qi)
            if (qid != id) {
              var dot = 0.0
              var j = 0
              while (j < codes.length) {
                dot += dt(j)(codes(j))
                j += 1
              }
              val approx = dot * invNorm
              val h = heaps(qi)
              val cand = (qid, id, approx)
              if (h.size < cap) h.add(cand)
              else if (worstFirst.compare(h.peek(), cand) < 0) { h.poll(); h.add(cand) }
            }
            qi += 1
          }
        }
      }
      heaps.iterator.flatMap(h =>
        scala.jdk.CollectionConverters.IteratorHasAsScala(h.iterator()).asScala)
    }.toDF("qid", "nid", "approx")
    // reduce partials, then exact-rerank the floats (same as knnSq8)
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("approx").desc, col("nid").asc)
    val candIds = partial
      .withColumn("rn", row_number().over(wa))
      .filter(col("rn") <= cap)
      .select(col("qid"), col("nid"))
    val bqf = spark.sparkContext.broadcast(queries)
    val exact = udf { (qid: Long, nv: Seq[Float]) =>
      bqf.value.find(_._1 == qid).map(q => cosine(q._2, nv.toArray)).getOrElse(-2.0)
    }
    val we = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cosine").desc, col("nid").asc)
    embs.select(col(idCol).cast("long").as("nid"), col(vecCol).as("nv"))
      .join(broadcast(candIds), Seq("nid"))
      .select(col("qid"), col("nid"), exact(col("qid"), col("nv")).as("cosine"))
      .withColumn("rn", row_number().over(we))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** MMR diversified top-k (Carbonell & Goldstein 1998): greedily pick
    * `selectK` of the query's `poolK` nearest candidates maximizing
    * `0.5*cos(q,d) - 0.5*max_{s in picked} cos(d,s)` — relevance minus
    * redundancy, so a pool stuffed with near-duplicates yields one
    * representative per duplicate family instead of k copies. Lambda is
    * fixed at exactly 1/2 (an exact binary halving, so the oracle's
    * replay of the score tree stays float-faithful).
    *
    * Scale shape: the distributed work is [[knnBrute]]'s pool build
    * (partition-local heaps, Q·poolK·P-row reduce) plus ONE broadcast
    * semi-join fetching the Q·poolK candidate vectors; the greedy loop
    * runs on the driver over poolK rows per query — selectK·poolK dot
    * products of driver work by construction, NOT data-dependent. Ties
    * at every argmax break to the lower neighbor_id; returns
    * (query_id, rank, neighbor_id) in pick order.
    */
  def mmrSelect(
      corpus: Dataset[(Long, Array[Float])],
      queries: Array[(Long, Array[Float])],
      poolK: Int,
      selectK: Int
  ): DataFrame = {
    require(poolK >= selectK, s"poolK ($poolK) must be >= selectK ($selectK)")
    val spark = corpus.sparkSession
    import spark.implicits._
    val pool = knnBrute(corpus, queries, poolK).collect()
    val poolIds = pool.map(_.neighbor_id).toSet
    // one distributed pass fetches the candidate vectors; only Q*poolK
    // rows ever reach the driver
    val vecs = corpus.filter(r => poolIds.contains(r._1)).collect().toMap
    val picked = queries.flatMap { case (qid, _) =>
      val cands = pool.filter(_.query_id == qid)
        .map(n => (n.neighbor_id, n.cosine, vecs(n.neighbor_id)))
        .sortBy { case (nid, rel, _) => (-rel, nid) }
        .toBuffer
      val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
      while (sel.length < selectK && cands.nonEmpty) {
        val best =
          if (sel.isEmpty) cands.head // round 1: pure relevance (list is pre-sorted)
          else cands.minBy { case (nid, rel, nv) =>
            val red = sel.map(s => cosine(vecs(s._3), nv)).max
            (-(0.5 * rel - 0.5 * red), nid)
          }
        sel += ((qid, sel.length + 1, best._1))
        cands -= best
      }
      sel.map { case (q, rank, nid) => (q, rank.toLong, nid) }
    }
    picked.toSeq.toDF("query_id", "rank", "neighbor_id")
      .orderBy($"query_id", $"rank")
  }
}
