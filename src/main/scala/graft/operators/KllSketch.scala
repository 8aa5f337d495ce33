package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Serialized KLL state: `levels(i)` holds items of weight 2^i, filled to
  * `sizes(i)` (spare capacity beyond the fill is garbage and ignored —
  * arrays grow geometrically so serialized spare is bounded at ~2× fill).
  * `coin` is the deterministic compaction-parity state.
  */
final case class KllBuf(
    k: Int,
    var n: Long,
    var coin: Long,
    var levels: Array[Array[Long]],
    var sizes: Array[Int])

/** Mergeable streaming quantile sketch (Karnin–Lang–Liberty compactor
  * hierarchy) — completes the sketch family next to Misra–Gries
  * (heavy hitters), HyperLogLog (distinct) and count-min (frequency):
  * rank/quantile/percentile queries over 10^12 values in one pass with
  * O(k·log(n/k)) memory per partition and an associative merge, where the
  * exact path (`q_median`'s full sort) would shuffle the whole column.
  *
  * Compactor hierarchy: level i holds items of weight 2^i. When the
  * structure exceeds its budget, the lowest over-capacity level is sorted
  * and every other item (random parity) is promoted to level i+1 at double
  * weight; the rest are discarded. Capacities decay geometrically from the
  * top level (max(⌈k·(2/3)^depth⌉, 8)), giving the KLL rank-error bound
  * O(1/k) with high probability (Karnin, Lang, Liberty, FOCS 2016). An odd
  * item at compaction stays behind at its level, so TOTAL WEIGHT IS
  * PRESERVED EXACTLY: Σ items·2^level == n always, which makes rank
  * targeting (`ceil(φ·n)`) exact arithmetic, not an estimate of n.
  *
  * EXACTNESS WINDOW (the oracle contract): while n ≤ k the sketch is a
  * plain buffer — level 0's capacity is ≥ k when it is the only level, and
  * merge concatenates level-0 buffers before any compaction check — so
  * quantiles are EXACT (identical to a full sort) no matter how the input
  * was partitioned. The driver query runs k ≫ corpus rows and is
  * oracle-checked against the full-sort answer; the property spec runs
  * n ≫ k to exercise real compaction against the paper's error bound.
  *
  * Determinism: compaction parity comes from a splitmix64 walk of `coin`
  * seeded by construction — deterministic for a fixed operation order.
  * Across runs, Spark's partition-merge order can vary, so POST-COMPACTION
  * results are run-stable only in distribution (the error bound holds for
  * every coin sequence); the exactness window is order-independent.
  */
object KllSketch {

  def empty(k: Int): KllBuf = {
    require(k >= 8, s"KllSketch: k must be >= 8, got $k")
    KllBuf(k, 0L, 0x9E3779B97F4A7C15L, Array(new Array[Long](16)), Array(0))
  }

  /** Capacity of `level` when the hierarchy currently has `h` levels. */
  private def cap(k: Int, level: Int, h: Int): Int = {
    val raw = k * math.pow(2.0 / 3.0, (h - 1 - level).toDouble)
    math.max(math.ceil(raw).toInt, 8)
  }

  private def ensureRoom(b: KllBuf, level: Int, extra: Int): Unit = {
    if (level >= b.levels.length) {
      b.levels = b.levels ++ Array.fill(level - b.levels.length + 1)(new Array[Long](16))
      b.sizes = b.sizes ++ Array.fill(level - b.sizes.length + 1)(0)
    }
    val need = b.sizes(level) + extra
    if (need > b.levels(level).length) {
      var cap2 = math.max(b.levels(level).length * 2, 16)
      while (cap2 < need) cap2 *= 2
      b.levels(level) = java.util.Arrays.copyOf(b.levels(level), cap2)
    }
  }

  def insert(b: KllBuf, v: Long): KllBuf = {
    ensureRoom(b, 0, 1)
    b.levels(0)(b.sizes(0)) = v
    b.sizes(0) += 1
    b.n += 1
    compactIfNeeded(b)
    b
  }

  /** Associative merge: concatenates per-level buffers, then compacts only
    * if over budget — two exact sketches whose union still fits stay exact.
    */
  def merge(a: KllBuf, b: KllBuf): KllBuf = {
    require(a.k == b.k, s"KllSketch.merge: mismatched k (${a.k} vs ${b.k})")
    var i = 0
    while (i < b.levels.length) {
      if (b.sizes(i) > 0) {
        ensureRoom(a, i, b.sizes(i))
        System.arraycopy(b.levels(i), 0, a.levels(i), a.sizes(i), b.sizes(i))
        a.sizes(i) += b.sizes(i)
      }
      i += 1
    }
    a.n += b.n
    a.coin = graft.functions.TextStats.mix64(a.coin ^ b.coin)
    compactIfNeeded(a)
    a
  }

  private def totalSize(b: KllBuf): Long = {
    var s = 0L; var i = 0
    while (i < b.sizes.length) { s += b.sizes(i); i += 1 }
    s
  }

  private def budget(b: KllBuf): Long = {
    val h = b.levels.length
    var s = 0L; var i = 0
    while (i < h) { s += cap(b.k, i, h); i += 1 }
    s
  }

  private def compactIfNeeded(b: KllBuf): Unit = {
    while (totalSize(b) > budget(b)) {
      val h = b.levels.length
      // lowest over-capacity level; fall back to the lowest level with >= 2
      // items (guaranteed to exist when over budget, so progress is certain)
      var target = -1
      var i = 0
      while (i < h && target < 0) {
        if (b.sizes(i) > cap(b.k, i, h)) target = i
        i += 1
      }
      if (target < 0) {
        i = 0
        while (i < h && target < 0) { if (b.sizes(i) >= 2) target = i; i += 1 }
      }
      require(target >= 0, "KllSketch: over budget with no compactable level")
      // termination guard: every compaction strictly shrinks the structure
      // (promotes pairs/2, discards pairs/2), so the loop is bounded by the
      // current size — an iteration COUNT cap would mis-fire at 10^12-value
      // heights, where a merge cascade legitimately compacts ~2 levels deep
      // per level of the hierarchy
      val before = totalSize(b)
      compactLevel(b, target)
      require(totalSize(b) < before,
        s"KllSketch: compaction of level $target made no progress")
    }
  }

  /** Sort the level, promote every other item (random parity) at doubled
    * weight, keep an odd straggler in place — total weight invariant.
    */
  private def compactLevel(b: KllBuf, level: Int): Unit = {
    val m = b.sizes(level)
    val buf = b.levels(level)
    java.util.Arrays.sort(buf, 0, m)
    b.coin = graft.functions.TextStats.mix64(b.coin + (level.toLong << 32) + m)
    val off = (b.coin & 1L).toInt
    val pairs = m & ~1
    val promoted = pairs / 2
    ensureRoom(b, level + 1, promoted)
    var j = off
    var w = b.sizes(level + 1)
    while (j < pairs) {
      b.levels(level + 1)(w) = buf(j)
      w += 1
      j += 2
    }
    b.sizes(level + 1) = w
    if (m > pairs) { // odd straggler stays at this level
      buf(0) = buf(m - 1)
      b.sizes(level) = 1
    } else b.sizes(level) = 0
  }

  /** φ-quantiles by exact rank targeting: the smallest item whose cumulative
    * weight reaches max(1, ceil(φ·n)). φ=0 → min, φ=1 → max.
    */
  def quantiles(b: KllBuf, phis: Array[Double]): Array[Long] = {
    require(b.n > 0, "KllSketch.quantiles on an empty sketch")
    val (items, weights) = weighted(b)
    phis.map { phi =>
      require(phi >= 0.0 && phi <= 1.0, s"quantile out of range: $phi")
      val target = math.max(1L, math.ceil(phi * b.n).toLong)
      var cum = 0L
      var i = 0
      var ans = items(items.length - 1)
      var found = false
      while (i < items.length && !found) {
        cum += weights(i)
        if (cum >= target) { ans = items(i); found = true }
        i += 1
      }
      ans
    }
  }

  /** Estimated rank of `v` (count of items <= v) — the property-test probe. */
  def estimateRank(b: KllBuf, v: Long): Long = {
    val (items, weights) = weighted(b)
    var r = 0L
    var i = 0
    while (i < items.length && items(i) <= v) { r += weights(i); i += 1 }
    r
  }

  private def weighted(b: KllBuf): (Array[Long], Array[Long]) = {
    val total = totalSize(b).toInt
    val items = new Array[Long](total)
    val weights = new Array[Long](total)
    var o = 0
    var lv = 0
    while (lv < b.levels.length) {
      var i = 0
      while (i < b.sizes(lv)) {
        items(o) = b.levels(lv)(i)
        weights(o) = 1L << lv
        o += 1
        i += 1
      }
      lv += 1
    }
    // sort by item, carrying weights
    val idx = (0 until total).sortBy(i => items(i))
    (idx.map(i => items(i)).toArray, idx.map(i => weights(i)).toArray)
  }

  /** Typed aggregator over a LONG column: finish() emits the φ-quantile
    * values in `phis` order. Buffers are mutated in place (Spark's object
    * aggregation holds them on-heap between reduce calls; the encoder only
    * runs at spill/shuffle boundaries).
    */
  final case class KllAgg(k: Int, phis: Seq[Double])
      extends Aggregator[Long, KllBuf, Seq[Long]] {
    def zero: KllBuf = KllSketch.empty(k)
    def reduce(b: KllBuf, v: Long): KllBuf = KllSketch.insert(b, v)
    def merge(a: KllBuf, b: KllBuf): KllBuf = KllSketch.merge(a, b)
    def finish(b: KllBuf): Seq[Long] =
      KllSketch.quantiles(b, phis.toArray).toSeq
    def bufferEncoder: Encoder[KllBuf] = ExpressionEncoder[KllBuf]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** The incremental-statistics pair: [[KllBufAgg]] finishes to the RAW
    * sketch (one row per commit/partition — the artifact a manifest stores
    * next to its data files), and [[KllMergeAgg]] folds stored sketches
    * into corpus-level quantiles. Together they maintain corpus statistics
    * WITHOUT rescans: each new commit contributes one sketch build over its
    * own batch, and any later stats query merges the per-commit rows —
    * associativity (KllSketch.merge) makes merge(batch sketches) ==
    * sketch(all data), which the t_stats_incremental oracle pins exactly
    * in the exactness window.
    */
  final case class KllBufAgg(k: Int)
      extends Aggregator[Long, KllBuf, KllBuf] {
    def zero: KllBuf = KllSketch.empty(k)
    def reduce(b: KllBuf, v: Long): KllBuf = KllSketch.insert(b, v)
    def merge(a: KllBuf, b: KllBuf): KllBuf = KllSketch.merge(a, b)
    def finish(b: KllBuf): KllBuf = b
    def bufferEncoder: Encoder[KllBuf] = ExpressionEncoder[KllBuf]()
    def outputEncoder: Encoder[KllBuf] = ExpressionEncoder[KllBuf]()
  }

  final case class KllMergeAgg(k: Int, phis: Seq[Double])
      extends Aggregator[KllBuf, KllBuf, Seq[Long]] {
    def zero: KllBuf = KllSketch.empty(k)
    def reduce(b: KllBuf, s: KllBuf): KllBuf = KllSketch.merge(b, s)
    def merge(a: KllBuf, b: KllBuf): KllBuf = KllSketch.merge(a, b)
    def finish(b: KllBuf): Seq[Long] =
      KllSketch.quantiles(b, phis.toArray).toSeq
    def bufferEncoder: Encoder[KllBuf] = ExpressionEncoder[KllBuf]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }
}
