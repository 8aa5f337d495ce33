package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Z-order (Morton-curve) clustering for multi-column data-skipping — the
  * lakehouse OPTIMIZE ZORDER BY shape: rows whose (a, b) are close land in
  * the same target file, so per-file min/max statistics prune 2-D
  * predicate boxes that a single-column sort cannot. The reference engine
  * scans whole directories; at 100 TB the dominant cost is the files you
  * do NOT read, and clustering quality decides that.
  *
  * Pipeline: per-column rank buckets (value-deterministic: equal values
  * share a bucket by construction, so the layout is reproducible across
  * engines) → bit-interleaved z-value (pure codegen'd shift/mask
  * arithmetic, no UDF) → range-partition by z-value into target files.
  *
  * Scale shape: the rank pass is one sort per clustering column at this
  * scale; the production variant swaps exact percent_rank for sampled
  * range boundaries (Delta OPTIMIZE's range_partition_id does exactly
  * this) and keeps the interleave + assignment stages unchanged. The
  * z-sort itself is the same exchange a plain ORDER BY write pays.
  */
object ZOrder {

  /** Value-deterministic rank bucket in [0, 2^bits): equal values get
    * equal buckets (SQL rank() tie semantics — rank(v) = rows with value
    * < v, plus one; percent_rank = (rank-1)/(n-1)), so bucketing is
    * stable under row-order nondeterminism and mirrors exactly in any
    * engine with percent_rank().
    *
    * Distributed: ranks are computed over the PER-VALUE count frame
    * (bounded by distinct values, not rows) via the same quantile-bucket
    * prefix-sum scaffold the packing tier uses — no global window — and
    * joined back by value. `valueCol` must be integral (the scaffold
    * keys on longs).
    */
  def withRankBucket(
      df: DataFrame, valueCol: String, outCol: String, bits: Int,
      numParts: Int = 32): DataFrame = {
    require(bits >= 1 && bits <= 16, s"1..16 bucket bits, got $bits")
    // cache the per-value count frame (bounded by DISTINCT values — the
    // model-sized relation this whole design keys on): the scaffold's
    // quantile pass, the subtotal collect, the total-row count, and
    // every later re-evaluation of the bucket join's build side
    // otherwise EACH re-run the full upstream pipeline (at two chained
    // rank buckets plus a file-assignment scaffold downstream, that
    // multiplied the input scan close to tenfold)
    val counts = df.groupBy(valueCol).agg(F.count(F.lit(1)).as("__cnt")).cache()
    // n (the percent_rank denominator) = the scaffold's global subtotal
    // mass — read from the subtotal collect the scaffold already pays
    // instead of a separate aggregate job per rank-bucket call
    val (scaff, offUdf, n) =
      Packing.bucketScaffoldWithTotal(counts, valueCol, numParts, F.sum(F.col("__cnt")))
    val w = Window.partitionBy(F.col("__pid")).orderBy(F.col(valueCol))
    val rank = F.sum(F.col("__cnt")).over(w) + offUdf(F.col("__pid")) -
      F.col("__cnt") + F.lit(1L)
    val pr =
      if (n > 1) (rank - F.lit(1L)).cast("double") / F.lit((n - 1).toDouble)
      else F.lit(0.0)
    // the bucket map is value-cardinality-bounded too; cached so the
    // per-row join's build side is computed once, not once per
    // downstream driver action
    val buckets = scaff.select(
      F.col(valueCol),
      F.least(F.lit(((1 << bits) - 1).toLong),
        F.floor(pr * F.lit((1 << bits).toDouble))).as(outCol))
      .cache()
    df.join(buckets, valueCol)
  }

  /** Morton interleave of two bucket ids: bit i of `a` lands at 2i+1, bit
    * i of `b` at 2i. Disjoint target bits, so the combine is a plain sum
    * of shifted masks — stays inside whole-stage codegen.
    */
  def interleave2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, s"1..16 interleave bits, got $bits")
    (0 until bits).map { i =>
      F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1L)), 2 * i + 1) +
        F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1L)), 2 * i)
    }.reduce(_ + _)
  }

  /** Z-order file assignment: adds `bucket_a`, `bucket_b`, `zvalue`, and
    * `file_id` (0-based, `rowsPerFile` rows per file in z-value order,
    * ties broken by `tieCols` for a total order). The same assignment a
    * clustered table write would apply; kept as a column so layout
    * quality is queryable.
    *
    * The global rank rides [[Packing.bucketScaffold]]'s distributed
    * prefix-sum — z-value quantile buckets, per-bucket row subtotals
    * (numParts longs on the driver, never data), exclusive offsets
    * broadcast back — so no single-partition window exists anywhere in
    * the assignment; the only per-bucket work is a partition-local sort.
    */
  def assignFiles(
      df: DataFrame, colA: String, colB: String, bits: Int,
      rowsPerFile: Long, tieCols: Seq[String], numParts: Int = 32): DataFrame = {
    val bucketed =
      withRankBucket(withRankBucket(df, colA, "bucket_a", bits, numParts),
        colB, "bucket_b", bits, numParts)
        .withColumn("zvalue", interleave2(F.col("bucket_a"), F.col("bucket_b"), bits))
    assignByKey(bucketed, "zvalue", rowsPerFile, tieCols, numParts)
  }

  /** Range-partitioned file assignment by any integral layout key (the
    * z-value here; a single column for a LINEAR clustered layout):
    * `file_id` = global (key, ties) rank / rowsPerFile, ranks via the
    * distributed prefix-sum scaffold.
    */
  def assignByKey(
      df: DataFrame, keyCol: String, rowsPerFile: Long,
      tieCols: Seq[String], numParts: Int = 32): DataFrame = {
    require(rowsPerFile > 0, s"rowsPerFile must be positive, got $rowsPerFile")
    val (scaffolded, offUdf) =
      Packing.bucketScaffold(df, keyCol, numParts, F.count(F.lit(1)))
    val order = Window.partitionBy(F.col("__pid"))
      .orderBy(F.col(keyCol) +: tieCols.map(F.col): _*)
    scaffolded
      .withColumn("file_id",
        ((F.row_number().over(order) - 1L + offUdf(F.col("__pid"))) / F.lit(rowsPerFile))
          .cast("long"))
      .drop("__pid")
  }

  /** Per-file min/max statistics over the two bucket columns — the
    * footer-stats view a scan planner prunes against.
    */
  def fileStats(assigned: DataFrame): DataFrame =
    assigned.groupBy("file_id").agg(
      F.count(F.lit(1)).as("n_rows"),
      F.min("bucket_a").as("min_a"), F.max("bucket_a").as("max_a"),
      F.min("bucket_b").as("min_b"), F.max("bucket_b").as("max_b"))

  /** Files a 2-D predicate box must scan under these stats: the file's
    * [min,max] ranges intersect the box on BOTH dimensions.
    */
  def filesToScan(stats: DataFrame, aLo: Long, aHi: Long, bLo: Long, bHi: Long): Column =
    F.sum(F.when(
      F.col("min_a") <= aHi && F.col("max_a") >= aLo &&
        F.col("min_b") <= bHi && F.col("max_b") >= bLo, 1L).otherwise(0L))
}
