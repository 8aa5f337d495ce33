package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Count-min sketch (Cormode & Muthukrishnan 2005) — point-frequency
  * estimates over a stream too wide to count exactly (per-token /
  * per-url frequencies across 10^12 rows in depth×width integer cells
  * instead of a vocabulary-sized table). Completes the mergeable-sketch
  * trio next to Misra–Gries ([[HeavyHitters]]) and HyperLogLog
  * ([[HllSketch]]).
  *
  * Everything here is exact integer arithmetic over deterministic
  * hashes, so unlike most sketch implementations BOTH the cell table
  * AND the estimates are oracle-checkable bit-for-bit:
  *
  *   - row-i hash of value v = md5-prefix of "i|v" (the row index is
  *     part of the hashed string — d independent functions from one
  *     digest), bucket = hash mod width
  *   - the cell table is `groupBy(row, bucket).count` — map-side
  *     partial sums, shuffle width ≤ depth·width rows; tables from
  *     corpus slices merge by cell-wise + (counters are a monoid)
  *   - estimate(v) = min over rows of cell(row, h_row(v)) — an upper
  *     bound on the true count, exact for values with no colliding
  *     mass, over-estimating by at most εN with probability 1-δ
  *     (ε = e/width, δ = e^-depth)
  *
  * No UDF anywhere — hashing is conv/substring/md5 column arithmetic,
  * codegen'd.
  */
object CountMin {

  /** Bucket of `value` for sketch row `row` (both Columns). */
  private def bucket(row: Column, value: Column, width: Int): Column =
    F.conv(F.substring(F.md5(F.concat(row.cast("string"), F.lit("|"),
      value.cast("string"))), 1, 4), 16, 10).cast("long") % width

  /** The (row, bucket, cnt) cell table of the value stream (duplicates
    * counted — this is a frequency sketch). Absent cells are zero.
    */
  def table(df: DataFrame, valueCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2 && width <= 65536, s"width must be in [2,65536], got $width")
    df.select(F.col(valueCol).as("v"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).as("row"))
      .select(F.col("row"), bucket(F.col("row"), F.col("v"), width).as("bucket"))
      .groupBy("row", "bucket").agg(F.count(F.lit(1)).as("cnt"))
  }

  /** Merges cell tables from corpus slices: cell-wise sum. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("row", "bucket").agg(F.sum("cnt").as("cnt"))

  /** Point estimates for a probe set: (probeCol, n_est) with
    * n_est = min over rows of the probed cell. A probe whose cells are
    * all absent estimates 0 (only possible when nothing hashed there).
    */
  def estimate(cells: DataFrame, probes: DataFrame, probeCol: String,
               depth: Int, width: Int): DataFrame = {
    val probed = probes.select(F.col(probeCol).as("p"))
      .select(F.col("p"), F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).as("row"))
      .select(F.col("p"), F.col("row"), bucket(F.col("row"), F.col("p"), width).as("bucket"))
    probed.join(cells, Seq("row", "bucket"), "left")
      .groupBy("p")
      .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0L))).as("n_est"))
  }
}
