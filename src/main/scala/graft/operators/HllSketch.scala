package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) — the
  * corpus-cardinality workhorse (unique urls / hosts / tokens over
  * 10^12 rows) where exact `count(distinct)` would shuffle every
  * distinct value. Spark ships `approx_count_distinct`, but its
  * register state is opaque; this implementation makes the SKETCH
  * itself a first-class, engine-reproducible table:
  *
  *   - hash = first 8 hex digits of md5(value) (32 bits) — a pure
  *     function of the value, identical in any engine with md5, so
  *     registers are deterministic data, not approximation folklore
  *   - bucket = top `log2(m)` bits, rho = 1 + leading zeros of the
  *     remaining suffix, computed WITHOUT bit intrinsics as
  *     `suffixBits - length(bin(suffix)) + 1` (`bin()` drops leading
  *     zeros in Spark and DuckDB alike — the same string trick
  *     mirrors bit-exactly in SQL)
  *   - a register table is `groupBy(bucket).agg(max(rho))` — map-side
  *     partial max, shuffle width = m rows, and register tables from
  *     disjoint corpus slices merge by element-wise max (the sketch is
  *     a semilattice, the property that makes it distributable)
  *
  * The whole register build is declarative column arithmetic —
  * codegen'd, no UDF — so the oracle checks REGISTERS exactly; the
  * float estimate is derived driver-side from the m register values
  * ([[estimate]]) and spec-tested for accuracy, never oracle-compared
  * (harmonic means are float; registers are not).
  */
object HllSketch {

  val BucketBits = 8
  val M: Int = 1 << BucketBits // 256 registers
  val SuffixBits = 24

  /** 32-bit value hash as a long column: md5-prefix arithmetic. */
  private def hash32(value: Column): Column =
    F.conv(F.substring(F.md5(value.cast("string")), 1, 8), 16, 10).cast("long")

  /** (bucket, reg) register table of the distinct values of `valueCol`
    * — at most [[M]] rows; buckets with no values are absent (their
    * register is implicitly 0).
    */
  def registers(df: DataFrame, valueCol: String): DataFrame = {
    val h = hash32(F.col(valueCol))
    val bucket = F.shiftright(h, SuffixBits).cast("long")
    val suffix = h % (1L << SuffixBits)
    val rho = F.when(suffix === 0L, F.lit(SuffixBits + 1).cast("long"))
      .otherwise(F.lit(SuffixBits + 1).cast("long") - F.length(F.bin(suffix)))
    df.select(bucket.as("bucket"), rho.as("rho"))
      .groupBy("bucket").agg(F.max("rho").as("reg"))
  }

  /** Merges register tables from disjoint (or overlapping — max is
    * idempotent) corpus slices: element-wise max per bucket.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bucket").agg(F.max("reg").as("reg"))

  /** Standard HLL estimate from the m register values (absent buckets
    * are zero): alpha_m * m^2 / sum(2^-reg), with BOTH Flajolet
    * corrections — small-range linear counting, and the large-range
    * hash-collision correction -2^32·ln(1 - raw/2^32) that the 32-bit
    * hash needs once raw exceeds 2^32/30 (≈1.4·10^8). Driver-side float
    * math over m longs.
    *
    * Usable range: the 32-bit hash saturates near 2^32, so a SINGLE
    * sketch is trustworthy to ~10^9 distinct values even with the
    * correction. Beyond that (10^11 distinct urls of a 10^12-page
    * corpus), widen the hash — md5 has the hex digits available: raise
    * [[SuffixBits]] and take more prefix digits; the bin()-length rho
    * and the oracle mirror generalize unchanged.
    */
  def estimate(regs: Map[Long, Long]): Double = {
    val m = M.toDouble
    val two32 = 4294967296.0
    val alpha = 0.7213 / (1 + 1.079 / m) // alpha_m for m >= 128
    val sum = (0 until M).map(b => math.pow(2.0, -regs.getOrElse(b.toLong, 0L).toDouble)).sum
    val raw = alpha * m * m / sum
    val zeros = M - regs.count(_._2 > 0)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros.toDouble)
    else if (raw > two32 / 30.0) -two32 * math.log(1.0 - raw / two32)
    else raw
  }
}
