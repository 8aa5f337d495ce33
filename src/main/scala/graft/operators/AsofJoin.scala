package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

/** Backward as-of join — "for each probe row, the most recent build row at
  * or before the probe's timestamp, per key" — the snapshot-alignment
  * primitive (align a page's features to the latest crawl snapshot, a
  * user's event to their latest profile state, a price point to the last
  * quote). The reference has no temporal joins at all; at corpus scale this
  * is how slowly-changing side information is attached to a stream without
  * recomputing it per row.
  *
  * Scale shape: the naive formulations are both disasters at 10^12 rows —
  * a theta-join (`p.key = b.key AND p.ts >= b.ts` + max-per-probe) degrades
  * to a per-key cross product, and Spark plans a bare range predicate as
  * BroadcastNestedLoopJoin. This implementation instead UNIONS the two
  * sides, hash-partitions once on the key, and sorts each partition by
  * (ts, side) so a single running `last(build_payload, ignoreNulls)` window
  * resolves every probe: one Exchange + one sort, the same physical cost
  * class as any windowed aggregation, zero pair explosion regardless of how
  * many build rows precede a probe. Build-before-probe ordering at equal
  * timestamps makes the match inclusive (probe.ts == build.ts matches).
  *
  * Skew: one hot key serializes into one task, as with any window. For a
  * key space with pathological hot keys, pre-bucket time into coarse epochs
  * and replicate each epoch's LAST build row into the next epoch's bucket
  * (boundary carry), then run this operator per (key, epoch) — documented
  * here rather than implemented because the carry step is itself this
  * operator at epoch granularity.
  *
  * Contracts (checked): `tsCol` must be LongType (callers convert
  * timestamps with `unix_micros` — keeps ordering exact, no timezone or
  * sub-second surprises; checked at plan time); build rows must be unique
  * per (keys, ts) — the window's `last` would otherwise pick a
  * partition-order-dependent winner; aggregate the build side first
  * (`max`/`sum` per (key, ts)) to make ties impossible (enforced at RUN
  * time: a duplicate detonates a raise_error inside the same window pass,
  * see below). Probe and build payload column names must be disjoint
  * (checked at plan time).
  */
object AsofJoin {

  /** Probe columns pass through unchanged; every non-key non-ts build
    * column is appended, null when no build row is at-or-before the probe
    * (or the match is staler than `toleranceMicros`).
    */
  def asofBackward(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      tsCol: String,
      toleranceMicros: Long = Long.MaxValue
  ): DataFrame = {
    require(keys.nonEmpty, "asofBackward: need at least one key column")
    require(toleranceMicros >= 0, s"asofBackward: negative tolerance $toleranceMicros")
    Seq(probe -> "probe", build -> "build").foreach { case (df, side) =>
      val t = df.schema(tsCol).dataType
      require(t == LongType, s"asofBackward: $side ts column '$tsCol' must be LONG (unix micros), got $t")
    }
    val bPay = build.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    require(bPay.nonEmpty, "asofBackward: build side has no payload columns")
    val clash = bPay.toSet.intersect(probe.columns.toSet)
    require(clash.isEmpty, s"asofBackward: payload name clash: ${clash.mkString(", ")}")

    val k: Seq[Column] = keys.map(F.col)
    // __bpay carries the build ts so tolerance is checked on the winner
    val bSide = build.select(
      k :+ F.col(tsCol).as("__ts") :+ F.lit(0).as("__side") :+
        F.struct(F.col(tsCol).as("__bts") +: bPay.map(F.col): _*).as("__bpay") :+
        F.lit(null).cast(probeStructType(probe)).as("__ppay"): _*)
    val pSide = probe.select(
      k :+ F.col(tsCol).as("__ts") :+ F.lit(1).as("__side") :+
        F.lit(null).cast(bSide.schema("__bpay").dataType).as("__bpay") :+
        F.struct(probe.columns.map(F.col).toSeq: _*).as("__ppay"): _*)

    val w = Window.partitionBy(k: _*).orderBy(F.col("__ts"), F.col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = F.last(F.col("__bpay"), ignoreNulls = true).over(w)
    // unique-(keys, ts) build contract, enforced at RUN time in the same
    // window pass (same partitioning/ordering -> one WindowExec, no extra
    // Exchange): duplicate build rows at a (keys, ts) sort adjacently
    // (side 0 precedes probes), so a lag() catches every violation. The
    // offending rows are kept through the probe filter and detonate a
    // raise_error in the output projection — loud, never a
    // partition-order-dependent winner.
    val wLag = Window.partitionBy(k: _*).orderBy(F.col("__ts"), F.col("__side"))
    val dupBuild = F.col("__side") === 0 &&
      F.lag(F.col("__side"), 1).over(wLag) === 0 &&
      F.lag(F.col("__ts"), 1).over(wLag) === F.col("__ts")

    val inTol = F.col("__ts") - F.col("__m.__bts") <= F.lit(toleranceMicros)
    val out = bSide.unionByName(pSide)
      .withColumn("__m", matched)
      .withColumn("__dup", dupBuild)
      .filter(F.col("__side") === 1 || F.col("__dup"))
      // null __m (no predecessor) fails inTol via null semantics -> otherwise
      .withColumn("__m", F.when(inTol, F.col("__m")))
    val firstProbeCol = probe.columns.head
    val guardedFirst = F.when(F.col("__dup"),
        F.raise_error(F.lit("asofBackward: build side has duplicate rows at the same (keys, ts) " +
          "— pre-aggregate the build side so the as-of winner is unique")))
      .otherwise(F.col(s"__ppay.$firstProbeCol")).as(firstProbeCol)
    out.select(
      (guardedFirst +: probe.columns.tail.map(c => F.col(s"__ppay.$c").as(c)).toSeq) ++
        bPay.map(c => F.col(s"__m.$c").as(c)): _*)
  }

  private def probeStructType(probe: DataFrame) =
    org.apache.spark.sql.types.StructType(probe.schema.fields)
}
