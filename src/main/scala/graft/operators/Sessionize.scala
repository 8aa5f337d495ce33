package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the canonical event-stream operator: a
  * user's events sorted by time split into sessions wherever the gap to
  * the previous event exceeds a threshold. Session ids are
  * (user, ordinal) pairs — deterministic, no RNG, reproducible across
  * engines, so session stats are DuckDB-oracle-checkable.
  *
  * All time arithmetic is in integer MICROSECONDS (`unix_micros` here,
  * `epoch_us` in the mirror): second-truncated timestamps can flip a
  * gap decision that lands inside the truncation error, and float
  * epoch seconds reintroduce rounding — integer micros are exact in
  * both engines. Ordering ties on (ts) are broken by `tieCol` so the
  * lag/cumsum windows are total orders.
  *
  * Scale shape: one exchange keyed by user, then two partition-local
  * windows (lag + running sum) over each user's events — per-user
  * volume is the unit of work. A pathological user with 10^9 events
  * sorts in one task; the standard mitigation is a two-level split
  * (pre-bucket by coarse time window, sessionize per bucket, stitch
  * boundary sessions whose gap spans buckets), which preserves these
  * semantics exactly and is documented rather than built because the
  * stitch is only worth its complexity beyond ~10^7 events per user.
  * The streaming analog is Structured Streaming's native
  * `session_window` aggregation (same gap semantics, watermark-bounded
  * state).
  */
object Sessionize {

  /** Adds an integer `session_id` column (0-based per-user ordinal):
    * a new session starts at the user's first event and whenever
    * ts - prev_ts > gapMicros.
    */
  def assign(events: DataFrame, userCol: String, tsCol: String, tieCol: String,
             gapMicros: Long): DataFrame = {
    require(gapMicros > 0, s"gapMicros must be positive, got $gapMicros")
    // NULLS LAST pinned explicitly: Spark's ascending default is NULLS
    // FIRST while the SQL mirror's (DuckDB) is NULLS LAST — a null-ts row
    // would otherwise open sessions at the head of the stream in one
    // engine and ride the tail of the last session in the other. With
    // nulls last, a null-ts row joins the user's final session in BOTH
    // engines (gap vs NULL is never > threshold).
    val order = Window.partitionBy(col(userCol))
      .orderBy(col("__tus").asc_nulls_last, col(tieCol))
    val cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("__tus"), 1).over(order)
    events
      // parquet gives TIMESTAMP_NTZ; the cast interprets it in the session
      // zone (pinned UTC) so unix_micros == DuckDB's epoch_us on the same
      // naive value
      .withColumn("__tus", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("__new",
        when(prev.isNull || col("__tus") - prev > gapMicros, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(cum) - 1L)
      .drop("__tus", "__new")
  }

  /** Per-session stats: (userCol, session_id, n_events, start_us, end_us,
    * duration_us). Integer micros end to end.
    */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String, tieCol: String,
                   gapMicros: Long): DataFrame =
    assign(events, userCol, tsCol, tieCol, gapMicros)
      .withColumn("__tus", unix_micros(col(tsCol).cast("timestamp")))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__tus")).as("start_us"),
        max(col("__tus")).as("end_us")
      )
      .withColumn("duration_us", col("end_us") - col("start_us"))
}
