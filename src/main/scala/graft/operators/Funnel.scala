package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel conversion over an event stream — the
  * MATCH_RECOGNIZE / product-analytics primitive (view -> click ->
  * purchase within a window): for each user, anchor at the user's FIRST
  * step-1 event and greedily match each later step at its earliest
  * possible timestamp (step k+1 is the first event of its type strictly
  * after step k's match, every step within `windowMicros` of the
  * anchor). First-occurrence anchoring is the product-analytics default
  * (Amplitude-style); a user whose only conversion starts at a LATER
  * step-1 event is deliberately not re-anchored — the re-anchoring
  * variant is this operator re-run on events after the first window,
  * not a different plan shape.
  *
  * Spark-first shape: NO per-user event collection and no UDF — step k
  * is one filter + one equi-join against the step-(k-1) frame + one
  * (user, t1..tk-1)-grouped min aggregation. Every join and aggregation
  * keys on the user column (the tk group keys are functionally dependent
  * on user, so user partitioning satisfies them), each step's shuffle
  * moves only that step's type-filtered event slice with the type
  * predicate pushed to the scan, and per-step state is one row per
  * still-converting user (monotonically shrinking). Timestamps
  * compare as exact epoch microseconds (unix_micros — engine-portable
  * integer arithmetic; simultaneous-microsecond events do not advance
  * the funnel, deterministically).
  *
  * Returns one row per user that matched step 1:
  * (user, reached: long = deepest step index 1..n, t1: long,
  * t_last: long = match time of the deepest step, both epoch micros).
  */
object Funnel {

  def conversion(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      windowMicros: Long): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(windowMicros > 0, s"windowMicros must be > 0, got $windowMicros")
    // NTZ -> session-zone timestamp (callers pin UTC) so unix_micros
    // equals DuckDB's epoch_us on the same stored value
    val ev = events.select(
      col(userCol).cast("long").as("user"),
      unix_micros(col(tsCol).cast("timestamp")).as("m"),
      col(typeCol).as("et"))
    var cur = ev.filter(col("et") === steps.head)
      .groupBy("user").agg(min("m").as("t1"))
    var frames = Vector(cur)
    for (k <- 2 to steps.length) {
      val prevT = s"t${k - 1}"
      cur = ev.filter(col("et") === steps(k - 1))
        .join(cur, "user")
        .filter(col("m") > col(prevT) && col("m") - col("t1") <= windowMicros)
        .groupBy(("user" +: (1 until k).map(i => s"t$i")).map(col): _*)
        .agg(min("m").as(s"t$k"))
      frames :+= cur
    }
    // deepest step per user: left-join the shrinking step frames onto the
    // step-1 population (all user-keyed — same exchange)
    var out = frames.head.select(col("user"), col("t1"),
      lit(1L).as("reached"), col("t1").as("t_last"))
    for (k <- 2 to steps.length) {
      val fk = frames(k - 1).select(col("user"), col(s"t$k"))
      out = out.join(fk, Seq("user"), "left")
        .withColumn("reached",
          when(col(s"t$k").isNotNull, lit(k.toLong)).otherwise(col("reached")))
        .withColumn("t_last",
          when(col(s"t$k").isNotNull, col(s"t$k")).otherwise(col("t_last")))
        .drop(s"t$k")
    }
    out
  }
}
