package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed, MERGEABLE Aggregator —
  * the bounded-memory answer to "which tokens dominate this corpus"
  * when the exact token histogram (10^9+ distinct tokens at web scale)
  * is itself too large to shuffle or hold. State is at most k counters
  * per partition; Spark runs it as partial aggregation + merge, so the
  * full pass over 10^12 tokens moves only nPartitions·k entries.
  *
  * Guarantees (Misra & Gries 1982; merge rule and its proof from
  * Agarwal et al. 2013, "Mergeable Summaries" §3.1 — subtract the
  * (k+1)-th largest count after summing, drop non-positives):
  *   - NO FALSE NEGATIVES above the noise floor: every item with true
  *     frequency > N/(k+1) is present in the final sketch (this is the
  *     invariant the driver oracle pins — DuckDB computes the true
  *     heavy set exactly and every member must be in the sketch);
  *   - estimates only ever UNDERcount, by at most N/(k+1).
  * A Count-Min sketch trades the other way (overcounts, no misses on
  * estimates); MG is the right shape for a keep-list of dominant
  * boilerplate tokens because presence is what's consumed downstream.
  */
object HeavyHitters {

  final case class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0, s"k must be positive, got $k")

    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], t: String): Map[String, Long] =
      if (t == null) b
      else if (b.contains(t)) b.updated(t, b(t) + 1L)
      else if (b.size < k) b.updated(t, 1L)
      // classic MG step: a new item with all k counters taken decrements
      // everyone (the new item and one unit of each counter "cancel")
      else b.flatMap { case (w, c) => if (c > 1L) Some(w -> (c - 1L)) else None }

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val m = (a.keySet ++ b.keySet).iterator
        .map(w => w -> (a.getOrElse(w, 0L) + b.getOrElse(w, 0L))).toMap
      if (m.size <= k) m
      else {
        val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        m.flatMap { case (w, c) => if (c - cut > 0L) Some(w -> (c - cut)) else None }
      }
    }

    def finish(m: Map[String, Long]): Map[String, Long] = m

    def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }
}
