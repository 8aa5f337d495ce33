package graft.streaming

import org.apache.spark.sql.Dataset

/** Streaming ordered-funnel conversion — [[graft.operators.Funnel]] as a
  * stateful Structured Streaming operator. Exactly the batch semantics
  * (anchor at the user's FIRST step-1 event, greedy-earliest later
  * steps, every step within `windowMicros` of the anchor), finalized by
  * EVENT TIME: a user's outcome is provably final once the watermark
  * passes anchor + window (no event that could re-anchor earlier or add
  * an in-window match can still arrive), at which point one FunnelOut
  * row is emitted and the state collapses to a tombstone (see FState).
  *
  * State discipline at web scale: the per-user state buffers only events
  * that can still match under SOME reachable anchor — in-window under
  * the current anchor, or pre-anchor events at or above the watermark
  * (a later-arriving EARLIER step-1 event can re-anchor behind them;
  * below the watermark nothing can). Past anchor + window is dead for
  * good: the anchor only moves earlier, so the window's right edge only
  * moves earlier too. Anchorless users are garbage-collected by a
  * rolling event-time timeout once nothing buffered can ever match.
  * Live state is therefore O(events per user per window + watermark
  * lag), never O(stream history).
  *
  * Out-of-order handling is total: a late-arriving EARLIER step-1 event
  * re-anchors the funnel and re-prices every step, as long as it beats
  * the watermark — the finalize-at-watermark rule is what makes that
  * sound, and the spec drives exactly that case across micro-batches.
  */
object FunnelStateful {

  final case class FunnelEvent(
      user_id: Long, ts: java.sql.Timestamp, event_type: String)

  /** anchorUs = min step-1 event time seen (Long.MaxValue = none yet);
    * bufTs/bufStep = parallel arrays of buffered candidate events
    * (step index 0-based, only steps 2..n and the anchor matter — step-1
    * events other than the minimum are dropped on arrival). `done` is the
    * post-finalization tombstone: batch semantics anchor ONCE per user
    * (the global first step-1 event), so after the output row is emitted
    * the user must never re-anchor on later step-1 events — the
    * tombstone is an empty-buffer state row with no timeout, O(distinct
    * converting users), the inherent price of first-occurrence semantics
    * on an unbounded stream (bound it with a TTL timeout if the user
    * universe is unbounded and re-anchoring after the TTL is acceptable).
    */
  final case class FState(
      anchorUs: Long, bufTs: Array[Long], bufStep: Array[Int],
      done: Boolean = false)

  final case class FunnelOut(user_id: Long, reached: Long, t1: Long, t_last: Long)

  def funnelStateful(
      events: Dataset[FunnelEvent],
      steps: Seq[String],
      windowMicros: Long,
      watermarkDelay: String): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(steps.nonEmpty, "need at least one funnel step")
    require(windowMicros > 0, s"windowMicros must be > 0, got $windowMicros")
    val stepIdx = steps.zipWithIndex.toMap
    def micros(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

    /** greedy fold of the final buffer — the batch recurrence verbatim */
    def finalize(user: Long, s: FState): FunnelOut = {
      val order = s.bufTs.zip(s.bufStep).sortBy(_._1)
      var reached = 1L
      var tPrev = s.anchorUs
      var k = 1
      while (k < steps.length) {
        var best = Long.MinValue
        var i = 0
        while (i < order.length && best == Long.MinValue) {
          val (t, st) = order(i)
          if (st == k && t > tPrev && t - s.anchorUs <= windowMicros) best = t
          i += 1
        }
        if (best == Long.MinValue) k = steps.length
        else { reached = k + 1L; tPrev = best; k += 1 }
      }
      FunnelOut(user, reached, s.anchorUs, tPrev)
    }

    def prune(s: FState, wmUs: Long): FState = {
      // an event is alive iff it can still match under SOME reachable
      // anchor: in-window under the current anchor, or — because a
      // later-arriving EARLIER step-1 event (ts >= watermark) can still
      // re-anchor behind it — any pre-anchor/anchorless event at or above
      // the watermark. Past anchor + window is dead for good (the anchor
      // only moves earlier, so the window's right edge only moves earlier).
      val keep = s.bufTs.indices.filter { i =>
        val t = s.bufTs(i)
        (s.anchorUs != Long.MaxValue &&
          t >= s.anchorUs && t - s.anchorUs <= windowMicros) ||
          (t >= wmUs && (s.anchorUs == Long.MaxValue || t < s.anchorUs))
      }
      FState(s.anchorUs, keep.map(s.bufTs).toArray, keep.map(s.bufStep).toArray)
    }

    events
      .filter((e: FunnelEvent) => e.ts != null && stepIdx.contains(e.event_type))
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[FunnelEvent], state: GroupState[FState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          if (state.hasTimedOut) {
            val s = state.getOption.get
            if (s.anchorUs != Long.MaxValue && wmUs > s.anchorUs + windowMicros) {
              // tombstone, not remove: later step-1 events must not start a
              // SECOND funnel for this user (batch anchors once, globally)
              state.update(FState(s.anchorUs, Array.empty, Array.empty, done = true))
              Iterator.single(finalize(user, s))
            } else {
              // anchorless GC sweep: drop dead events; keep waiting if any
              // survive (they can still pair with a future >=wm anchor)
              val p = prune(s, wmUs)
              if (p.bufTs.isEmpty && p.anchorUs == Long.MaxValue) {
                state.remove(); Iterator.empty
              } else {
                state.update(p)
                val next =
                  if (p.anchorUs != Long.MaxValue)
                    (p.anchorUs + windowMicros) / 1000L + 1L
                  else p.bufTs.min / 1000L + 1L
                state.setTimeoutTimestamp(math.max(next, state.getCurrentWatermarkMs() + 1L))
                Iterator.empty
              }
            }
          } else if (state.getOption.exists(_.done)) {
            Iterator.empty // finalized: every later event is out of window
          } else {
            var s = state.getOption.getOrElse(FState(Long.MaxValue, Array.empty, Array.empty))
            var anchor = s.anchorUs
            val addTs = Array.newBuilder[Long]
            val addStep = Array.newBuilder[Int]
            it.foreach { e =>
              val t = micros(e.ts)
              val k = stepIdx(e.event_type)
              if (k == 0) anchor = math.min(anchor, t)
              else { addTs += t; addStep += k }
            }
            s = FState(anchor, s.bufTs ++ addTs.result(), s.bufStep ++ addStep.result())
            s = prune(s, wmUs)
            if (s.anchorUs == Long.MaxValue && s.bufTs.isEmpty) {
              if (state.exists) state.remove()
              Iterator.empty
            } else {
              state.update(s)
              val next =
                if (s.anchorUs != Long.MaxValue) (s.anchorUs + windowMicros) / 1000L + 1L
                else s.bufTs.min / 1000L + 1L
              state.setTimeoutTimestamp(math.max(next, state.getCurrentWatermarkMs() + 1L))
              Iterator.empty
            }
          }
      }
  }
}
