package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-funnel tracking: the unbounded form of
  * `operators/Journeys.funnelSteps`. State per user is the array of
  * matched step times (k small longs — bounded regardless of event
  * volume); each micro-batch's events are processed in EVENT-TIME order
  * within the batch and advance the funnel greedily under the same
  * strict-ordering rule as the batch operator (a step matches only
  * strictly after the previous step's matched time). An update row
  * (user, steps_reached, ts of the newest match) is emitted whenever a
  * batch advances a user's funnel — the conversion ledger a live
  * dashboard consumes.
  *
  * Ordering contract: for in-order ingest (or any partitioning where a
  * user's events arrive in batches that respect event time), the final
  * state equals the batch operator's result — FunnelStreamSpec pins the
  * parity. A LATE event older than an already-matched step cannot
  * retro-improve the funnel (the matched times only ever move earlier
  * within one batch, never across batches) — the same
  * at-least-once/at-watermark trade every stateful stream here makes.
  */
object FunnelStream {

  case class FunnelState(matched: Seq[Long]) // epoch micros per step, -1 = unmatched

  case class FunnelUpdate(user: Long, steps_reached: Int, last_us: Long)

  /** `events`: (user, epoch-micros timestamp, step-index ∈ [0, k) or -1
    * for non-step events — map event types to indices upstream). `k` =
    * number of funnel steps.
    */
  def track(events: Dataset[(Long, Long, Int)], k: Int)(
      implicit keyEnc: org.apache.spark.sql.Encoder[Long],
      stEnc: org.apache.spark.sql.Encoder[FunnelState],
      outEnc: org.apache.spark.sql.Encoder[FunnelUpdate])
      : Dataset[FunnelUpdate] = {
    require(k >= 1)
    events.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Int)],
         state: GroupState[FunnelState]) =>
          val m = state.getOption.map(_.matched.toArray)
            .getOrElse(Array.fill(k)(-1L))
          val before = m.count(_ >= 0)
          // event-time order within the batch: the batch operator's
          // ORDER BY ts semantics applied per micro-batch
          for ((_, us, step) <- rows.toSeq.sortBy(_._2)
               if step >= 0 && step < k) {
            val prevOk = step == 0 || m(step - 1) >= 0
            val after = step == 0 || us > m(step - 1)
            if (m(step) < 0 && prevOk && after) m(step) = us
          }
          val reached = m.count(_ >= 0)
          if (reached > before) {
            state.update(FunnelState(m.toSeq))
            Iterator.single(FunnelUpdate(user, reached,
              m.take(reached).max))
          } else Iterator.empty
      }
  }
}
