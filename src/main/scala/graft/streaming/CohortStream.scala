package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming cohort-retention maintenance: the unbounded form of
  * `operators/Journeys.cohortRetention`. Per-user state is (cohort week,
  * set of periods already credited) — weeks are small integers, so state
  * is bounded by a user's distinct ACTIVE weeks, not their event count.
  * Each micro-batch emits one increment row per NEW (cohort, period)
  * credit; the consumer maintains `active_users(cohort, period)` as a
  * running sum of increments (the classic streaming-aggregation ledger
  * shape — counts never decrement, so the sum is exact under
  * at-least-once delivery as long as the ledger sink dedups on
  * (user, period), which the emitted key makes trivial).
  *
  * Cohort assignment is first-seen-wins in ARRIVAL order: for in-order
  * ingest this equals the batch operator's min-timestamp cohort
  * (CohortStreamSpec pins the parity); a late earlier-week event after
  * the cohort is assigned cannot re-cohort the user — the same
  * no-retro-update trade as [[FunnelStream]].
  */
object CohortStream {

  case class CohortState(cohortWk: Long, credited: Seq[Long])

  case class CohortCredit(user: Long, cohort_wk: Long, period_wk: Long)

  /** `events`: (user, week-index) — week derived upstream with the batch
    * operator's Monday-epoch day arithmetic.
    */
  def credits(events: Dataset[(Long, Long)])(
      implicit keyEnc: org.apache.spark.sql.Encoder[Long],
      stEnc: org.apache.spark.sql.Encoder[CohortState],
      outEnc: org.apache.spark.sql.Encoder[CohortCredit])
      : Dataset[CohortCredit] =
    events.groupByKey(_._1)
      .flatMapGroupsWithState[CohortState, CohortCredit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)],
         state: GroupState[CohortState]) =>
          // event-time order within the batch (the FunnelStream rule):
          // the earliest week in the first batch becomes the cohort
          val wks = rows.map(_._2).toSeq.sorted
          var st = state.getOption.getOrElse(
            CohortState(wks.head, Seq.empty))
          val out = scala.collection.mutable.ArrayBuffer.empty[CohortCredit]
          for (w <- wks) {
            val period = w - st.cohortWk
            if (period >= 0 && !st.credited.contains(period)) {
              st = st.copy(credited = st.credited :+ period)
              out += CohortCredit(user, st.cohortWk, period)
            }
          }
          state.update(st)
          out.iterator
      }
}
