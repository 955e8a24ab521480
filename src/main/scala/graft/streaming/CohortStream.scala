package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming cohort-retention maintenance: the unbounded form of
  * `operators/Journeys.cohortRetention`. Per-user state is (cohort week,
  * bitmask of periods already credited) — a FIXED-size bitset over the
  * credit horizon, so state is truly bounded per user (not "bounded by
  * active weeks", which grows forever for a long-lived weekly-active
  * user, and whose Seq `contains` was linear per event).
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

  /** `credited` is a fixed-width bitset (word i, bit b ↔ period 64·i+b)
    * sized `maxPeriods/64` words at first use — ~130 B of state per user
    * at the 10-year default horizon, O(1) test-and-set per event.
    *
    * CHECKPOINT COMPATIBILITY: `ver` is a schema-breaking discriminator.
    * Pre-round-10 state stored the credited period NUMBERS as a list
    * under the SAME Catalyst schema as the bitmask words, so a restart
    * silently misread periods as mask words; the extra field makes the
    * state schemas incompatible, so restarting an old checkpoint on this
    * version now fails loudly at query start (state schema validation)
    * instead of emitting wrong credits. Recovery = fresh checkpoint
    * (replay the ledger; credits are idempotent downstream by design).
    */
  case class CohortState(ver: Int, cohortWk: Long, credited: Array[Long])

  /** Bump when [[CohortState]]'s field semantics change again. */
  val StateVersion = 2

  case class CohortCredit(user: Long, cohort_wk: Long, period_wk: Long)

  /** Credit horizon: periods ≥ this never emit (and never grow state).
    * 520 weeks = 10 years of weekly retention — far past where any
    * retention curve is read; raise it per-job if yours is.
    */
  val DefaultMaxPeriods = 520

  /** `events`: (user, week-index) — week derived upstream with the batch
    * operator's Monday-epoch day arithmetic. Events beyond
    * `maxPeriods` after the user's cohort week are dropped (bounded
    * state beats an unbounded tail no analysis reads).
    */
  def credits(events: Dataset[(Long, Long)],
              maxPeriods: Int = DefaultMaxPeriods)(
      implicit keyEnc: org.apache.spark.sql.Encoder[Long],
      stEnc: org.apache.spark.sql.Encoder[CohortState],
      outEnc: org.apache.spark.sql.Encoder[CohortCredit])
      : Dataset[CohortCredit] = {
    require(maxPeriods >= 1, "maxPeriods must be >= 1")
    val nWords = (maxPeriods + 63) / 64
    events.groupByKey(_._1)
      .flatMapGroupsWithState[CohortState, CohortCredit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)],
         state: GroupState[CohortState]) =>
          // event-time order within the batch (the FunnelStream rule):
          // the earliest week in the first batch becomes the cohort
          val wks = rows.map(_._2).toSeq.sorted
          val st = state.getOption.getOrElse(
            CohortState(StateVersion, wks.head, new Array[Long](nWords)))
          val mask =
            if (st.credited.length >= nWords) st.credited.clone()
            else java.util.Arrays.copyOf(st.credited, nWords)
          val out = scala.collection.mutable.ArrayBuffer.empty[CohortCredit]
          for (w <- wks) {
            val period = w - st.cohortWk
            if (period >= 0 && period < maxPeriods.toLong) {
              val word = (period >> 6).toInt
              val bit = 1L << (period & 63)
              if ((mask(word) & bit) == 0L) {
                mask(word) |= bit
                out += CohortCredit(user, st.cohortWk, period)
              }
            }
          }
          state.update(CohortState(StateVersion, st.cohortWk, mask))
          out.iterator
      }
  }
}
