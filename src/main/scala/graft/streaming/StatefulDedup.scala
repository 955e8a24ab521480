package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming dedup: emit each key's FIRST arrival only, holding
  * per-key seen-state in the state store (`flatMapGroupsWithState`). This is
  * the unbounded-stream form of exact dedup (OP-36 / q21): the batch form
  * hashes and groups; the stream form cannot re-scan, so it remembers.
  *
  * State is per-key-tiny (one boolean + timestamp) and partitioned by the
  * shuffle on the key — at cluster scale the state store shards across
  * executors; `ProcessingTimeTimeout` bounds unbounded key growth by
  * expiring idle keys (re-admitting a key after expiry is the documented
  * at-least-once trade-off; pair with the ledger anti-join sink
  * [[InventoryStream.dedupAppendSink]] for exactly-once effect).
  */
object StatefulDedup {

  case class Seen(firstSeenMs: Long)

  /** Keep the first row per key from a keyed stream. `timeoutMs` < 0 → no
    * timeout (state lives for the query's lifetime; NoTimeout mode — a
    * ProcessingTimeTimeout query schedules perpetual empty batches to fire
    * timers, which also never quiesces `processAllAvailable`).
    */
  def firstPerKey[K: org.apache.spark.sql.Encoder,
                  V: org.apache.spark.sql.Encoder](
      ds: Dataset[(K, V)], timeoutMs: Long = -1L)(
      implicit tupleEnc: org.apache.spark.sql.Encoder[(K, V)],
      seenEnc: org.apache.spark.sql.Encoder[Seen]): Dataset[(K, V)] = {
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[Seen, (K, V)](
        OutputMode.Append(), timeoutConf) {
        (key: K, rows: Iterator[(K, V)], state: GroupState[Seen]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            Iterator.empty // key already emitted — drop re-deliveries
          } else {
            state.update(Seen(System.currentTimeMillis()))
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            rows.take(1) // first arrival wins; rest of the batch is dup
          }
      }
  }
}
