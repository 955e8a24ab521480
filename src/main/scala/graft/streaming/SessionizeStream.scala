package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming sessionization: the unbounded-stream form of the batch
  * gap-session operator (q49's cumulative-window encoding). Uses Spark's
  * built-in `session_window` aggregation — the engine merges
  * per-event windows `[ts, ts+gap)` that overlap, keeps per-session state
  * in the state store sharded by the grouping key, and the WATERMARK both
  * bounds that state and decides when a session is final (append mode
  * emits a session once the watermark passes its end — no more events can
  * extend it). This is exactly the streaming analog of the batch rule
  * "a gap longer than `gap` starts a new session", INCLUDING the exact-gap
  * boundary: Spark merges touching session windows (an event arriving
  * exactly `gap` after its predecessor extends the session), matching the
  * q49 encoding's `diff > gap` starts-new rule. SessionizeStreamSpec pins
  * the parity and the boundary case.
  *
  * Scale shape: state per in-flight session is one (start, end, count)
  * triple per key-session, expired by the watermark; the shuffle is the
  * session_window aggregation's keyed exchange — the same one any keyed
  * streaming agg pays. No per-event state accumulation (contrast
  * `flatMapGroupsWithState` hand-rolled sessionization, which this
  * replaces with a built-in for exactly that reason).
  */
object SessionizeStream {

  /** Per-session rows (key, session_start, session_end, n_events) from an
    * event-time stream. `gap` and `watermark` are duration strings
    * ("30 minutes"). On a STREAM, append-mode output emits each session
    * once finalized by the watermark; on a BATCH frame the same function
    * computes all sessions directly (session_window is batch-capable —
    * the spec uses this for oracle parity with the q49 encoding).
    */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
               gap: String, watermark: String = "30 minutes"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark(tsCol, watermark)
      else events
    src
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"))
  }

  /** Per-key session counts (key, n_sessions, n_events) — the q49 output
    * shape, for batch parity checks and session-level rollups.
    */
  def sessionCounts(events: DataFrame, keyCol: String, tsCol: String,
                    gap: String): DataFrame =
    sessions(events, keyCol, tsCol, gap)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).cast("long").as("n_events"))
}
