package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming as-of join with a BOUNDED LAG — the stream form of
  * `operators.Temporal.asofJoin`. An unbounded streaming as-of is
  * impossible with finite state (any right event might be "the latest
  * before" some future left event forever); the bounded-lag contract —
  * only rights within `maxLag` before the left event can match — is what
  * makes the state finite, and it is the contract real pipelines want
  * anyway (attribute a click to a purchase in the last hour, not ever).
  *
  * Composition, built-ins only, TWO chained stateful operators (Spark
  * supports multi-stateful append pipelines since 3.4):
  *  1. stream-stream LEFT OUTER interval join: `l.key = r.key AND r.ts in
  *     [l.ts - maxLag, l.ts]` (both bounds INCLUSIVE — a right event at
  *     exactly maxLag before the left still matches) — state on both
  *     sides is bounded by watermark + lag, and Spark evicts as the
  *     watermark advances;
  *  2. windowed latest-per-left-event aggregation: `max_by(payload,
  *     r.ts)` grouped by (tumbling window of l.ts, left id) — picks the
  *     as-of row among the joined candidates; `max_by` ignores NULL
  *     order keys, so unmatched lefts (outer join) keep NULL payloads.
  *     The tumbling window carries the event time append mode needs to
  *     finalize groups.
  *
  * Emission: a left event's result appears once the watermark passes its
  * window end — latency is bounded by `windowSize` + watermark delay.
  * Ties on r.ts resolve by the greatest payload struct (same
  * lexicographic tie rule as the batch operator's tieBreak-last field
  * ordering when `tieBreak` leads the payload struct).
  */
object AsOfStream {

  def asofBoundedLag(
      left: DataFrame, leftKey: String, leftTs: String, leftId: String,
      right: DataFrame, rightKey: String, rightTs: String,
      payload: Seq[String], tieBreak: String,
      maxLag: String = "1 hour",
      watermarkDelay: String = "10 minutes",
      windowSize: String = "5 minutes",
      outPrefix: String = ""): DataFrame = {
    val collisions = payload.map(outPrefix + _).toSet
      .intersect(Set(leftId, leftKey, leftTs))
    require(collisions.isEmpty,
      s"asofBoundedLag: payload name(s) ${collisions.mkString(", ")} collide " +
        "with left output columns - pass outPrefix (same contract as the " +
        "batch operator)")
    val l = left.select(col(leftId).as("__lid"), col(leftKey).as("__lk"),
        col(leftTs).as("__lt"))
      .withWatermark("__lt", watermarkDelay)
    val r = right.select(col(rightKey).as("__rk"), col(rightTs).as("__rt"),
        struct(col(tieBreak).as("__tb") +: payload.map(col): _*).as("__p"))
      .withWatermark("__rt", watermarkDelay)
    l.join(r,
        col("__lk") === col("__rk") &&
          col("__rt") <= col("__lt") &&
          col("__rt") >= col("__lt") - expr(s"INTERVAL $maxLag"),
        "leftOuter")
      .groupBy(window(col("__lt"), windowSize).as("__w"),
        col("__lid"), col("__lk"))
      // __lt is functionally dependent on the left id; carrying it as an
      // aggregate (not a second grouping column) keeps ONE event-time
      // column (the window) in the stateful agg — two is an analysis error
      .agg(max(col("__lt")).as("__lt2"),
        max_by(col("__p"), struct(col("__rt"), col("__p"))).as("__c"))
      .select(Seq(col("__lid").as(leftId), col("__lk").as(leftKey),
        col("__lt2").as(leftTs)) ++
        payload.map(p => col("__c").getField(p).as(outPrefix + p)): _*)
  }
}
