package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins: the as-of join and the
  * bounded range (interval) join. Both are north-star extensions (no
  * reference counterpart — ufload has no event-time joins); they exist
  * because a training-data pipeline over event logs needs them constantly
  * (attribute an interaction to the latest prior state; count neighbors in
  * a time window) and the naive encodings — an inequality theta-join — plan
  * as BroadcastNestedLoopJoin or CartesianProduct and die at scale.
  *
  * Both operators here compose from shuffle-once equi primitives, so
  * Catalyst keeps predicate pushdown/column pruning and the plans contain
  * no nested-loop stage (pinned by PlanContractSpec).
  */
object Temporal {

  /** As-of join: for every left row, attach the payload of the single right
    * row with the greatest `rightTs` at-or-before (`inclusive=true`, the
    * default) or strictly-before (`inclusive=false`) the left row's
    * `leftTs`, within the same key. Unmatched left rows keep NULL payloads
    * (left-outer semantics). Ties on `rightTs` resolve to the greatest
    * `tieBreak` value, making the result deterministic.
    *
    * Spark has no ASOF JOIN. Encoding it as `l JOIN r ON l.k = r.k AND
    * r.ts <= l.ts` + top-1 works but materializes every (left, earlier
    * right) pair before the rank prunes them — O(n·m) per key. This is the
    * scale-safe classic instead: tag both sides, union, ONE shuffle on the
    * key, and a per-key ordered window that carries the last-seen right
    * payload forward (`last(..., ignoreNulls)` over rows-unbounded-
    * preceding). Cost: one exchange + one in-partition sort — identical to
    * any keyed window, no join explosion, no driver state.
    *
    * Scale note: per-key rows must fit a task's external-sort budget (the
    * standard partitioned-window contract; spills beyond memory). That
    * holds when key cardinality grows with the data (users, devices,
    * instruments). For a handful of hot keys over unbounded history,
    * pre-bucket time and carry boundaries — see [[rangeJoin]]'s bucket
    * technique.
    *
    * Payload column names must not collide with left column names; pass
    * `outPrefix` to namespace them.
    */
  def asofJoin(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      payload: Seq[String], tieBreak: String,
      inclusive: Boolean = true, outPrefix: String = ""): DataFrame = {
    // At equal ts the later-sorted row sees the earlier one in its window:
    // inclusive ⇒ right rows sort before left rows (left sees same-ts
    // right); exclusive ⇒ left first (same-ts right invisible).
    val (rightTag, leftTag) = if (inclusive) (0, 1) else (1, 0)
    val r = right.select(
      col(rightKey).as("__k"), col(rightTs).as("__t"),
      lit(rightTag).as("__tag"),
      struct(col(tieBreak).as("__tb") +: payload.map(col): _*).as("__p"))
    val l = left.select(
      col(leftKey).as("__k"), col(leftTs).as("__t"),
      lit(leftTag).as("__tag"),
      struct(left.columns.map(col): _*).as("__l"))
    // unionByName fills the missing side's struct with a correctly-typed
    // NULL; ascending __p puts the max-tieBreak right row last among
    // same-ts rights, so the carried last value is the deterministic pick.
    val u = r.unionByName(l, allowMissingColumns = true)
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__tag").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__c", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === leftTag && col("__l").isNotNull)
      .select(col("__l.*") +:
        payload.map(p => col("__c").getField(p).as(outPrefix + p)): _*)
  }

  /** Bounded range join: every (left, right) pair with equal keys and
    * `rightTs` within `[leftTs + lowerSec, leftTs + upperSec]` (bounds in
    * seconds, both inclusive; `lowerSec <= upperSec` required). Returns the
    * left columns plus the named right payload columns; callers aggregate.
    *
    * Planned as an EQUI join: rights are hashed into time buckets of width
    * `upperSec - lowerSec` (never smaller than 1 s), each left row joins
    * its at-most-two candidate buckets, and the exact interval predicate
    * refines the candidates. One shuffle on (key, bucket); no
    * BroadcastNestedLoopJoin, no per-key cross product beyond the window's
    * true matches. The bucket key also spreads a hot key's rows across
    * time, so skew is bounded by events-per-window, not events-per-key.
    *
    * Timestamps are compared at microsecond precision (`unix_micros`), the
    * engine-wide determinism boundary for event time (SURVEY §2.11).
    */
  def rangeJoin(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      lowerSec: Long, upperSec: Long,
      payload: Seq[String], outPrefix: String = ""): DataFrame = {
    require(lowerSec <= upperSec,
      s"rangeJoin: lowerSec ($lowerSec) must be <= upperSec ($upperSec)")
    val widthUs = math.max(upperSec - lowerSec, 1L) * 1000000L
    val lowerUs = lowerSec * 1000000L
    val upperUs = upperSec * 1000000L
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))

    val r = right.select(
      col(rightKey).as("__k"), us(col(rightTs)).as("__rus"),
      struct(payload.map(col): _*).as("__p"))
      .withColumn("__b", floor(col("__rus") / widthUs))
    // window spans < 2 buckets, so the candidate buckets for a left row
    // are exactly floor((t+lower)/W) and floor((t+upper)/W) (often equal).
    val l = left
      .withColumn("__lus", us(col(leftTs)))
      .withColumn("__b", explode(array_distinct(array(
        floor((col("__lus") + lowerUs) / widthUs),
        floor((col("__lus") + upperUs) / widthUs)))))
      .withColumn("__k", col(leftKey))
    l.join(r, Seq("__k", "__b"))
      .filter(col("__rus").between(
        col("__lus") + lowerUs, col("__lus") + upperUs))
      .select(left.columns.map(col) ++
        payload.map(p => col("__p").getField(p).as(outPrefix + p)): _*)
  }
}
