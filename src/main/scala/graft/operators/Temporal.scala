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
      inclusive: Boolean = true, outPrefix: String = ""): DataFrame =
    asofJoinKeys(left, Seq(leftKey), leftTs, right, Seq(rightKey), rightTs,
      payload, tieBreak, inclusive, outPrefix)

  /** [[asofJoin]] over a composite key — the same tag-union-window plan,
    * partitioned by every key column. [[asofJoinBucketed]] rides this with
    * (key, time-bucket) to bound per-partition window size.
    */
  private[operators] def asofJoinKeys(
      left: DataFrame, leftKeys: Seq[String], leftTs: String,
      right: DataFrame, rightKeys: Seq[String], rightTs: String,
      payload: Seq[String], tieBreak: String,
      inclusive: Boolean = true, outPrefix: String = ""): DataFrame = {
    require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty)
    // At equal ts the later-sorted row sees the earlier one in its window:
    // inclusive ⇒ right rows sort before left rows (left sees same-ts
    // right); exclusive ⇒ left first (same-ts right invisible).
    val (rightTag, leftTag) = if (inclusive) (0, 1) else (1, 0)
    val ks = leftKeys.indices.map(i => s"__k$i")
    val r = right.select(
      rightKeys.zip(ks).map { case (k, a) => col(k).as(a) } ++ Seq(
        col(rightTs).as("__t"), lit(rightTag).as("__tag"),
        struct(col(tieBreak).as("__tb") +: payload.map(col): _*).as("__p")): _*)
    val l = left.select(
      leftKeys.zip(ks).map { case (k, a) => col(k).as(a) } ++ Seq(
        col(leftTs).as("__t"), lit(leftTag).as("__tag"),
        struct(left.columns.map(col): _*).as("__l")): _*)
    // unionByName fills the missing side's struct with a correctly-typed
    // NULL; ascending __p puts the max-tieBreak right row last among
    // same-ts rights, so the carried last value is the deterministic pick.
    val u = r.unionByName(l, allowMissingColumns = true)
    val w = Window.partitionBy(ks.map(col): _*)
      .orderBy(col("__t").asc, col("__tag").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__c", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === leftTag && col("__l").isNotNull)
      .select(col("__l.*") +:
        payload.map(p => col("__c").getField(p).as(outPrefix + p)): _*)
  }

  /** [[asofJoin]] semantics through the NATIVE plan node
    * (`plans.AsOfJoinNode` → `AsOfJoinExec`, injected by
    * `GraftExtensions`): the same one-exchange-per-side scale shape, but
    * the sorts are per-side (narrower rows, no union widening) and the
    * carry is a single O(1)-state merge pass instead of window-frame
    * machinery — and downstream sees `outputOrdering = (key, ts)`.
    * TemporalSpec pins bit-for-bit parity with [[asofJoin]] (ties, NULL
    * keys, NULL timestamps, inclusive/exclusive). Requires a session built
    * with `GraftExtensions` (Sessions.local registers it).
    */
  def asofJoinNative(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      payload: Seq[String], tieBreak: String,
      inclusive: Boolean = true, outPrefix: String = ""): DataFrame =
    graft.plans.AsOfJoinPlan.dataFrame(left, Seq(leftKey), leftTs,
      right, Seq(rightKey), rightTs, payload, tieBreak, inclusive, outPrefix)

  /** [[asofJoinNative]] over a composite key — the native analog of
    * [[asofJoinKeys]] (lexicographic key merge, same per-column
    * nulls-first rule). TemporalSpec pins composite-key parity.
    */
  def asofJoinNativeKeys(
      left: DataFrame, leftKeys: Seq[String], leftTs: String,
      right: DataFrame, rightKeys: Seq[String], rightTs: String,
      payload: Seq[String], tieBreak: String,
      inclusive: Boolean = true, outPrefix: String = ""): DataFrame =
    graft.plans.AsOfJoinPlan.dataFrame(left, leftKeys, leftTs,
      right, rightKeys, rightTs, payload, tieBreak, inclusive, outPrefix)

  /** Hot-key as-of join: [[asofJoin]] semantics (same output, bit for bit),
    * but no task ever sorts a key's FULL history — the cure for the
    * straggler [[asofJoin]]'s scale note warns about (a handful of hot keys
    * over unbounded history).
    *
    * Decomposition, all shuffle-once equi primitives:
    *  1. WITHIN-BUCKET as-of: both sides get `bucket = floor(ts/W)` and run
    *     the tag-union-window with partition key (key, bucket) — window
    *     size is bounded by events-per-bucket, not events-per-key.
    *  2. BUCKET SUMMARIES: per (key, bucket), the right side's latest
    *     payload — one `max(struct(ts, tieBreak, payload))` aggregate
    *     (lexicographic struct max = the as-of tie rule).
    *  3. CROSS-BUCKET CARRY: for each DISTINCT left (key, bucket), the
    *     latest summary from any STRICTLY-earlier bucket — an exclusive
    *     as-of on the bucket index. This window is per key over bucket
    *     SUMMARIES (history compressed ~events-per-bucket-fold), the one
    *     deliberately key-partitioned stage.
    *  4. Stitch: left-outer equi-join of (1) with (3) on (key, bucket);
    *     within-bucket match wins, else the carried one.
    *
    * `bucketSec` trades summary-table size against in-bucket window size;
    * pick W so a hot key's events-per-W fit a task sort (e.g. hour/day).
    * Timestamps are bucketed at microsecond precision (`unix_micros`), like
    * [[rangeJoin]]. `inclusive` has the same same-ts semantics as
    * [[asofJoin]] (cross-bucket carry is unaffected: an earlier bucket is
    * strictly earlier in time).
    */
  def asofJoinBucketed(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      payload: Seq[String], tieBreak: String, bucketSec: Long,
      inclusive: Boolean = true, outPrefix: String = ""): DataFrame = {
    require(bucketSec > 0, s"asofJoinBucketed: bucketSec ($bucketSec) must be > 0")
    val widthUs = bucketSec * 1000000L
    def bucket(ts: String): Column =
      floor(unix_micros(col(ts).cast("timestamp")) / widthUs)

    val l2 = left.withColumn("__lb", bucket(leftTs))
    val r2 = right.withColumn("__rb", bucket(rightTs))

    // 1. within-bucket as-of (composite key: key + bucket)
    val within = asofJoinKeys(l2, Seq(leftKey, "__lb"), leftTs,
      r2, Seq(rightKey, "__rb"), rightTs, payload, tieBreak, inclusive, "__in_")

    // 2. per-(key, bucket) latest right payload; struct max is
    //    lexicographic: max ts, then max tieBreak — the as-of tie rule
    val summary = r2.groupBy(col(rightKey).as("__sk"), col("__rb").as("__sb"))
      .agg(max(struct(
        unix_micros(col(rightTs).cast("timestamp")).as("__us"),
        col(tieBreak).as("__tb"),
        struct(payload.map(col): _*).as("__pp"))).as("__m"))
      .select(col("__sk") +: col("__sb") +:
        payload.map(p => col("__m.__pp").getField(p).as(p)): _*)

    // 3. exclusive as-of on the bucket index (inclusive=false ⇒ summary
    //    bucket STRICTLY below the left bucket — same-bucket rights were
    //    fully handled in step 1), one row per distinct left (key, bucket)
    val lb = l2.select(col(leftKey), col("__lb")).distinct()
    val carry = asofJoinKeys(lb, Seq(leftKey), "__lb",
      summary, Seq("__sk"), "__sb",
      payload, tieBreak = "__sb", inclusive = false, "__pr_")

    within.join(carry, Seq(leftKey, "__lb"), "left_outer")
      .select(left.columns.map(col) ++ payload.map(p =>
        coalesce(col("__in_" + p), col("__pr_" + p)).as(outPrefix + p)): _*)
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
