package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** User-journey analytics over event streams: ordered funnel-step
  * matching and cohort retention — the two classic product-analytics
  * queries a warehouse team runs daily over exactly this `events` shape.
  *
  * Scale shape: both operators are chains of user-keyed hash aggregates
  * and equi joins (partial-agg combines map-side; the per-step frames are
  * user-bounded, far below event count) — no windows over a user's full
  * history, no sorts, no state proportional to events per user.
  */
object Journeys {

  /** Ordered funnel: for each user who performed `steps.head`, the
    * earliest time of each SUBSEQUENT step that happened strictly after
    * the previous step's matched time — the standard "view → click →
    * purchase" conversion question with strict event ordering (a click
    * before the first view does not count).
    *
    * Output: (userCol, t0..t{k-1} — step-match timestamps, NULL once the
    * funnel broke — plus `steps_reached`). Only funnel ENTRANTS (users
    * with a step-0 event) appear; per-user rows are unique.
    *
    * Shape: one filtered min-aggregate per step + one user-keyed join
    * back — k bounded shuffles on the user key, no per-user sort. The
    * sequential dependence (step k's window opens at step k-1's match)
    * is the funnel DEFINITION, so k passes is the minimum work; each
    * pass's left side is the step-k event slice, pushed down to the scan.
    */
  def funnelSteps(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelSteps: at least one step")
    require(steps.distinct.size == steps.size,
      "funnelSteps: repeated step types are ambiguous")
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(userCol).agg(min(tsCol).as("t0"))
    for (k <- 1 until steps.size) {
      val tk = events.filter(col(typeCol) === steps(k))
        .select(col(userCol), col(tsCol).as("__ts"))
        .join(cur.select(col(userCol), col(s"t${k - 1}")), Seq(userCol))
        .filter(col("__ts") > col(s"t${k - 1}"))
        .groupBy(userCol).agg(min(col("__ts")).as(s"t$k"))
      cur = cur.join(tk, Seq(userCol), "left_outer")
    }
    val reached = steps.indices.map(k =>
      col(s"t$k").isNotNull.cast("long")).reduce(_ + _)
    cur.withColumn("steps_reached", reached)
  }

  /** Weekly cohort retention: users grouped by the week of their FIRST
    * event; for each (cohort week, weeks-since-first k) the count of
    * cohort members active in week k and the retention rate against the
    * cohort size. Week indexing is pure integer day arithmetic from the
    * Monday epoch (1970-01-05) — engine-stable, no locale/week-start
    * semantics in play.
    *
    * Output: (cohort_wk, period_wk, active_users, cohort_size,
    * retention_e4), period 0 always present with retention 10000.
    * Shape: one user min-aggregate, one join back to events (user-keyed),
    * one distinct-count aggregate on (cohort, period), one bounded join
    * for the rate — all hash-partitioned, no windows.
    */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val mondayEpoch = to_date(lit("1970-01-05"))
    def wk(c: org.apache.spark.sql.Column) =
      floor(datediff(c.cast("date"), mondayEpoch) / 7).cast("long")
    val first = events.groupBy(userCol).agg(min(tsCol).as("__first"))
      .select(col(userCol), wk(col("__first")).as("cohort_wk"))
    val activity = events.select(col(userCol), col(tsCol))
      .join(first, Seq(userCol))
      .select(col(userCol), col("cohort_wk"),
        (wk(col(tsCol)) - col("cohort_wk")).as("period_wk"))
      .groupBy("cohort_wk", "period_wk")
      .agg(countDistinct(col(userCol)).as("active_users"))
    val sizes = first.groupBy("cohort_wk")
      .agg(countDistinct(col(userCol)).as("cohort_size"))
    activity.join(sizes, Seq("cohort_wk"))
      .select(col("cohort_wk"), col("period_wk"), col("active_users"),
        col("cohort_size"),
        graft.core.Ops.fixedPoint(
          col("active_users") * lit(1.0) / col("cohort_size"), 4)
          .as("retention_e4"))
  }
}
