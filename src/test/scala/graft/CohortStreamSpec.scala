package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.CohortStream

class CohortStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming cohort credits: one increment per new (cohort, period); " +
       "summed credits equal the batch operator's active_users") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)] // (user, week)
    val q = CohortStream.credits(mem.toDS())
      .writeStream.format("memory").queryName("cohort_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: users 1, 2 first seen in week 100; user 3 in week 101
      mem.addData((1L, 100L), (2L, 100L), (3L, 101L))
      q.processAllAvailable()
      // batch 2: user 1 active weeks 101 + 102; user 3 again in 102;
      // user 2 repeats week 100 (no new credit)
      mem.addData((1L, 101L), (1L, 102L), (3L, 102L), (2L, 100L))
      q.processAllAvailable()
      val got = spark.table("cohort_stream")
        .as[CohortStream.CohortCredit].collect().toSet
      assert(got == Set(
        CohortStream.CohortCredit(1L, 100L, 0L),
        CohortStream.CohortCredit(2L, 100L, 0L),
        CohortStream.CohortCredit(3L, 101L, 0L),
        CohortStream.CohortCredit(1L, 100L, 1L),
        CohortStream.CohortCredit(1L, 100L, 2L),
        CohortStream.CohortCredit(3L, 101L, 1L)))

      // running sum of credits per (cohort, period) == the batch
      // operator's active_users on the equivalent event set
      val streamedCounts = got.groupBy(c => (c.cohort_wk, c.period_wk))
        .view.mapValues(_.size.toLong).toMap
      // weeks map directly: events at week-index * 7 days after the
      // Monday epoch 1970-01-05
      val events = Seq((1L, 100L), (2L, 100L), (3L, 101L), (1L, 101L),
        (1L, 102L), (3L, 102L), (2L, 100L)).map { case (u, w) =>
        (u, java.sql.Timestamp.valueOf(
          java.time.LocalDate.parse("1970-01-05").plusDays(w * 7)
            .atStartOfDay()))
      }.toDF("user_id", "ts")
      val batch = graft.operators.Journeys
        .cohortRetention(events, "user_id", "ts")
        .select("cohort_wk", "period_wk", "active_users")
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(streamedCounts == batch, s"$streamedCounts vs $batch")
    } finally q.stop()
  }

  test("late earlier-week events cannot re-cohort a user") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = CohortStream.credits(mem.toDS())
      .writeStream.format("memory").queryName("cohort_stream_late")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, 100L))
      q.processAllAvailable()
      mem.addData((1L, 98L)) // late: period would be negative → dropped
      q.processAllAvailable()
      val got = spark.table("cohort_stream_late")
        .as[CohortStream.CohortCredit].collect().toSeq
      assert(got == Seq(CohortStream.CohortCredit(1L, 100L, 0L)))
    } finally q.stop()
  }

  test("credit horizon: repeat periods dedup via the bitmask; periods at " +
      "or past maxPeriods never emit") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = CohortStream.credits(mem.toDS(), maxPeriods = 128)
      .writeStream.format("memory").queryName("cohort_stream_horizon")
      .outputMode(OutputMode.Append()).start()
    try {
      // periods 0, 64, 127 (word-boundary coverage), then repeats, then
      // past-horizon 128 and 500
      mem.addData((1L, 100L), (1L, 164L), (1L, 227L))
      q.processAllAvailable()
      mem.addData((1L, 164L), (1L, 227L), (1L, 228L), (1L, 600L))
      q.processAllAvailable()
      val got = spark.table("cohort_stream_horizon")
        .as[CohortStream.CohortCredit].collect()
        .map(_.period_wk).sorted.toSeq
      assert(got == Seq(0L, 64L, 127L))
    } finally q.stop()
  }

  test("cohort state schema carries the version discriminator (old " +
       "checkpoints must fail schema validation, not decode garbage)") {
    val schema = implicitly[org.apache.spark.sql.Encoder[
      CohortStream.CohortState]].schema
    assert(schema.fieldNames.toSeq == Seq("ver", "cohortWk", "credited"),
      schema.treeString)
    assert(CohortStream.StateVersion == 2)
  }
}
