package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.FunnelStream

class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming funnel: cross-batch advances, ledger rows only on " +
       "change, in-order parity with the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Int)] // (user, epoch-us, step)
    val q = FunnelStream.track(mem.toDS(), k = 3)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 views then clicks; user 2 clicks only (no view —
      // nothing matches, no ledger row)
      mem.addData((1L, 1000L, 0), (1L, 2000L, 1), (2L, 1500L, 1))
      q.processAllAvailable()
      val b1 = spark.table("funnel_stream")
        .as[FunnelStream.FunnelUpdate].collect()
      assert(b1.toSeq == Seq(FunnelStream.FunnelUpdate(1L, 2, 2000L)))

      // batch 2: user 1 purchases (advance → row); user 2 views (first
      // match → row); a LATE user-1 view cannot retro-improve
      mem.addData((1L, 3000L, 2), (2L, 2500L, 0), (1L, 500L, 0))
      q.processAllAvailable()
      val b2 = spark.table("funnel_stream")
        .as[FunnelStream.FunnelUpdate].collect().toSet
      assert(b2 == Set(
        FunnelStream.FunnelUpdate(1L, 2, 2000L),
        FunnelStream.FunnelUpdate(1L, 3, 3000L),
        FunnelStream.FunnelUpdate(2L, 1, 2500L)))

      // batch 3: no advances (repeat events) → no new rows
      mem.addData((1L, 4000L, 1), (2L, 2600L, 0))
      q.processAllAvailable()
      assert(spark.table("funnel_stream").count() == 3L)
    } finally q.stop()
  }

  test("streaming funnel final state equals the batch operator for " +
       "in-order ingest (strict-ordering ties included)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Journeys
    val types = Seq("view", "click", "purchase")
    // same fixture as JourneysSpec incl. the exact-tie user
    val events = Seq(
      (1L, 1000L, "view"), (1L, 2000L, "click"), (1L, 3000L, "purchase"),
      (2L, 900L, "click"), (2L, 1000L, "view"), (2L, 1100L, "click"),
      (3L, 1000L, "purchase"),
      (4L, 1000L, "view"),
      (5L, 1000L, "view"), (5L, 1000L, "click"))
    val mem = MemoryStream[(Long, Long, Int)]
    val q = FunnelStream.track(mem.toDS(), k = 3)
      .writeStream.format("memory").queryName("funnel_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(events.map { case (u, us, t) => (u, us, types.indexOf(t)) })
      q.processAllAvailable()
      // newest ledger row per user = that user's final steps_reached
      val streamed = spark.table("funnel_parity")
        .as[FunnelStream.FunnelUpdate].collect()
        .groupBy(_.user).view.mapValues(_.map(_.steps_reached).max).toMap
      val batch = Journeys.funnelSteps(
          events.map { case (u, us, t) =>
            (u, new java.sql.Timestamp(us), t) } // us-as-ms: order-preserving
            .toDF("user_id", "ts", "event_type"),
          "user_id", "ts", "event_type", types)
        .select("user_id", "steps_reached").as[(Long, Long)].collect().toMap
      // batch emits only entrants; streamed emits only matched users —
      // compare on the union of keys with 0 as the absent default
      val keys = streamed.keySet ++ batch.keySet
      for (u <- keys)
        assert(streamed.getOrElse(u, 0).toLong ==
          batch.getOrElse(u, 0L), s"user $u")
    } finally q.stop()
  }
}
