package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.SessionizeStream

class SessionizeStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("streaming sessions finalize when the watermark passes, merge within " +
       "gap, and late-beyond-watermark events are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val sessions = SessionizeStream.sessions(
      mem.toDF().toDF("ts", "user"), "user", "ts",
      gap = "10 minutes", watermark = "5 minutes")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_sess_ckpt").toString
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      // two events 5 min apart (one session), one lone event for user b
      mem.addData((ts(0), "a"), (ts(300), "a"), (ts(100), "b"))
      q.processAllAvailable()
      // nothing final yet: watermark is still behind the session ends
      assert(spark.table("sess_out").count() == 0)

      // an event far in the future pushes the watermark past everything
      // above; a's merged session and b's singleton both finalize
      mem.addData((ts(10000), "a"))
      q.processAllAvailable()
      val done = spark.table("sess_out")
        .select(col("user"), col("session_start").cast("long"),
          col("session_end").cast("long"), col("n_events"))
        .as[(String, Long, Long, Long)].collect().toSet
      assert(done == Set(
        ("a", 0L, 300L + 600L, 2L),   // session end = last event + gap
        ("b", 100L, 100L + 600L, 1L)))

      // an event behind the watermark (t=200 << 10000-300) is late data:
      // dropped, no new session appears for it after another advance
      mem.addData((ts(200), "b"), (ts(30000), "a"))
      q.processAllAvailable()
      val users = spark.table("sess_out")
        .select(col("user"), col("session_start").cast("long"))
        .as[(String, Long)].collect().toSet
      assert(!users.contains(("b", 200L)))
    } finally q.stop()
  }

  test("batch sessionCounts matches the q49 cumulative-window encoding " +
       "away from exact-gap boundaries") {
    // gaps of 601s split, 599s merge, vs gap=600s sessions
    val events = Seq(
      ("u1", 0L), ("u1", 599L), ("u1", 1500L),      // 2 sessions
      ("u2", 0L), ("u2", 601L), ("u2", 1300L),      // 2 sessions (merge 2nd)
      ("u3", 42L)                                    // 1 session
    ).toDF("user", "sec").withColumn("ts", expr("timestamp_seconds(sec)"))

    val got = SessionizeStream.sessionCounts(events, "user", "ts", "10 minutes")
      .select("user", "n_sessions", "n_events")
      .as[(String, Long, Long)].collect().toSet

    // independent encoding: lag + cumulative sum (the q49 shape)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user").orderBy("sec")
    val want = events
      .withColumn("new_sess",
        when(lag(col("sec"), 1).over(w).isNull ||
          col("sec") - lag(col("sec"), 1).over(w) > 600L, 1).otherwise(0))
      .groupBy("user")
      .agg(sum("new_sess").cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("exact-gap boundary: session_window merges touching windows, " +
       "matching the batch encoding's diff > gap rule") {
    val events = Seq(("u", 0L), ("u", 600L), ("u", 1201L))
      .toDF("user", "sec").withColumn("ts", expr("timestamp_seconds(sec)"))
    val sw = SessionizeStream.sessionCounts(events, "user", "ts", "10 minutes")
      .select("n_sessions").as[Long].head()
    // 0 and 600 are exactly gap apart → one session (Spark merges the
    // touching [0,600) and [600,1200) windows); 1201 is 601s later → new
    assert(sw == 2L)
  }
}
