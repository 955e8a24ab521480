package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.AsOfStream

class AsOfStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("bounded-lag streaming as-of: latest right within lag wins, ties " +
       "break on tieBreak, outside-lag and unmatched lefts get NULL") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Long, String, Timestamp)]   // (id, key, ts)
    val rMem = MemoryStream[(String, Timestamp, Long)]   // (key, ts, rid)

    val out = AsOfStream.asofBoundedLag(
      lMem.toDF().toDF("id", "k", "lt"), "k", "lt", "id",
      rMem.toDF().toDF("k", "rt", "rid"), "k", "rt",
      payload = Seq("rid"), tieBreak = "rid",
      maxLag = "10 minutes", watermarkDelay = "1 minute",
      windowSize = "1 minute")

    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_asof_stream_ckpt").toString
    val q = out.writeStream.format("memory").queryName("asof_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      // rights: two for key a (one in-lag, one tie pair), none for key c
      rMem.addData(("a", ts(100), 10L), ("a", ts(200), 11L),
        ("a", ts(200), 12L), ("b", ts(50), 20L))
      // lefts: id 1 sees a's rows at/before 250 (11 vs 12 tie at 200 →
      // max rid 12); id 2's only candidate is outside the 10-min lag;
      // id 3's key never appears on the right
      lMem.addData((1L, "a", ts(250)), (2L, "b", ts(800)), (3L, "c", ts(300)))
      q.processAllAvailable()
      // watermark far ahead: windows finalize, outer-join nulls flush
      lMem.addData((99L, "zz", ts(100000)))
      rMem.addData(("zz", ts(100000), 0L))
      q.processAllAvailable()
      lMem.addData((98L, "zz", ts(200000)))
      rMem.addData(("zz", ts(200000), 0L))
      q.processAllAvailable()

      val got = spark.table("asof_out")
        .filter(col("id") < 90)
        .select("id", "rid").as[(Long, Option[Long])].collect().toMap
      assert(got == Map(
        1L -> Some(12L),  // latest in-lag right; tie at ts=200 → rid 12
        2L -> None,       // right exists but 750s > 10-min lag
        3L -> None))      // key with no rights at all
    } finally q.stop()
  }
}
