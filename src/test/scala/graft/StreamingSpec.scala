package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.InventoryStream

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming inventory: watermark dedup + exactly-once-effect sink") {
    implicit val sqlCtx = spark.sqlContext
    val sink = Files.createTempDirectory("graft_sink").toString + "/ledger"
    val ckpt = Files.createTempDirectory("graft_ckpt").toString

    val mem = MemoryStream[(String, String, String)]
    val parsed = InventoryStream.parse(
      mem.toDF().toDF("file", "url", "modified_raw"))

    // batch 1: one valid zip, one duplicate delivery, one non-zip
    mem.addData(
      ("OCG_KE1_NBO-Mon.zip", "u1", "2024-01-10T08:00:00Z"),
      ("OCG_KE1_NBO-Mon.zip", "u1", "2024-01-10T08:00:00Z"),
      ("junk.txt", "u9", "2024-01-10T08:00:00Z"))
    val q1 = InventoryStream.dedupAppendSink(parsed, sink, Seq("file", "url"))
      .option("checkpointLocation", ckpt).start()
    q1.awaitTermination()
    assert(spark.read.parquet(sink).count() == 1)

    // batch 2: re-delivery of the same row + one new row
    mem.addData(
      ("OCG_KE1_NBO-Mon.zip", "u1", "2024-01-10T08:00:00Z"),
      ("OCG_KE1_NBO-Tue.zip", "u2", "2024-01-11T08:00:00Z"))
    val q2 = InventoryStream.dedupAppendSink(parsed, sink, Seq("file", "url"))
      .option("checkpointLocation", ckpt).start()
    q2.awaitTermination()

    val rows = spark.read.parquet(sink)
      .select("file", "instance").as[(String, String)].collect().toSet
    assert(rows == Set(
      ("OCG_KE1_NBO-Mon.zip", "OCG_KE1_NBO"),
      ("OCG_KE1_NBO-Tue.zip", "OCG_KE1_NBO")))
  }
}
