package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.InventoryStream

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("file-source streaming: CSV listing drops flow through parse + ledger sink") {
    val src = Files.createTempDirectory("graft_stream_src").toString
    val sink = Files.createTempDirectory("graft_stream_sink").toString + "/ledger"
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString

    def drop(name: String, rows: Seq[String]): Unit = {
      val p = java.nio.file.Paths.get(src, name)
      Files.writeString(p, rows.mkString("\n"))
    }
    // first listing poll lands
    drop("poll1.csv", Seq(
      "OCG_KE1_NBO-Mon.zip,u1,2024-01-10T08:00:00Z",
      "junk.txt,u9,2024-01-10T08:00:00Z"))

    val schema = "file STRING, url STRING, modified_raw STRING"
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).csv(src)
      val q = InventoryStream.dedupAppendSink(
          InventoryStream.parse(stream), sink, Seq("file", "url"))
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(sink).count() == 1)

    // second poll re-lists the same file (overlap) plus a NEWER one.
    // (A row older than watermark − 15 min would be dropped as late data
    // by the in-watermark dedup — that's the OP-48 guard working.)
    drop("poll2.csv", Seq(
      "OCG_KE1_NBO-Mon.zip,u1,2024-01-10T08:00:00Z",
      "OCA_TD1_ABC-Sun.zip,u3,2024-01-10T09:00:00Z"))
    runOnce()
    val rows = spark.read.parquet(sink)
      .select("file", "instance").as[(String, String)].collect().toSet
    assert(rows == Set(
      ("OCG_KE1_NBO-Mon.zip", "OCG_KE1_NBO"),
      ("OCA_TD1_ABC-Sun.zip", "OCA_TD1_ABC")))
  }

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
