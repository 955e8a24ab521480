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

  test("streaming windowed aggregation with watermark (tumbling counts)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val counted = mem.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"))
    val q = counted.writeStream.format("memory").queryName("win_out")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("win_ckpt").toString)
      .start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData((ts("2024-01-10 08:05:00"), "click"),
      (ts("2024-01-10 08:40:00"), "click"),
      (ts("2024-01-10 08:45:00"), "view"))
    q.processAllAvailable()
    // advance watermark past 09:00 + 10min so the 08:00 window closes
    mem.addData((ts("2024-01-10 09:20:00"), "click"))
    q.processAllAvailable()
    mem.addData((ts("2024-01-10 11:00:00"), "view"))
    q.processAllAvailable()
    val rows = spark.table("win_out")
      .select("ws", "event_type", "cnt")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    q.stop()
    // append mode emits only CLOSED windows: the 11:00 event advanced the
    // watermark past both the 08:00 and 09:00 hours
    assert(rows == Set(
      (ts("2024-01-10 08:00:00"), "click", 2L),
      (ts("2024-01-10 08:00:00"), "view", 1L),
      (ts("2024-01-10 09:00:00"), "click", 1L)))
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

  test("compact-ledger sink dedups re-delivery without full-sink reads") {
    implicit val sqlCtx = spark.sqlContext
    val sink = Files.createTempDirectory("graft_csink").toString + "/ledger"
    val ckpt = Files.createTempDirectory("graft_cckpt").toString

    val mem = MemoryStream[(String, String, String)]
    val parsed = InventoryStream.parse(
      mem.toDF().toDF("file", "url", "modified_raw"))
    def runOnce(): Unit = {
      val q = InventoryStream.dedupAppendSinkCompact(parsed, sink,
          Seq("file", "url"), compactEvery = 2)
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
    }

    // 3 batches; every batch re-delivers Mon.zip, batch 2/3 add a new row
    mem.addData(("OCG_KE1_NBO-Mon.zip", "u1", "2024-01-10T08:00:00Z"))
    runOnce()
    mem.addData(
      ("OCG_KE1_NBO-Mon.zip", "u1", "2024-01-10T08:00:00Z"),
      ("OCG_KE1_NBO-Tue.zip", "u2", "2024-01-11T08:00:00Z"))
    runOnce() // batchId 1: triggers the compaction rewrite (compactEvery=2)
    mem.addData(
      ("OCG_KE1_NBO-Mon.zip", "u1", "2024-01-10T08:00:00Z"),
      ("OCG_KE1_NBO-Wed.zip", "u3", "2024-01-12T08:00:00Z"))
    runOnce()

    val rows = spark.read.parquet(sink)
      .select("file").as[String].collect().toSeq
    assert(rows.sorted == Seq("OCG_KE1_NBO-Mon.zip", "OCG_KE1_NBO-Tue.zip",
      "OCG_KE1_NBO-Wed.zip")) // exactly once each — re-deliveries vanished
    // the keys-only sidecar exists and matches the sink's key set
    val ledger = spark.read.parquet(sink + "__keys")
    assert(ledger.columns.toSeq == Seq("file", "url"))
    assert(ledger.dropDuplicates("file", "url").count() == 3)
  }

  test("decodeImages runs on a streaming source (batched mapPartitions " +
      "is stream-safe; real ImageIO decode per micro-batch)") {
    import graft.operators.Multimodal
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Byte])]
    val media = mem.toDS().map { case (id, b) =>
      Multimodal.MediaRecord(id, b, "application/octet-stream") }
    val q = Multimodal.decodeImages(media, batchSize = 2)
      .writeStream.format("memory").queryName("img_out")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, Multimodal.encodeGrayPng(4, 2, 10)),
        (2L, Multimodal.encodeGrayPng(1, 3, 255)),
        (3L, "not an image".getBytes("UTF-8")))
      q.processAllAvailable()
      mem.addData((4L, Multimodal.encodeGrayPng(2, 2, 0)))
      q.processAllAvailable()
      val got = spark.table("img_out").as[Multimodal.DecodedImage]
        .collect().sortBy(_.media_id).toSeq
      assert(got == Seq(
        Multimodal.DecodedImage(1L, 4, 2, 1, 100000L),
        Multimodal.DecodedImage(2L, 1, 3, 1, 2550000L),
        Multimodal.DecodedImage(3L, 0, 0, 0, -1L),
        Multimodal.DecodedImage(4L, 2, 2, 1, 0L)))
    } finally q.stop()
  }

  test("streaming URL dedup: canonical key + watermarked dropDuplicates " +
      "folds decorations of one page to a single emitted row") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val canon = mem.toDS().toDF("ts", "url")
      .withColumn("curl", graft.operators.Curation.canonicalizeUrl(org.apache.spark.sql.functions.col("url")))
      .withWatermark("ts", "10 minutes")
      // WithinWatermark: dedup state is bounded by the watermark instead of
      // growing forever — the only form that survives an unbounded crawl
      .dropDuplicatesWithinWatermark("curl")
    val q = canon.writeStream.format("memory").queryName("urldedup_out")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      mem.addData(
        (t0, "https://EX.com/p?utm_source=f"),
        (t0, "https://ex.com/p#frag"),
        (t0, "https://ex.com/p/index.html"),
        (t0, "https://ex.com/other"))
      q.processAllAvailable()
      // second batch: one more decoration of the same page + one new page
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), "https://ex.com/p/"),
        (java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), "https://ex.com/new"))
      q.processAllAvailable()
      val got = spark.table("urldedup_out").select("curl")
        .as[String].collect().toSeq.sorted
      assert(got == Seq("https://ex.com/new", "https://ex.com/other",
        "https://ex.com/p"))
    } finally q.stop()
  }
}
