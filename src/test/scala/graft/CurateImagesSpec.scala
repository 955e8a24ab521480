package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord
import graft.pipeline.CurateImages
import graft.pipeline.CurateImages.ImageCurateConfig

/** Image curation funnel: decode gate, exact payload dedup, pHash
  * near-dup components, and the per-input ledger contract.
  */
class CurateImagesSpec extends SparkSpec {
  import spark.implicits._

  private def mix(id: Long, p: Long): Long = {
    var z = id * 0x9E3779B97F4A7C15L + p * 0xC2B2AE3D27D4EB4FL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    (z ^ (z >>> 27)) & 0xffL
  }
  private def png(seed: Long, nudge: Int): Array[Byte] =
    Multimodal.encodeGrayPixelsPng(16, 16,
      Array.tabulate(256)(p => (mix(seed, p.toLong).toInt +
        (if (p < 40) nudge else 0)).min(255)))

  test("CurateImages.run: stage counts and ledger verdicts match the " +
      "planted structure (undecodable, exact pair, near pair)") {
    val shared = png(1, 0) // one byte-identical payload, two ids
    val recs = Seq(
      MediaRecord(11L, shared, "image/png"),
      MediaRecord(12L, shared, "image/png"),          // exact dup of 11
      MediaRecord(21L, png(2, 0), "image/png"),
      MediaRecord(22L, png(2, 7), "image/png"),       // near dup of 21
      MediaRecord(40L, png(40, 0), "image/png"),
      MediaRecord(41L, png(41, 0), "image/png"),
      MediaRecord(99L, Array[Byte](9, 9, 9), "image/png")) // garbage
    // the planted structure actually holds under the hash: the pair is
    // within the cut, the unrelated images are not
    val h = Multimodal.imagePHash(recs.toDS()).collect()
      .map(x => x.media_id -> x.phash).toMap
    assert(java.lang.Long.bitCount(h(21L) ^ h(22L)) <= 3)
    assert(java.lang.Long.bitCount(h(21L) ^ h(40L)) > 3)
    assert(java.lang.Long.bitCount(h(40L) ^ h(41L)) > 3)
    val res = CurateImages.run(recs.toDS(),
      ImageCurateConfig(emitLedger = true))
    assert(res.stageCounts == Seq(
      "decode" -> 6L, "exact_dedup" -> 5L, "near_dup" -> 4L))
    assert(res.kept.select("media_id").as[Long].collect().sorted.toSeq
      == Seq(11L, 21L, 40L, 41L))
    val led = res.ledger.get
      .select("id", "admitted", "reason", "dup_of")
      .as[(Long, Boolean, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(led.size == recs.size) // one verdict per INPUT image
    assert(led(99L) == ((99L, false, "undecodable", 99L)))
    assert(led(12L) == ((12L, false, "exact_dup", 11L)))
    assert(led(22L) == ((22L, false, "near_dup", 21L))) // component label
    for (id <- Seq(11L, 21L, 40L, 41L))
      assert(led(id) == ((id, true, "admitted", id)))
    res.kept.unpersist()
  }

  test("image funnel stage checkpoints: a killed run resumes from the " +
      "committed signature table — identical outputs, provably without " +
      "re-decoding") {
    val shared = png(1, 0)
    val recs = Seq(
      MediaRecord(11L, shared, "image/png"),
      MediaRecord(12L, shared, "image/png"),
      MediaRecord(21L, png(2, 0), "image/png"),
      MediaRecord(22L, png(2, 7), "image/png"),
      MediaRecord(40L, png(40, 0), "image/png"),
      MediaRecord(99L, Array[Byte](9), "image/png"))
    def summarize(r: graft.pipeline.CurateImages.ImageCurateResult) = {
      val out = (r.stageCounts,
        r.kept.collect().map(_.toString).sorted.toSeq,
        r.ledger.get.select("id", "admitted", "reason", "dup_of")
          .as[(Long, Boolean, String, Long)].collect().toSet)
      r.kept.unpersist()
      out
    }
    val base = ImageCurateConfig(emitLedger = true)
    val ref = summarize(CurateImages.run(recs.toDS(), base))
    val wh = java.nio.file.Files
      .createTempDirectory("graft_imgck").toString
    val ckCfg = base.copy(stageCheckpointDir = Some(wh))
    assert(summarize(CurateImages.run(recs.toDS(), ckCfg)) == ref)
    // kill after the decode stage committed: drop every LATER marker
    // (data dirs may remain — the crash shape)
    val fs = new org.apache.hadoop.fs.Path(wh).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    for (db <- Seq("img_exact", "img_near", "img_led_exact_dup",
        "img_led_near_dup"))
      fs.delete(new org.apache.hadoop.fs.Path(wh, s"$db.commit"), false)
    // resume with POISONED input (zero images): identical outputs prove
    // the committed signature table was READ — any re-decode would zero
    // the funnel
    val resumed = summarize(CurateImages.run(
      spark.emptyDataset[MediaRecord],
      ckCfg.copy(resume = true, runToken = "1")))
    assert(resumed == ref)
    // config fingerprint guard: resume under a different config is loud
    val drifted = intercept[IllegalArgumentException] {
      CurateImages.run(recs.toDS(),
        ckCfg.copy(resume = true, runToken = "2", maxHamming = 1))
    }
    assert(drifted.getMessage.contains("DIFFERENT config"))
    // the SEM dials are part of the fingerprint too (ADVICE r16): a
    // resume with a changed sem config must not serve committed img_sem
    val semDrift = intercept[IllegalArgumentException] {
      CurateImages.run(recs.toDS(),
        ckCfg.copy(resume = true, runToken = "3",
          semDedupThresholdE4 = Some(9500L)))
    }
    assert(semDrift.getMessage.contains("DIFFERENT config"))
  }

  test("batch funnel rejects undecodables where the stream gate admits " +
      "them — the deliberate divergence, pinned") {
    val recs = Seq(MediaRecord(1L, png(1, 0), "image/png"),
      MediaRecord(9L, Array[Byte](1), "image/png"))
    val batch = CurateImages.run(recs.toDS(),
      ImageCurateConfig(emitLedger = true))
    assert(batch.ledger.get.filter(col("id") === 9L)
      .select("admitted").as[Boolean].head() == false)
    batch.kept.unpersist()
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[MediaRecord](spark)
    val q = graft.streaming.PhashStream.gateVerdicts(input.toDS())
      .writeStream.format("memory").queryName("ci_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    try {
      input.addData(recs: _*)
      q.processAllAvailable()
      val got = spark.table("ci_stream")
        .filter(col("id") === 9L).select("admitted")
        .as[Boolean].collect().toSeq
      assert(got == Seq(true)) // the stream gate admits the marker
    } finally q.stop()
  }

  test("image funnel SEMANTIC stage: a re-grained copy survives pHash " +
      "near-dup and falls to sem_dup with the canonical's lineage") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.MediaRecord
    import graft.pipeline.CurateImages
    def wv(f: Int, x: Int): Int =
      math.round(10.0 * math.cos(math.Pi * 2 * f * x / 16)).toInt
    def noise(id: Long, x: Int, y: Int): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$x:$y".getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 41L).toInt - 20
    }
    def scene(id: Long, pattern: Long): MediaRecord = {
      val fx = (pattern % 3).toInt + 1
      val fy = ((pattern / 3) % 3).toInt + 1
      MediaRecord(id, Multimodal.encodeGrayPixelsPng(16, 16,
        Array.tabulate(256) { p =>
          val (x, y) = (p % 16, p / 16)
          128 + wv(fx, x) * wv(fy, y) + noise(id, x, y)
        }), "image/png")
    }
    val media = Seq(scene(1L, 1), scene(2L, 1), // re-grain pair
      scene(5L, 2)).toDS()                       // orthogonal scene
    val res = CurateImages.run(media,
      CurateImages.ImageCurateConfig(semDedupThresholdE4 = Some(9000L),
        semGrid = 8, semCentroidEvery = 2, emitLedger = true))
    val c = res.stageCounts.toMap
    assert(c("near_dup") == 3L, res.stageCounts.toString)
    assert(c("sem_dup") == 2L, res.stageCounts.toString)
    val led = res.ledger.get.select("id", "admitted", "reason", "dup_of")
      .as[(Long, Boolean, String, Long)].collect()
      .map(v => v._1 -> ((v._2, v._3, v._4))).toMap
    assert(led(1L) == ((true, "admitted", 1L)))
    assert(led(2L) == ((false, "sem_dup", 1L)))
    assert(led(5L) == ((true, "admitted", 5L)))
    assert(res.kept.select("media_id").as[Long].collect().toSet ==
      Set(1L, 5L))
  }
}
