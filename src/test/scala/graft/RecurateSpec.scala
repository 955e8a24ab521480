package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{CurateConfig, Increment, IncrementConfig, Recurate,
  Restore}

/** The periodic full re-curation orchestrator (r16 verdict #2): full
  * funnel with pool-relative gates over the accumulated corpus →
  * rebuild every state table into a versioned root → atomic pointer
  * swap; crash before the swap leaves the old root serving.
  */
class RecurateSpec extends SparkSpec {
  import spark.implicits._

  private def goodText(salt: String): String =
    s"the table row scan key " +
      (1 to 24).map(i => s"$salt$i").mkString(" ") + " the a"

  private def verdictMap(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "admitted", "reason", "dup_of")
      .as[(Long, Boolean, String, Long)].collect()
      .map(v => v._1 -> ((v._2, v._3, v._4))).toMap

  private val bench = Seq(900L -> "benchmark eval only phrase")
    .toDF("doc_id", "text")

  test("recurate: full funnel (incl. the pool-relative ppl-bucket " +
      "gate) → versioned state root → increments serve from it; " +
      "parity with a manually seeded root") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_recur_wh").toString
    // 30 fluent docs + 1 exact dup + gibberish the self-trained KN
    // buckets push to the tail (the pool-relative gate increments
    // cannot run)
    val corpus = ((1L to 30L).map(i => i -> goodText(s"s$i")) ++
      Seq(31L -> goodText("s1"), // exact dup of 1
        40L -> (1 to 26).map(i => s"zq$i xv$i").mkString(" ")))
      .toDF("doc_id", "text")
    val cfg = CurateConfig(minQualityE4 = 0,
      pplBucketsKeep = Some(Set("head", "middle")))
    val r = Recurate.run(spark, wh, "state", "1", corpus, "doc_id",
      "text", bench, "text", cfg)
    // the pointer resolves to the committed root
    val cur = Restore.resolveVersioned(spark, wh, "state")
    assert(cur.map(_.toString).contains(r.versionDir))
    // the base ledger: the exact dup fell, the ppl gate REJECTED at
    // least one tail doc (the pool-relative stage actually ran)
    val led = verdictMap(Increment.readLedger(spark, r.versionDir))
    assert(led(31L) == ((false, "exact_dup", 1L)))
    assert(led.values.exists(_._2 == "ppl"), led.toString)
    assert(led(1L) == ((true, "admitted", 1L)))
    // metrics carry the funnel's stage series under base
    assert(Increment.readMetrics(spark, r.versionDir)
      .filter(col("stage") === "exact_dedup").count() == 1)
    // an increment against the recurated root: exact/near vs state
    val batch = Seq(100L -> goodText("s2"),            // exact dup of 2
      101L -> (goodText("s3") + " appended"),          // near-dup of 3
      102L -> goodText("fresh")).toDF("doc_id", "text")
    val got = verdictMap(Increment.curateIncrement(batch, "doc_id",
      "text", cur.get.toString, "b1").ledger)
    assert(got(100L) == ((false, "exact_dup", 2L)))
    assert(got(101L) == ((false, "near_dup", 3L)))
    assert(got(102L) == ((true, "admitted", 102L)))
    // parity: the same increment against a MANUALLY seeded root over
    // the same admitted docs is verdict-identical
    val manual = java.nio.file.Files
      .createTempDirectory("graft_recur_manual").toString
    val admittedDocs = corpus.join(
      Increment.readLedger(spark, r.versionDir)
        .filter(col("admitted")).select(col("id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    Increment.initStateFromCurated(spark, manual, admittedDocs,
      "doc_id", "text")
    val want = verdictMap(Increment.curateIncrement(batch, "doc_id",
      "text", manual, "b1").ledger)
    assert(got == want)
  }

  test("kill-mid-rebuild: a crashed publish (orphan version dir, no " +
      "pointer swap) leaves the old root serving; the same-token " +
      "retry clears the orphan and completes the swap") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_recur_crash_wh").toString
    val corpus1 = (1L to 8L).map(i => i -> goodText(s"a$i"))
      .toDF("doc_id", "text")
    val cfg = CurateConfig(minQualityE4 = 0)
    val r1 = Recurate.run(spark, wh, "state", "1", corpus1, "doc_id",
      "text", bench, "text", cfg)
    // simulate a crashed second attempt: a half-built version dir
    // exists but its marker never swapped
    val fs = new org.apache.hadoop.fs.Path(wh).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val orphan = new org.apache.hadoop.fs.Path(wh, "state__v2")
    fs.mkdirs(new org.apache.hadoop.fs.Path(orphan, "exact"))
    // old root serves: pointer unchanged, increments run against it
    assert(Restore.resolveVersioned(spark, wh, "state")
      .map(_.toString).contains(r1.versionDir))
    val v = verdictMap(Increment.curateIncrement(
      Seq(100L -> goodText("a1")).toDF("doc_id", "text"), "doc_id",
      "text", r1.versionDir, "b1").ledger)
    assert(v(100L) == ((false, "exact_dup", 1L)))
    // retry with the SAME token: orphan cleared, publish completes
    val corpus2 = (1L to 8L).map(i => i -> goodText(s"b$i"))
      .toDF("doc_id", "text")
    val r2 = Recurate.run(spark, wh, "state", "2", corpus2, "doc_id",
      "text", bench, "text", cfg)
    assert(Restore.resolveVersioned(spark, wh, "state")
      .map(_.toString).contains(r2.versionDir))
    // the new root gates on the NEW pool
    val v2 = verdictMap(Increment.curateIncrement(
      Seq(200L -> goodText("b1"), 201L -> goodText("a1"))
        .toDF("doc_id", "text"), "doc_id", "text", r2.versionDir,
      "b1").ledger)
    assert(v2(200L) == ((false, "exact_dup", 1L)))
    assert(v2(201L) == ((true, "admitted", 201L)))
  }

  test("recurate with the semantic stage rebuilds the sem sub-state: " +
      "the next increment sem-dups a word-permuted twin of recurated " +
      "history") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_recur_sem_wh").toString
    val corpus = (1L to 6L).map(i => i -> goodText(s"c$i"))
      .toDF("doc_id", "text")
    val cfg = CurateConfig(minQualityE4 = 0,
      semDedupThresholdE4 = Some(9500L))
    val r = Recurate.run(spark, wh, "state", "1", corpus, "doc_id",
      "text", bench, "text", cfg)
    def rev(t: String): String = t.split(" ").reverse.mkString(" ")
    val got = verdictMap(Increment.curateIncrement(
      Seq(100L -> rev(goodText("c2"))).toDF("doc_id", "text"),
      "doc_id", "text", r.versionDir, "b1",
      IncrementConfig(minQualityE4 = 0,
        semDedupThresholdE4 = Some(9500L))).ledger)
    assert(got(100L) == ((false, "sem_dup", 2L)), got.toString)
  }

  test("publishState refuses to reuse a COMMITTED token (ADVICE r17): " +
      "a superseded version dir is immutable history, not a crashed " +
      "orphan; unlogged orphans still clear") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_recur_vlog_wh").toString
    val fs = new org.apache.hadoop.fs.Path(wh).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def touch(root: String, name: String): Unit =
      fs.create(new org.apache.hadoop.fs.Path(root, name), true).close()
    Recurate.publishState(spark, wh, "db", "1")(touch(_, "a"))
    Recurate.publishState(spark, wh, "db", "2")(touch(_, "b"))
    // v1 is off-pointer (superseded) but COMMITTED — reuse is refused
    // loudly and the historical dir is untouched
    val e = intercept[IllegalArgumentException] {
      Recurate.publishState(spark, wh, "db", "1")(touch(_, "c"))
    }
    assert(e.getMessage.contains("committed-version log"))
    assert(fs.exists(new org.apache.hadoop.fs.Path(wh, "db__v1/a")))
    assert(Restore.resolveVersioned(spark, wh, "db")
      .map(_.getName).contains("db__v2"))
    // a CRASHED orphan (dir exists, never committed → unlogged) still
    // clears under same-token retry, and the retry commits
    fs.mkdirs(new org.apache.hadoop.fs.Path(wh, "db__v3/half"))
    Recurate.publishState(spark, wh, "db", "3")(touch(_, "d"))
    assert(Restore.resolveVersioned(spark, wh, "db")
      .map(_.getName).contains("db__v3"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(wh, "db__v3/half")))
    // and now-committed v3 refuses reuse too
    intercept[IllegalArgumentException] {
      Recurate.publishState(spark, wh, "db", "3")(touch(_, "e"))
    }
  }

  // ---- media-modality re-curation (r17 verdict #2) -----------------------

  private def vmap2(df: org.apache.spark.sql.DataFrame) =
    df.select("batch_id", "id", "admitted", "reason", "dup_of")
      .as[(String, Long, Boolean, String, Long)].collect()
      .map(v => (v._1, v._2) -> ((v._3, v._4, v._5))).toMap

  private def mix(id: Long, p: Long): Long = {
    var z = id * 0x9E3779B97F4A7C15L + p * 0xC2B2AE3D27D4EB4FL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    (z ^ (z >>> 27)) & 0xffL
  }
  private def png(seed: Long, nudge: Int): Array[Byte] =
    graft.operators.Multimodal.encodeGrayPixelsPng(16, 16,
      Array.tabulate(256)(p => (mix(seed, p.toLong).toInt +
        (if (p < 40) nudge else 0)).min(255)))
  private def img(id: Long, seed: Long, nudge: Int = 0) =
    graft.operators.Multimodal.MediaRecord(id, png(seed, nudge),
      "image/png")

  test("runImage: image funnel over the raw pool → versioned root " +
      "(funnel ledger under base) → increments serve from the " +
      "resolved root; kill-mid-rebuild leaves the old root serving " +
      "and a committed token refuses reuse") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_recur_img_wh").toString
    val shared = png(1, 0)
    val pool = Seq(
      graft.operators.Multimodal.MediaRecord(1L, shared, "image/png"),
      graft.operators.Multimodal.MediaRecord(2L, shared, "image/png"),
      img(3L, 3), img(4L, 3, 7), // near pair: 4 dups onto 3
      graft.operators.Multimodal.MediaRecord(9L, Array[Byte](7),
        "image/png"))
    val r = Recurate.runImage(spark, wh, "img", "1", pool.toDS())
    val root = Restore.resolveVersioned(spark, wh, "img").get.toString
    assert(root == r.versionDir)
    val base = vmap2(Increment.readLedger(spark, root))
    assert(base(("base", 1L)) == ((true, "admitted", 1L)))
    assert(base(("base", 2L)) == ((false, "exact_dup", 1L)))
    assert(base(("base", 3L)) == ((true, "admitted", 3L)))
    assert(base(("base", 4L)) == ((false, "near_dup", 3L)))
    assert(base(("base", 9L)) == ((false, "undecodable", 9L)))
    // metrics carry the funnel series under base
    assert(Increment.readMetrics(spark, root)
      .filter(col("stage") === "exact_dedup").count() == 1)
    // an increment from the resolved root: exact/near vs the rebuilt
    // state, retried idempotently
    val b2 = Seq(
      graft.operators.Multimodal.MediaRecord(10L, shared, "image/png"),
      img(11L, 3, 3), img(30L, 30)).toDS()
    Increment.curateImageIncrement(b2, root, "b2")
    Increment.curateImageIncrement(b2, root, "b2")
    val v2 = vmap2(Increment.readLedger(spark, root))
    assert(v2(("b2", 10L)) == ((false, "exact_dup", 1L)))
    assert(v2(("b2", 11L)) == ((false, "near_dup", 3L)))
    assert(v2(("b2", 30L)) == ((true, "admitted", 30L)))
    // kill-mid-rebuild: a crashed second re-curation (orphan version
    // dir, no swap) leaves the old root serving; the same-token retry
    // clears the orphan and completes
    val fs = new org.apache.hadoop.fs.Path(wh).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(wh, "img__v2/phash"))
    assert(Restore.resolveVersioned(spark, wh, "img")
      .map(_.toString).contains(root))
    val r2 = Recurate.runImage(spark, wh, "img", "2",
      Seq(img(1L, 50)).toDS())
    assert(Restore.resolveVersioned(spark, wh, "img")
      .map(_.toString).contains(r2.versionDir))
    // committed tokens refuse reuse (the vlog discipline)
    intercept[IllegalArgumentException] {
      Recurate.runImage(spark, wh, "img", "1", Seq(img(1L, 60)).toDS())
    }
  }

  test("runAudio / runVideo: bootstrap-funnel over the raw pool → " +
      "versioned root → increments serve; the scratch dir is removed") {
    import graft.operators.Multimodal
    def v(src: Long, w: Int): Short = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$src:$w".getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(hex, 16) % 997L) + 1L).toShort
    }
    def clip(id: Long, src: Long): Multimodal.MediaRecord =
      Multimodal.MediaRecord(id, Multimodal.encodePcm16Wav(8000, 1,
        Array.tabulate[Short](12 * 50)(i => v(src, i / 50))), "audio/wav")
    val whA = java.nio.file.Files
      .createTempDirectory("graft_recur_aud_wh").toString
    // 12 windows per clip → k must be < 12 for any fingerprint to pack
    val aCfg = Increment.AudioIncrementConfig(k = 8)
    val ra = Recurate.runAudio(spark, whA, "aud", "1",
      Seq(clip(1L, 1L), clip(2L, 1L), clip(3L, 3L)).toDS(), aCfg)
    val rootA = Restore.resolveVersioned(spark, whA, "aud").get.toString
    assert(rootA == ra.versionDir)
    val baseA = vmap2(Increment.readLedger(spark, rootA))
    assert(baseA(("base", 1L)) == ((true, "admitted", 1L)))
    assert(baseA(("base", 2L)) == ((false, "exact_dup", 1L)))
    assert(baseA(("base", 3L)) == ((true, "admitted", 3L)))
    Increment.curateAudioIncrement(
      Seq(clip(10L, 3L), clip(11L, 11L)).toDS(), rootA, "b1", aCfg)
    val va = vmap2(Increment.readLedger(spark, rootA))
    assert(va(("b1", 10L)) == ((false, "exact_dup", 3L)))
    assert(va(("b1", 11L)) == ((true, "admitted", 11L)))
    // the bootstrap scratch is gone; only version dirs + marker + vlog
    val fsA = new org.apache.hadoop.fs.Path(whA).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fsA.exists(
      new org.apache.hadoop.fs.Path(whA, "aud__v1_scratch")))
    // video twin
    def vid(id: Long, seed: Long): Multimodal.MediaRecord =
      Multimodal.MediaRecord(id, Multimodal.encodeSamplesMp4(1000, 3000,
        (0 to 2).map(f => Multimodal.encodeGrayPixelsPng(16, 16,
          Array.tabulate(256) { p =>
            val (x, y) = (p % 16, p / 16)
            ((seed * 31 + f * 53 + y * 16 + x * 17) % 256).toInt
          }))), "video/mp4")
    val whV = java.nio.file.Files
      .createTempDirectory("graft_recur_vid_wh").toString
    val rv = Recurate.runVideo(spark, whV, "vid", "1",
      Seq(vid(1L, 1L), vid(2L, 1L), vid(3L, 3L)).toDS())
    val rootV = Restore.resolveVersioned(spark, whV, "vid").get.toString
    assert(rootV == rv.versionDir)
    val baseV = vmap2(Increment.readLedger(spark, rootV))
    assert(baseV(("base", 1L)) == ((true, "admitted", 1L)))
    assert(baseV(("base", 2L)) == ((false, "exact_dup", 1L)))
    assert(baseV(("base", 3L)) == ((true, "admitted", 3L)))
    Increment.curateVideoIncrement(
      Seq(vid(10L, 1L), vid(11L, 11L)).toDS(), rootV, "b1")
    val vv = vmap2(Increment.readLedger(spark, rootV))
    assert(vv(("b1", 10L)) == ((false, "exact_dup", 1L)))
    assert(vv(("b1", 11L)) == ((true, "admitted", 11L)))
  }

  test("publishState seeds every modality family atomically: " +
      "audio/video/embedding roots publish through the same pointer " +
      "swap and their increments serve from the resolved dir") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_recur_fam_wh").toString
    // embedding family via initSemStateFromCurated
    val vecs = Seq(
      (1L, Array(1.0, 0.0, 0.0)), (2L, Array(0.0, 1.0, 0.0)))
      .toDF("id", "v")
    Recurate.publishState(spark, wh, "emb", "1") { root =>
      Increment.initSemStateFromCurated(spark, root, vecs)
    }
    val embRoot = Restore.resolveVersioned(spark, wh, "emb").get.toString
    val ev = verdictMap(Increment.curateEmbeddingIncrement(
      Seq((10L, Array(1.0, 0.0, 0.0)),                // exact of 1
        (11L, Array(0.0, 0.99, 0.01)),                // sem-near of 2
        (12L, Array(0.0, 0.0, 1.0))).toDF("id", "v"), // fresh
      embRoot, "b1").ledger)
    assert(ev(10L) == ((false, "exact_dup", 1L)))
    // the embedding increment's cosine stage IS its near-dup stage
    assert(ev(11L) == ((false, "near_dup", 2L)))
    assert(ev(12L) == ((true, "admitted", 12L)))
  }
}
