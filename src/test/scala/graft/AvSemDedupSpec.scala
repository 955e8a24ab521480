package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord
import graft.pipeline.Increment
import graft.pipeline.Increment.{AudioIncrementConfig, VideoIncrementConfig}

/** Semantic dedup for AUDIO and VIDEO — the r16 #1 arc, replaying the
  * image pattern per modality with its own measured gap:
  *
  *  - audio: a RESAMPLED re-encode (same waveform, 2× sample rate)
  *    lands every fixed-frame window boundary elsewhere, so the
  *    delta-bit fingerprint shares no sub-fingerprint VALUE — while the
  *    time-fraction-pooled energy profile is bit-identical;
  *  - video: a RE-GRAINED re-encode (fresh pixel noise per frame) flips
  *    > maxHamming pHash bits on every keyframe, so the temporal
  *    Jaccard is 0 — while the pooled block means barely move.
  *
  * Both increments then get the sem sub-state: vs-state, within-batch,
  * retry idempotence, accumulation, and the sem-off control that proves
  * the fingerprint alone re-admits every re-encode.
  */
class AvSemDedupSpec extends SparkSpec {
  import spark.implicits._

  // ---- audio fixtures -----------------------------------------------------
  // per-window amplitude A(i) = bucket level + per-window wobble, both
  // md5-derived per scene:
  //  - the LEVEL (one value per 4-window embedding bucket, ±300 swing)
  //    is the scene identity — i.i.d. levels decorrelate scenes, so
  //    cross-scene centered cosine stays far from the 0.9 gate;
  //  - the WOBBLE (±30 per window) makes the delta-bit stream scene-
  //    rich, so base fingerprints never collide across scenes;
  //  - a RESAMPLE duplicates every frame `dup`× (same waveform and
  //    duration at dup× the rate): time-fraction pooling reproduces the
  //    bucket means EXACTLY (cosine 1), while every fixed-frame window
  //    splits — the delta-bit stream gains dup−1 zeros between original
  //    bits and no packed sub-fingerprint value survives.
  private def h32(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(4)
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16)
  }
  private def amps(pat: Long, nWin: Int,
                   salt: String = "w"): Array[Short] = {
    require(nWin % 4 == 0)
    Array.tabulate(nWin) { i =>
      (2000 + 150 * ((h32(s"$pat:${i / 4}") % 5L).toInt - 2) +
        30 * ((h32(s"$salt:$pat:$i") % 3L).toInt - 1)).toShort
    }
  }

  private val W = 50 // windowFrames
  private def clip(id: Long, pat: Long, nWin: Int = 64): MediaRecord = {
    val a = amps(pat, nWin)
    MediaRecord(id, Multimodal.encodePcm16Wav(8000, 1,
      Array.tabulate(nWin * W)(f => a(f / W))), "audio/wav")
  }
  /** `salt` re-grains the wobble — a re-encode whose artifacts differ
    * from the original's (bucket means barely move: ±30 wobble on ±300
    * levels); `dup` stretches every frame (the resample itself).
    */
  private def resampled(id: Long, pat: Long, dup: Int = 2,
                        salt: String = "w", nWin: Int = 64): MediaRecord = {
    val a = amps(pat, nWin, salt)
    MediaRecord(id, Multimodal.encodePcm16Wav(8000 * dup, 1,
      Array.tabulate(dup * nWin * W)(f => a(f / (dup * W)))), "audio/wav")
  }

  test("audio: resampled re-encodes are inside embedding cosine but share " +
      "no fingerprint value — the regime the embedding adds") {
    val media = (0 until 4).flatMap { pat =>
      Seq(clip(pat * 100L, pat), resampled(pat * 100L + 1, pat, dup = 2),
        resampled(pat * 100L + 2, pat, dup = 2, salt = "w2"))
    } :+ MediaRecord(999L, "not audio".getBytes("UTF-8"), "text/plain")
    val ds = media.toDS()
    val victims = Multimodal.audioSemDedupVictimsManaged(ds, dim = 16,
        windowFrames = W, thresholdE4 = 9000L, centroidEvery = 4)
      .df.as[(Long, Long)].collect().toMap
    for (pat <- 0 until 4; g <- 1 until 3)
      assert(victims.get(pat * 100L + g).contains(pat * 100L),
        s"scene $pat resample $g: ${victims.get(pat * 100L + g)}")
    assert(victims.size == 8, s"$victims")
    // the fingerprint at the exact same clips: zero pairs (recall 0)
    val fp = Multimodal.audioNearDupPairs(ds, W, k = 20)
      .as[(Long, Long, Long)].collect()
    assert(fp.isEmpty, s"fingerprint unexpectedly caught: ${fp.toSeq}")
    // constant envelope → zero centered vector → filtered, never a victim
    val flat = Seq(
      MediaRecord(9000L, Multimodal.encodePcm16Wav(8000, 1,
        Array.fill(64 * W)(1500.toShort)), "audio/wav"),
      MediaRecord(9001L, Multimodal.encodePcm16Wav(8000, 1,
        Array.fill(64 * W)(1500.toShort)), "audio/wav"))
    val v2 = Multimodal.audioSemDedupVictimsManaged(
        ds.union(flat.toDS()), dim = 16, windowFrames = W,
        thresholdE4 = 9000L, centroidEvery = 4)
      .df.as[(Long, Long)].collect().toMap
    assert(!v2.contains(9000L) && !v2.contains(9001L))
  }

  private def verdictMap(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "admitted", "reason", "dup_of")
      .as[(Long, Boolean, String, Long)].collect()
      .map(v => v._1 -> ((v._2, v._3, v._4))).toMap

  test("audio increment SEMANTIC stage: resamples fall to sem_dup vs " +
      "accumulated state and within batch, retry replays identically, " +
      "sem-off control re-admits them") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_aud_incr_sem").toString
    val cfg = AudioIncrementConfig(semDedupThresholdE4 = Some(9000L),
      semDim = 16, semCentroidEvery = 4)
    val r1 = Increment.curateAudioIncrement(
      Seq(clip(100L, 1), clip(200L, 2)).toDS(), dir, "b1", cfg)
    assert(verdictMap(r1.ledger).forall(_._2._2 == "admitted"))
    assert(r1.stageCounts.toMap.get("semantic").contains(2L))
    // b2: a resample of STATE clip 1; a fresh scene 3 within-batch
    // resample pair; a fresh scene 4
    val b2 = Seq(resampled(101L, 1), clip(300L, 3), resampled(301L, 3),
      clip(400L, 4))
    val v2 = verdictMap(
      Increment.curateAudioIncrement(b2.toDS(), dir, "b2", cfg).ledger)
    assert(v2(101L) == ((false, "sem_dup", 100L)), v2.toString)
    assert(v2(300L) == ((true, "admitted", 300L)))
    assert(v2(301L) == ((false, "sem_dup", 300L)))
    assert(v2(400L) == ((true, "admitted", 400L)))
    // retry of b2: identical verdicts (pre-batch sem view + replace)
    val again = verdictMap(
      Increment.curateAudioIncrement(b2.toDS(), dir, "b2", cfg).ledger)
    assert(again == v2)
    // b3 resamples a clip ADMITTED BY b2 (fresh grain): state
    // accumulated
    val v3 = verdictMap(Increment.curateAudioIncrement(
      Seq(resampled(302L, 3, dup = 2, salt = "w2")).toDS(), dir, "b3", cfg).ledger)
    assert(v3(302L) == ((false, "sem_dup", 300L)), v3.toString)
    // the fingerprint alone re-admits every resample — same b2 against
    // a sem-OFF copy of b1's state
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_aud_incr_sem_off").toString
    Increment.curateAudioIncrement(
      Seq(clip(100L, 1), clip(200L, 2)).toDS(), dir2, "b1")
    val off = verdictMap(
      Increment.curateAudioIncrement(b2.toDS(), dir2, "b2").ledger)
    assert(off.values.forall(_._2 == "admitted"), off.toString)
  }

  // ---- video fixtures -----------------------------------------------------
  private def wv(f: Int, x: Int): Int =
    math.round(10.0 * math.cos(math.Pi * 2 * f * x / 16)).toInt
  private def vnoise(id: Long, f: Int, x: Int, y: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:$f:$x:$y".getBytes("UTF-8")).take(4)
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % 41L).toInt - 20
  }
  /** 3-keyframe MP4 (lossless PNG samples): every frame shows the
    * pattern's plane-wave scene under the clip's OWN pixel grain.
    */
  private def vclip(id: Long, pattern: Long): MediaRecord = {
    val fx = (pattern % 3).toInt + 1
    val fy = ((pattern / 3) % 3).toInt + 1
    MediaRecord(id, Multimodal.encodeSamplesMp4(1000, 3000,
      (0 to 2).map(f => Multimodal.encodeGrayPixelsPng(16, 16,
        Array.tabulate(256) { p =>
          val (x, y) = (p % 16, p / 16)
          128 + wv(fx, x) * wv(fy, y) + vnoise(id, f, x, y)
        }))), "video/mp4")
  }

  test("video: re-grained re-encodes are inside embedding cosine but " +
      "beyond per-frame pHash hamming 3 — the regime the embedding adds") {
    val media = (0 until 4).flatMap(pat => (0 until 3).map(g =>
      vclip(pat * 100L + g, pat))) :+
      MediaRecord(999L, "not a video".getBytes("UTF-8"), "text/plain")
    val ds = media.toDS()
    val victims = Multimodal.videoSemDedupVictimsManaged(ds, grid = 8,
        thresholdE4 = 9000L, centroidEvery = 4)
      .df.as[(Long, Long)].collect().toMap
    for (pat <- 0 until 4; g <- 1 until 3)
      assert(victims.get(pat * 100L + g).contains(pat * 100L),
        s"scene $pat grain $g: ${victims.get(pat * 100L + g)}")
    assert(victims.size == 8, s"$victims")
    // frame-hash near-dup at the same clips: zero pairs (recall 0)
    val ph = Multimodal.videoNearDupPairs(ds, maxHamming = 3)
      .select("idA", "idB").as[(Long, Long)].collect()
    assert(ph.isEmpty, s"frame hashes unexpectedly caught: ${ph.toSeq}")
  }

  test("video increment SEMANTIC stage: re-grains fall to sem_dup vs " +
      "accumulated state and within batch, retry replays identically, " +
      "sem-off control re-admits them") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_vid_incr_sem").toString
    val cfg = VideoIncrementConfig(semDedupThresholdE4 = Some(9000L),
      semGrid = 8, semCentroidEvery = 4)
    val r1 = Increment.curateVideoIncrement(
      Seq(vclip(100L, 1), vclip(200L, 2)).toDS(), dir, "b1", cfg)
    assert(verdictMap(r1.ledger).forall(_._2._2 == "admitted"))
    assert(r1.stageCounts.toMap.get("semantic").contains(2L))
    val b2 = Seq(vclip(101L, 1), vclip(300L, 3), vclip(301L, 3),
      vclip(400L, 4))
    val v2 = verdictMap(
      Increment.curateVideoIncrement(b2.toDS(), dir, "b2", cfg).ledger)
    assert(v2(101L) == ((false, "sem_dup", 100L)), v2.toString)
    assert(v2(300L) == ((true, "admitted", 300L)))
    assert(v2(301L) == ((false, "sem_dup", 300L)))
    assert(v2(400L) == ((true, "admitted", 400L)))
    val again = verdictMap(
      Increment.curateVideoIncrement(b2.toDS(), dir, "b2", cfg).ledger)
    assert(again == v2)
    val v3 = verdictMap(Increment.curateVideoIncrement(
      Seq(vclip(302L, 3)).toDS(), dir, "b3", cfg).ledger)
    assert(v3(302L) == ((false, "sem_dup", 300L)), v3.toString)
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_vid_incr_sem_off").toString
    Increment.curateVideoIncrement(
      Seq(vclip(100L, 1), vclip(200L, 2)).toDS(), dir2, "b1")
    val off = verdictMap(
      Increment.curateVideoIncrement(b2.toDS(), dir2, "b2").ledger)
    assert(off.values.forall(_._2 == "admitted"), off.toString)
  }

  test("initAudio/VideoStateFromCurated seed exact + fingerprint + sem " +
      "state under batch 'base': the FIRST increment dedups against " +
      "the seeded history, including semantically") {
    // audio: seed two scenes with sem on; the first increment brings an
    // exact dup, a resample (sem), and a fresh scene
    val aDir = java.nio.file.Files
      .createTempDirectory("graft_aud_seed").toString
    val aCfg = AudioIncrementConfig(semDedupThresholdE4 = Some(9000L),
      semDim = 16, semCentroidEvery = 4)
    Increment.initAudioStateFromCurated(spark,
      aDir, Seq(clip(100L, 1), clip(200L, 2)).toDS(), aCfg)
    val av = verdictMap(Increment.curateAudioIncrement(
      Seq(clip(10L, 1), resampled(11L, 2), clip(12L, 5)).toDS(),
      aDir, "b1", aCfg).ledger)
    assert(av(10L) == ((false, "exact_dup", 100L)), av.toString)
    assert(av(11L) == ((false, "sem_dup", 200L)))
    assert(av(12L) == ((true, "admitted", 12L)))
    // video twin
    val vDir = java.nio.file.Files
      .createTempDirectory("graft_vid_seed").toString
    val vCfg = VideoIncrementConfig(semDedupThresholdE4 = Some(9000L),
      semGrid = 8, semCentroidEvery = 4)
    Increment.initVideoStateFromCurated(spark,
      vDir, Seq(vclip(100L, 1), vclip(200L, 2)).toDS(), vCfg)
    val vv = verdictMap(Increment.curateVideoIncrement(
      Seq(vclip(10L, 1), vclip(11L, 2), vclip(12L, 5)).toDS(),
      vDir, "b1", vCfg).ledger)
    // 10 re-grains scene 1 (fresh noise from its own id ⇒ sem, not
    // exact); 11 re-grains scene 2; 12 is a fresh scene
    assert(vv(10L) == ((false, "sem_dup", 100L)), vv.toString)
    assert(vv(11L) == ((false, "sem_dup", 200L)))
    assert(vv(12L) == ((true, "admitted", 12L)))
    // image sibling keeps its seed contract under the cfg signature
    val iDir = java.nio.file.Files
      .createTempDirectory("graft_img_seed").toString
    val iCfg = Increment.ImageIncrementConfig(
      semDedupThresholdE4 = Some(9000L), semGrid = 8,
      semCentroidEvery = 4)
    Increment.initImageStateFromCurated(spark, iDir,
      Seq(iscene(100L, 1), iscene(200L, 2)).toDS(), iCfg)
    val iv = verdictMap(Increment.curateImageIncrement(
      Seq(iscene(10L, 1), iscene(12L, 5)).toDS(), iDir, "b1",
      iCfg).ledger)
    assert(iv(10L) == ((false, "sem_dup", 100L)), iv.toString)
    assert(iv(12L) == ((true, "admitted", 12L)))
  }

  /** 16×16 PNG scene with per-id grain — the ImageIncrementSpec
    * fixture, for the seeded-image check above.
    */
  private def iscene(id: Long, pattern: Long): MediaRecord = {
    val fx = (pattern % 3).toInt + 1
    val fy = ((pattern / 3) % 3).toInt + 1
    MediaRecord(id, Multimodal.encodeGrayPixelsPng(16, 16,
      Array.tabulate(256) { p =>
        val (x, y) = (p % 16, p / 16)
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$id:$x:$y".getBytes("UTF-8")).take(4)
          .map("%02x".format(_)).mkString
        128 + wv(fx, x) * wv(fy, y) +
          ((java.lang.Long.parseLong(hex, 16) % 41L).toInt - 20)
      }), "image/png")
  }

  test("media sem backfill: retroactive semantic coverage across ALL " +
      "committed batches — pre-enablement admissions gate the next " +
      "increment; idempotent rerun; partial corpus refused loudly") {
    // audio: two sem-OFF increments, then backfill, then sem ON
    val aDir = java.nio.file.Files
      .createTempDirectory("graft_aud_backfill").toString
    Increment.curateAudioIncrement(
      Seq(clip(100L, 1), clip(200L, 2)).toDS(), aDir, "b1")
    Increment.curateAudioIncrement(
      Seq(clip(300L, 3)).toDS(), aDir, "b2")
    val aCfg = AudioIncrementConfig(semDedupThresholdE4 = Some(9000L),
      semDim = 16, semCentroidEvery = 4)
    // partial corpus: loud, never a silent partial backfill
    val partial = intercept[IllegalArgumentException] {
      Increment.audioSemBackfill(spark, aDir,
        Seq(clip(100L, 1)).toDS(), aCfg)
    }
    assert(partial.getMessage.contains("absent"), partial.getMessage)
    val corpus = Seq(clip(100L, 1), clip(200L, 2), clip(300L, 3)).toDS()
    assert(Increment.audioSemBackfill(spark, aDir, corpus, aCfg) == 3L)
    // idempotent: every committed batch already covered
    assert(Increment.audioSemBackfill(spark, aDir, corpus, aCfg) == 0L)
    // the next sem-ON increment dedups against BOTH historical batches
    val av = verdictMap(Increment.curateAudioIncrement(
      Seq(resampled(101L, 1), resampled(301L, 3)).toDS(), aDir, "b3",
      aCfg).ledger)
    assert(av(101L) == ((false, "sem_dup", 100L)), av.toString)
    assert(av(301L) == ((false, "sem_dup", 300L)))
    // video twin
    val vDir = java.nio.file.Files
      .createTempDirectory("graft_vid_backfill").toString
    Increment.curateVideoIncrement(
      Seq(vclip(100L, 1), vclip(200L, 2)).toDS(), vDir, "b1")
    Increment.curateVideoIncrement(
      Seq(vclip(300L, 3)).toDS(), vDir, "b2")
    val vCfg = VideoIncrementConfig(semDedupThresholdE4 = Some(9000L),
      semGrid = 8, semCentroidEvery = 4)
    val vCorpus = Seq(vclip(100L, 1), vclip(200L, 2), vclip(300L, 3))
      .toDS()
    assert(Increment.videoSemBackfill(spark, vDir, vCorpus, vCfg) == 3L)
    val vv = verdictMap(Increment.curateVideoIncrement(
      Seq(vclip(101L, 1), vclip(301L, 3)).toDS(), vDir, "b3",
      vCfg).ledger)
    assert(vv(101L) == ((false, "sem_dup", 100L)), vv.toString)
    assert(vv(301L) == ((false, "sem_dup", 300L)))
    // image twin (the iscene fixture); a family mismatch is loud
    val iDir = java.nio.file.Files
      .createTempDirectory("graft_img_backfill").toString
    Increment.curateImageIncrement(
      Seq(iscene(100L, 1), iscene(200L, 2)).toDS(), iDir, "b1")
    val iCfg = Increment.ImageIncrementConfig(
      semDedupThresholdE4 = Some(9000L), semGrid = 8,
      semCentroidEvery = 4)
    val iCorpus = Seq(iscene(100L, 1), iscene(200L, 2)).toDS()
    assert(Increment.imageSemBackfill(spark, iDir, iCorpus, iCfg) == 2L)
    val iv = verdictMap(Increment.curateImageIncrement(
      Seq(iscene(10L, 1)).toDS(), iDir, "b2", iCfg).ledger)
    assert(iv(10L) == ((false, "sem_dup", 100L)), iv.toString)
    val wrongFam = intercept[IllegalArgumentException] {
      Increment.audioSemBackfill(spark, iDir, corpus, aCfg)
    }
    assert(wrongFam.getMessage.contains("expected 'audio'"))
  }

  test("audio/video sem sub-states survive compaction and keep serving " +
      "sem_dup verdicts from the compacted root") {
    // audio root with sem: b1 bootstraps, compact, b2 resample vs base
    val aDir = java.nio.file.Files
      .createTempDirectory("graft_aud_sem_compact").toString
    val aCfg = AudioIncrementConfig(semDedupThresholdE4 = Some(9000L),
      semDim = 16, semCentroidEvery = 4)
    Increment.curateAudioIncrement(
      Seq(clip(100L, 1), clip(200L, 2)).toDS(), aDir, "b1", aCfg)
    val aDst = java.nio.file.Files
      .createTempDirectory("graft_aud_sem_compact_dst").toString + "/state"
    Increment.compactStateTo(spark, aDir, aDst)
    val av = verdictMap(Increment.curateAudioIncrement(
      Seq(resampled(101L, 1)).toDS(), aDst, "b2", aCfg).ledger)
    assert(av(101L) == ((false, "sem_dup", 100L)), av.toString)
    // video twin
    val vDir = java.nio.file.Files
      .createTempDirectory("graft_vid_sem_compact").toString
    val vCfg = VideoIncrementConfig(semDedupThresholdE4 = Some(9000L),
      semGrid = 8, semCentroidEvery = 4)
    Increment.curateVideoIncrement(
      Seq(vclip(100L, 1), vclip(200L, 2)).toDS(), vDir, "b1", vCfg)
    val vDst = java.nio.file.Files
      .createTempDirectory("graft_vid_sem_compact_dst").toString + "/state"
    Increment.compactStateTo(spark, vDir, vDst)
    val vv = verdictMap(Increment.curateVideoIncrement(
      Seq(vclip(101L, 1)).toDS(), vDst, "b2", vCfg).ledger)
    assert(vv(101L) == ((false, "sem_dup", 100L)), vv.toString)
  }
}
