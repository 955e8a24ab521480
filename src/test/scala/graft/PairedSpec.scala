package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord
import graft.pipeline.{Curate, CurateConfig, CurateImages, Paired}
import graft.pipeline.CurateImages.ImageCurateConfig

/** Paired multimodal verdicts: the REAL text and image funnel ledgers
  * composed on a (doc_id, media_id) pairing — drop the pair if either
  * side rejected, reason names the deciding modality.
  */
class PairedSpec extends SparkSpec {
  import spark.implicits._

  private def goodText(salt: String): String =
    s"the table row scan key " +
      (1 to 24).map(i => s"$salt$i").mkString(" ") + " the a"

  private def mix(id: Long, p: Long): Long = {
    var z = id * 0x9E3779B97F4A7C15L + p * 0xC2B2AE3D27D4EB4FL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    (z ^ (z >>> 27)) & 0xffL
  }
  private def png(seed: Long, nudge: Int): Array[Byte] =
    Multimodal.encodeGrayPixelsPng(16, 16,
      Array.tabulate(256)(p => (mix(seed, p.toLong).toInt +
        (if (p < 40) nudge else 0)).min(255)))

  test("pair and doc verdicts compose the two funnels' ledgers: either " +
      "side's rejection drops the pair, reason carries the modality") {
    // text corpus: 1 admitted, 2 exact-dup of 1, 5 quality reject
    val docs = Seq(1L -> goodText("one"), 2L -> goodText("one"),
      3L -> goodText("two"), 5L -> "short junk!!!").toDF("doc_id", "text")
    val tRes = Curate.run(docs, "doc_id", "text",
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "text",
      CurateConfig(emitLedger = true))
    tRes.chunks.unpersist()
    // images: 11 admitted; 12 exact-dup of 11; 22 pHash near-dup of 21
    val shared = png(1, 0)
    val iRes = CurateImages.run(Seq(
      MediaRecord(11L, shared, "image/png"),
      MediaRecord(12L, shared, "image/png"),
      MediaRecord(21L, png(2, 0), "image/png"),
      MediaRecord(22L, png(2, 7), "image/png")).toDS(),
      ImageCurateConfig(emitLedger = true))
    iRes.kept.unpersist()
    val pairs = Seq(
      (1L, 11L),  // both admitted
      (3L, 12L),  // text fine, image exact-dup → image decides
      (2L, 21L),  // text exact-dup, image fine → text decides
      (2L, 12L),  // both rejected → TEXT decides (deployment order)
      (5L, 22L),  // text quality, image near-dup → text decides
      (1L, 77L),  // image never ingested → image:missing
      (9L, 11L)   // doc never curated → text:missing
    ).toDF("doc_id", "media_id")
    val got = Paired.pairedVerdicts(tRes.ledger.get, iRes.ledger.get, pairs)
      .select("doc_id", "media_id", "admitted", "reason", "dup_of")
      .as[(Long, Long, Boolean, String, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got((1L, 11L)) == ((true, "admitted", 1L)))
    assert(got((3L, 12L)) == ((false, "image:exact_dup", 11L)))
    assert(got((2L, 21L)) == ((false, "text:exact_dup", 1L)))
    assert(got((2L, 12L)) == ((false, "text:exact_dup", 1L)))
    assert(got((5L, 22L)) == ((false, "text:quality", 5L)))
    assert(got((1L, 77L)) == ((false, "image:missing", 1L)))
    assert(got((9L, 11L)) == ((false, "text:missing", 9L)))
    assert(got.size == pairs.count())
    // doc-level: 1 has one clean pair + one missing-image pair → the
    // rejecting pair decides; 3's only pair is image-rejected; a doc
    // with NO pairs (here: none in `pairs`... doc 5) aggregates to its
    // text verdict alone when its pairs all reject by text
    val doc = Paired.pairedDocVerdicts(tRes.ledger.get, iRes.ledger.get,
        pairs.filter(col("doc_id") =!= 9L))
      .select("doc_id", "admitted", "reason", "dup_of")
      .as[(Long, Boolean, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(doc(1L) == ((false, "image:missing", 1L)))
    assert(doc(3L) == ((false, "image:exact_dup", 11L)))
    assert(doc(2L) == ((false, "text:exact_dup", 1L)))
    assert(doc(5L) == ((false, "text:quality", 5L)))
    // a doc with no image refs at all = its text verdict
    val solo = Paired.pairedDocVerdicts(tRes.ledger.get, iRes.ledger.get,
        Seq.empty[(Long, Long)].toDF("doc_id", "media_id"))
      .select("doc_id", "admitted", "reason")
      .as[(Long, Boolean, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(solo(1L) == ((true, "admitted")) && solo(3L) == ((true, "admitted")))
    assert(solo(2L) == ((false, "text:exact_dup")))
    assert(solo(5L) == ((false, "text:quality")))
  }

  test("paired verdicts compose INCREMENT ledgers unchanged: a paired " +
      "snapshot curated per modality against accumulated state yields " +
      "one verdict per pair from the committed ledgers") {
    import graft.pipeline.Increment
    // batch 1 seeds both states; batch 2 is the paired snapshot
    val tDir = java.nio.file.Files
      .createTempDirectory("graft_paired_t").toString
    val iDir = java.nio.file.Files
      .createTempDirectory("graft_paired_i").toString
    val tCfg = graft.pipeline.IncrementConfig(minQualityE4 = 0)
    Increment.curateIncrement(
      Seq(1L -> goodText("one")).toDF("doc_id", "text"),
      "doc_id", "text", tDir, "b1", tCfg)
    Increment.curateImageIncrement(
      Seq(MediaRecord(11L, png(1, 0), "image/png")).toDS(), iDir, "b1")
    // snapshot: doc 2 exact-dups state doc 1, doc 3 fresh;
    // image 12 pHash-near-dups state image 11, image 13 fresh
    Increment.curateIncrement(
      Seq(2L -> goodText("one"), 3L -> goodText("three"))
        .toDF("doc_id", "text"),
      "doc_id", "text", tDir, "b2", tCfg)
    Increment.curateImageIncrement(Seq(
      MediaRecord(12L, png(1, 7), "image/png"),
      MediaRecord(13L, png(3, 0), "image/png")).toDS(), iDir, "b2")
    val pairs = Seq((3L, 13L), (2L, 13L), (3L, 12L))
      .toDF("doc_id", "media_id")
    val got = Paired.pairedVerdicts(
        Increment.readLedger(spark, tDir), Increment.readLedger(spark, iDir),
        pairs)
      .select("doc_id", "media_id", "admitted", "reason", "dup_of")
      .as[(Long, Long, Boolean, String, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got((3L, 13L)) == ((true, "admitted", 3L)))
    assert(got((2L, 13L)) == ((false, "text:exact_dup", 1L)))
    assert(got((3L, 12L)) == ((false, "image:near_dup", 11L)))
  }

  test("N-modality verdicts: three REAL funnel ledgers (text, image, " +
      "audio) compose with pinned modality precedence; unknown " +
      "modalities and missing ids are loud; 2-form parity holds") {
    import graft.pipeline.Increment
    // text: 1 admitted, 2 exact-dup of 1, 5 quality reject
    val tRes = Curate.run(
      Seq(1L -> goodText("one"), 2L -> goodText("one"),
        5L -> "short junk!!!").toDF("doc_id", "text"),
      "doc_id", "text",
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "text",
      CurateConfig(emitLedger = true))
    tRes.chunks.unpersist()
    val tLed = tRes.ledger.get
    // image: 11 admitted, 12 exact-dup of 11
    val shared = png(4, 0)
    val iRes = CurateImages.run(Seq(
      MediaRecord(11L, shared, "image/png"),
      MediaRecord(12L, shared, "image/png")).toDS(),
      ImageCurateConfig(emitLedger = true))
    iRes.kept.unpersist()
    val iLed = iRes.ledger.get
    // audio (increment funnel): 31 admitted, 32 byte-identical exact dup
    def wav(pat: Long): Array[Byte] = {
      def v(w: Int): Short = {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$pat:$w".getBytes("UTF-8")).take(4)
          .map("%02x".format(_)).mkString
        ((java.lang.Long.parseLong(hex, 16) % 997L) + 1L).toShort
      }
      Multimodal.encodePcm16Wav(8000, 1,
        Array.tabulate[Short](24 * 50)(i => v(i / 50)))
    }
    val aDir = java.nio.file.Files
      .createTempDirectory("graft_paired_a").toString
    val aLed = Increment.curateAudioIncrement(Seq(
        MediaRecord(31L, wav(31L), "audio/wav"),
        MediaRecord(32L, wav(31L), "audio/wav")).toDS(), aDir, "b1",
        Increment.AudioIncrementConfig(windowFrames = 50, k = 8,
          stride = 1))
      .ledger
    val mods = Seq("image" -> iLed, "audio" -> aLed)
    val pairs = Seq(
      (1L, "image", 11L),  // both admitted
      (1L, "audio", 31L),  // both admitted
      (1L, "image", 12L),  // image decides
      (1L, "audio", 32L),  // audio decides
      (2L, "audio", 32L),  // both reject → TEXT decides
      (1L, "audio", 99L),  // audio:missing
      (1L, "video", 31L),  // no video ledger → unknown_modality
      (9L, "image", 11L)   // text:missing
    ).toDF("doc_id", "modality", "media_id")
    val got = Paired.pairedVerdictsN(tLed, mods, pairs)
      .select("doc_id", "modality", "media_id", "admitted", "reason",
        "dup_of")
      .as[(Long, String, Long, Boolean, String, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5, r._6))).toMap
    assert(got((1L, "image", 11L)) == ((true, "admitted", 1L)))
    assert(got((1L, "audio", 31L)) == ((true, "admitted", 1L)))
    assert(got((1L, "image", 12L)) == ((false, "image:exact_dup", 11L)))
    assert(got((1L, "audio", 32L)) == ((false, "audio:exact_dup", 31L)))
    assert(got((2L, "audio", 32L)) == ((false, "text:exact_dup", 1L)))
    assert(got((1L, "audio", 99L)) == ((false, "audio:missing", 1L)))
    assert(got((1L, "video", 31L)) ==
      ((false, "video:unknown_modality", 1L)))
    assert(got((9L, "image", 11L)) == ((false, "text:missing", 9L)))
    assert(got.size == pairs.count())
    // doc-level precedence: doc 1 has rejecting pairs in BOTH media
    // modalities — the DECLARED order decides (image first here)
    val doc = Paired.pairedDocVerdictsN(tLed, mods,
        pairs.filter(col("doc_id") =!= 9L))
      .select("doc_id", "admitted", "reason", "dup_of")
      .as[(Long, Boolean, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(doc(1L) == ((false, "image:exact_dup", 11L)), s"$doc")
    assert(doc(2L) == ((false, "text:exact_dup", 1L)))
    // declared audio-first, the same doc reports the audio rejection
    val doc2 = Paired.pairedDocVerdictsN(tLed, mods.reverse,
        pairs.filter(col("doc_id") === 1L))
      .select("doc_id", "reason").as[(Long, String)].collect().toMap
    assert(doc2(1L) == "audio:exact_dup", s"$doc2")
    // 2-form parity on an image-only pairing
    val imgPairs = pairs.filter(col("modality") === "image")
    val nForm = Paired.pairedVerdictsN(tLed, Seq("image" -> iLed),
        imgPairs)
      .select("doc_id", "media_id", "admitted", "reason", "dup_of")
      .as[(Long, Long, Boolean, String, Long)].collect().toSet
    val twoForm = Paired.pairedVerdicts(tLed, iLed,
        imgPairs.select("doc_id", "media_id"))
      .select("doc_id", "media_id", "admitted", "reason", "dup_of")
      .as[(Long, Long, Boolean, String, Long)].collect().toSet
    assert(nForm == twoForm, "N-form must agree with the 2-form")
  }

  // md5-wobble audio amps (the AvSemDedupSpec fixture, minimal form):
  // distinct seeds give distinct fingerprints, identical seeds exact-dup
  private def aclip(id: Long, seed: Long): MediaRecord = {
    def h32(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString, 16)
    MediaRecord(id, Multimodal.encodePcm16Wav(8000, 1,
      Array.tabulate(64 * 50) { f =>
        val i = f / 50
        (2000 + 150 * ((h32(s"$seed:${i / 4}") % 5L).toInt - 2) +
          30 * ((h32(s"w:$seed:$i") % 3L).toInt - 1)).toShort
      }), "audio/wav")
  }
  private def vclip(id: Long, seed: Long): MediaRecord =
    MediaRecord(id, Multimodal.encodeSamplesMp4(1000, 3000,
      (0 to 2).map(f => Multimodal.encodeGrayPixelsPng(16, 16,
        Array.tabulate(256) { p =>
          val (x, y) = (p % 16, p / 16)
          ((seed * 31 + f * 53 + y * 16 + x * 17) % 256).toInt
        }))), "video/mp4")

  test("END-TO-END: pairedDocVerdictsN over the five REAL increment " +
      "families' ledgers across two increments — a media item rejected " +
      "against ACCUMULATED state flips its doc's paired verdict " +
      "(r16 verdict #7)") {
    import graft.pipeline.Increment
    val tDir = java.nio.file.Files
      .createTempDirectory("graft_paired_t").toString
    val iDir = java.nio.file.Files
      .createTempDirectory("graft_paired_i").toString
    val aDir = java.nio.file.Files
      .createTempDirectory("graft_paired_a").toString
    val vDir = java.nio.file.Files
      .createTempDirectory("graft_paired_v").toString
    val eDir = java.nio.file.Files
      .createTempDirectory("graft_paired_e").toString
    // increment 1: one admitted item per family
    Increment.curateIncrement(Seq(1L -> goodText("one"))
      .toDF("doc_id", "text"), "doc_id", "text", tDir, "b1")
    Increment.curateImageIncrement(Seq(MediaRecord(10L, png(1, 0),
      "image/png")).toDS(), iDir, "b1")
    Increment.curateAudioIncrement(Seq(aclip(20L, 1)).toDS(), aDir, "b1")
    Increment.curateVideoIncrement(Seq(vclip(30L, 1)).toDS(), vDir, "b1")
    Increment.curateEmbeddingIncrement(
      Seq((40L, Array(1.0, 0.0, 0.0))).toDF("id", "v"), eDir, "b1")
    def ledgers() = Seq(
      "image" -> Increment.readLedger(spark, iDir),
      "audio" -> Increment.readLedger(spark, aDir),
      "video" -> Increment.readLedger(spark, vDir),
      "embedding" -> Increment.readLedger(spark, eDir))
    def docVerdicts(pairs: org.apache.spark.sql.DataFrame) =
      Paired.pairedDocVerdictsN(Increment.readLedger(spark, tDir),
          ledgers(), pairs)
        .select("doc_id", "admitted", "reason", "dup_of")
        .as[(Long, Boolean, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1 paired with every b1 item: every side admitted
    val pairs1 = Seq((1L, "image", 10L), (1L, "audio", 20L),
      (1L, "video", 30L), (1L, "embedding", 40L))
      .toDF("doc_id", "modality", "media_id")
    assert(docVerdicts(pairs1)(1L) == ((true, "admitted", 1L)))
    // doc 2's pairing references content the SECOND increment will
    // carry: before it runs, every pair is loudly missing (doc-level
    // verdicts only cover docs the text ledger knows — doc 2 has no
    // row yet; the PAIR form surfaces the absence per pair)
    val pairs2 = Seq((2L, "image", 11L), (2L, "audio", 21L),
      (2L, "video", 31L), (2L, "embedding", 41L))
      .toDF("doc_id", "modality", "media_id")
    val before = Paired.pairedVerdictsN(
        Increment.readLedger(spark, tDir), ledgers(), pairs2)
      .select("media_id", "admitted", "reason")
      .as[(Long, Boolean, String)].collect()
    assert(before.length == 4 &&
      before.forall(r => !r._2 && r._3 == "text:missing"),
      before.toSeq.toString)
    // increment 2: per family, one EXACT DUP of increment-1 content
    // (rejected against the accumulated state) and one fresh item
    Increment.curateIncrement(Seq(2L -> goodText("two"))
      .toDF("doc_id", "text"), "doc_id", "text", tDir, "b2")
    Increment.curateImageIncrement(Seq(
      MediaRecord(11L, png(1, 0), "image/png"),
      MediaRecord(12L, png(2, 0), "image/png")).toDS(), iDir, "b2")
    Increment.curateAudioIncrement(Seq(aclip(21L, 1), aclip(22L, 2))
      .toDS(), aDir, "b2")
    Increment.curateVideoIncrement(Seq(vclip(31L, 1), vclip(32L, 2))
      .toDS(), vDir, "b2")
    Increment.curateEmbeddingIncrement(Seq(
      (41L, Array(1.0, 0.0, 0.0)), (42L, Array(0.0, 1.0, 0.0)))
      .toDF("id", "v"), eDir, "b2")
    // the same pairing now rejects through the DECLARED precedence:
    // image first — 11 fell to the state's 10
    val after = docVerdicts(pairs2)
    assert(after(2L) == ((false, "image:exact_dup", 10L)),
      after.toString)
    // per-pair verdicts name each modality's state-dup individually
    val pv = Paired.pairedVerdictsN(Increment.readLedger(spark, tDir),
        ledgers(), pairs2)
      .select("modality", "media_id", "admitted", "reason", "dup_of")
      .as[(String, Long, Boolean, String, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    assert(pv(11L) == ((false, "image:exact_dup", 10L)))
    assert(pv(21L) == ((false, "audio:exact_dup", 20L)))
    assert(pv(31L) == ((false, "video:exact_dup", 30L)))
    assert(pv(41L) == ((false, "embedding:exact_dup", 40L)))
    // a pairing over the fresh items admits end-to-end
    val pairs3 = Seq((2L, "image", 12L), (2L, "audio", 22L),
      (2L, "video", 32L), (2L, "embedding", 42L))
      .toDF("doc_id", "modality", "media_id")
    assert(docVerdicts(pairs3)(2L) == ((true, "admitted", 2L)))
  }

  test("pairedVerdictsResolved (r17 verdict #4): per-modality-latest " +
      "across independent recurations, version vector reported, and a " +
      "swap landing mid-composition cannot mix roots") {
    import graft.pipeline.{Increment, Recurate, Restore}
    val wh = java.nio.file.Files
      .createTempDirectory("graft_paired_roots_wh").toString
    // a committed root whose ledger is EXACTLY `led` (seed doc 999999
    // carries the state marker; the synthetic ledger replaces the seed's)
    def publishLedgerRoot(db: String, token: String,
                          led: org.apache.spark.sql.DataFrame): Unit = {
      Recurate.publishState(spark, wh, db, token) { root =>
        Increment.initStateFromCurated(spark, root,
          Seq(999999L -> goodText("seed")).toDF("doc_id", "text"),
          "doc_id", "text")
        led.withColumn("batch_id", lit("base"))
          .write.mode("overwrite").partitionBy("batch_id")
          .parquet(s"$root/ledger")
      }
      (): Unit
    }
    def ledOf(rows: Seq[(Long, Boolean, String, Long)]) =
      rows.toDF("id", "admitted", "reason", "dup_of")
    publishLedgerRoot("txt", "1", ledOf(Seq(
      (1L, true, "admitted", 1L), (2L, true, "admitted", 2L),
      (3L, false, "exact_dup", 1L))))
    publishLedgerRoot("img", "1", ledOf(Seq(
      (101L, true, "admitted", 101L), (102L, false, "near_dup", 101L))))
    val pairs = Seq((1L, "image", 101L), (3L, "image", 101L),
      (2L, "image", 102L), (1L, "image", 999L))
      .toDF("doc_id", "modality", "media_id")
    def vm(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "media_id", "admitted", "reason", "dup_of")
        .as[(Long, Long, Boolean, String, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val r1 = Paired.pairedVerdictsResolved(spark, wh, "txt",
      Seq("image" -> "img"), pairs)
    // the version vector names the resolved immutable roots
    assert(r1.roots("text").endsWith("txt__v1") &&
      r1.roots("image").endsWith("img__v1"), r1.roots.toString)
    val v1 = vm(r1.verdicts)
    assert(v1((1L, 101L)) == ((true, "admitted", 1L)))
    assert(v1((3L, 101L)) == ((false, "text:exact_dup", 1L)))
    assert(v1((2L, 102L)) == ((false, "image:near_dup", 101L)))
    assert(v1((1L, 999L)) == ((false, "image:missing", 1L)))
    // MID-COMPOSITION SWAP: resolve a snapshot, THEN the text root
    // recurates (doc 3 re-admitted, doc 1 now quality-rejected), THEN
    // materialize — the output must reflect the RESOLVED vector, not
    // the new pointer (reads bind to the immutable v1 dir)
    val snap = Paired.pairedVerdictsResolved(spark, wh, "txt",
      Seq("image" -> "img"), pairs)
    publishLedgerRoot("txt", "2", ledOf(Seq(
      (1L, false, "quality", 1L), (2L, true, "admitted", 2L),
      (3L, true, "admitted", 3L))))
    assert(vm(snap.verdicts) == v1,
      "a swap between resolution and materialization mixed roots")
    assert(snap.roots("text").endsWith("txt__v1"))
    // a NEW composition resolves the new vector: per-modality-latest —
    // text verdicts flip, image verdicts (older rebuild) stand
    val r3 = Paired.pairedVerdictsResolved(spark, wh, "txt",
      Seq("image" -> "img"), pairs)
    assert(r3.roots("text").endsWith("txt__v2") &&
      r3.roots("image").endsWith("img__v1"))
    val v3 = vm(r3.verdicts)
    assert(v3((3L, 101L)) == ((true, "admitted", 3L)))
    assert(v3((1L, 101L)) == ((false, "text:quality", 1L)))
    assert(v3((2L, 102L)) == ((false, "image:near_dup", 101L)))
    // a modality with no committed version is refused loudly
    val e = intercept[IllegalStateException] {
      Paired.pairedVerdictsResolved(spark, wh, "txt",
        Seq("image" -> "img", "audio" -> "aud"), pairs)
    }
    assert(e.getMessage.contains("no committed version"))
  }
}
