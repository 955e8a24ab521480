package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Periodic FULL re-curation — the operational loop the increment
  * config points at for its pool-relative gates (r16 verdict #2,
  * [[IncrementConfig]]'s note: self-LM bounds, CCNet perplexity
  * buckets, and DSIR selection need the WHOLE population, so the
  * increments skip them and "the periodic full re-curation" owns
  * them). This module is that re-curation: run the complete batch
  * funnel ([[Curate.run]]) — including the pool-relative stages — over
  * the accumulated raw corpus, rebuild EVERY state table the
  * increments serve from (exact keys, minhash index, window claims,
  * sem sub-state, ledger, metrics) into a fresh VERSIONED state root,
  * and swap it in atomically through the [[Restore]] commit-marker
  * path. A crash anywhere before the marker swap leaves the OLD root
  * serving — increments never see a half-built state.
  *
  * Deployment shape at 100 TB: increments run per-snapshot against the
  * current root (batch-proportional); this runs weekly/monthly
  * (corpus-proportional, the price of population-relative gates), and
  * the pointer swap retires the accumulated batch partitions in one
  * move (subsuming [[Increment.compactStateTo]] for roots on the
  * versioned convention). Reference: ufload re-stages the whole
  * database per sync cycle and swaps it in (db.py:342-348's de-live +
  * rename discipline) — this is that lifecycle for curation state.
  *
  * State addressing: callers that recurate resolve the CURRENT root
  * via [[Restore.resolveVersioned]](warehouse, db) and hand that path
  * to the increment entry points; [[run]] publishes `db__v{token}`
  * and swaps the `db.commit` pointer last.
  */
object Recurate {

  /** `versionDir` — the committed new state root (the path increments
    * should use next); `stageCounts` — the funnel's per-stage counts;
    * `ledger` — the full-pool verdict ledger now persisted under batch
    * `base` in the new root.
    */
  case class RecurateResult(versionDir: String,
                            stageCounts: Seq[(String, Long)],
                            ledger: DataFrame)

  /** Durable committed-token log for `db`: one empty marker file per
    * token under `warehouse/db.vlog/`, appended at swap time. "Not the
    * current pointer target" does NOT imply "never committed" — a
    * SUPERSEDED version is also off-pointer yet is immutable history
    * (and may still be serving a reader that resolved it just before
    * the last swap, the [[Restore.gcUnreferenced]] grace rationale) —
    * so orphan clearing consults this log, not the pointer (ADVICE
    * r17). The log is tiny append-only metadata (one zero-byte file
    * per publish); entries outlive their GC'd dirs deliberately, making
    * the token namespace immutable: a logged token can never be reused,
    * even after its dir is collected.
    */
  private def vlogPath(warehouse: String, db: String, token: String) =
    new org.apache.hadoop.fs.Path(warehouse, s"$db.vlog/$token")

  /** True iff `token` was ever logged as committed for `db`. */
  def committedTokenLogged(spark: SparkSession, warehouse: String,
                           db: String, token: String): Boolean = {
    val p = vlogPath(warehouse, db, token)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def logCommittedToken(spark: SparkSession, warehouse: String,
                                db: String, token: String): Unit = {
    val p = vlogPath(warehouse, db, token)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      fs.mkdirs(p.getParent)
      fs.create(p, true).close()
    }
  }

  /** Publish ANY freshly-built state root atomically: `build`
    * populates the immutable `db__v{token}` dir (e.g. one of the
    * [[Increment]] `init*StateFromCurated` seeds), then the commit
    * pointer swaps — the [[Restore.publishVersionedDir]] discipline
    * with two additions:
    *
    *  - a version dir LEFT BEHIND by a CRASHED build under the SAME
    *    token is cleared first, making the rerun-with-same-token retry
    *    shape work (the CurateImages ck.save rule). "Crashed orphan" is
    *    established by the COMMITTED-TOKEN LOG, not by the pointer: a
    *    superseded committed version is also off-pointer, and deleting
    *    it would destroy immutable history a pre-swap reader may still
    *    be scanning — a logged token is REFUSED loudly instead (reuse
    *    a fresh token; the crashed-retry case is by definition
    *    unlogged).
    *  - at swap time the token is appended to the durable log; the
    *    PREDECESSOR's token is logged first (defensively — it covers
    *    versions published through raw [[Restore.publishVersionedDir]]
    *    by callers that bypassed this wrapper, and the crash window
    *    where a successor swapped before its own log write landed).
    */
  def publishState(spark: SparkSession, warehouse: String, db: String,
                   token: String)(build: String => Unit)
      : org.apache.hadoop.fs.Path = {
    val fs = new org.apache.hadoop.fs.Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vd = new org.apache.hadoop.fs.Path(warehouse, s"${db}__v$token")
    require(!committedTokenLogged(spark, warehouse, db, token),
      s"publishState: token '$token' for $db is in the committed-version " +
        s"log (${vlogPath(warehouse, db, token)}) — committed version dirs " +
        "are immutable history (a superseded one may still be serving a " +
        "reader that resolved it before the last swap); use a fresh token")
    val cur = Restore.resolveVersioned(spark, warehouse, db)
    if (fs.exists(vd) && !cur.contains(vd))
      fs.delete(vd, true)
    cur.map(_.getName.stripPrefix(s"${db}__v"))
      .foreach(t => logCommittedToken(spark, warehouse, db, t))
    val out = Restore.publishVersionedDir(spark, warehouse, db, token)(p =>
      build(p.toString))
    logCommittedToken(spark, warehouse, db, token)
    out
  }

  /** The TEXT-corpus re-curation: full funnel over `corpus` (the
    * accumulated RAW pool — re-curating admitted survivors only would
    * let once-rejected content stay rejected under gates that have
    * since moved), then a complete state rebuild:
    *
    *  - exact keys + minhash index + window claims via
    *    [[Increment.initStateFromCurated]] over the admitted docs'
    *    FINAL text ([[CurateResult.admittedDocs]] — hashes must match
    *    what the funnel's rewrites produced);
    *  - `ledger/` + `metrics/` under batch `base` — the audit trail
    *    restarts from the re-curation (the pre-swap root keeps the
    *    old history; it is retired, not erased);
    *  - the sem sub-state via [[Increment.semBackfill]] when the
    *    funnel ran its semantic stage (same dials, so the next
    *    increment's pinned-dial check passes).
    *
    * Token discipline: one unique `token` per publish attempt; a retry
    * of a CRASHED attempt may reuse its token ([[publishState]] clears
    * the orphan). The funnel itself may additionally use its own
    * stage-checkpoint store (`cfg.stageCheckpointDir`) to resume the
    * expensive stages across the retry.
    */
  def run(spark: SparkSession, warehouse: String, db: String,
          token: String, corpus: DataFrame, idCol: String,
          textCol: String, benchmark: DataFrame, benchTextCol: String,
          cfg: CurateConfig = CurateConfig(),
          bands: Int = 4, rowsPerBand: Int = 3,
          dsirTarget: Option[DataFrame] = None,
          classifierModel: Option[graft.operators.Classifier.Model] = None,
          arpaModel: Option[graft.operators.TextStats.ArpaModel] = None)
      : RecurateResult = {
    import spark.implicits._
    val res = Curate.run(corpus, idCol, textCol, benchmark, benchTextCol,
      cfg.copy(emitLedger = true, keepAdmitted = true),
      dsirTarget, classifierModel, arpaModel)
    val admitted = res.admittedDocs.get
    val ledger = res.ledger.get
    val vdir = publishState(spark, warehouse, db, token) { root =>
      Increment.initStateFromCurated(spark, root, admitted, idCol,
        textCol, bands, rowsPerBand, claimsW = cfg.dedupWindowsW)
      // the benchmark the funnel decontaminated against persists as
      // the root's decontam state family (r17 verdict #1), so the
      // increments' default gate keeps rejecting what the funnel
      // rejected — a benchmark-less resubmission can no longer slip in
      Increment.writeDecontamState(spark, root, benchmark, benchTextCol,
        cfg.decontamGramN)
      ledger.withColumn("batch_id", lit("base"))
        .write.mode("overwrite").partitionBy("batch_id")
        .parquet(s"$root/ledger")
      res.stageCounts.toDF("stage", "rows")
        .withColumn("batch_id", lit("base"))
        .write.mode("overwrite").partitionBy("batch_id")
        .parquet(s"$root/metrics")
      for (_ <- cfg.semDedupThresholdE4)
        Increment.semBackfill(spark, root, admitted, idCol, textCol,
          cfg.semDedupDim, cfg.semDedupCentroidEvery, cfg.semDedupNassign)
    }
    RecurateResult(vdir.toString, res.stageCounts, ledger)
  }

  // ---- media-modality re-curation (r17 verdict #2) -----------------------
  // [[run]]'s image/audio/video siblings: one composed entry per
  // modality runs funnel → full state rebuild → atomic pointer swap,
  // so an operator no longer hand-wires funnel, seed, and publish per
  // modality. The IMAGE funnel is [[CurateImages.run]] (it exists
  // standalone, with the decode-stage checkpoint resume that matters at
  // 100 TB); AUDIO and VIDEO have no standalone funnel by design —
  // their funnel IS the modality increment bootstrapping an EMPTY state
  // (the q161/q173 pinned shape: against empty state the within-batch
  // stages are exactly the funnel semantics, one gate codepath, no
  // drift), run here into a GC-collectible scratch dir whose only
  // output is the verdict ledger; the published root is rebuilt from
  // the admitted survivors through the `init*StateFromCurated` seed,
  // the text [[run]]'s funnel→seed shape exactly.

  /** `versionDir` — the committed new state root; `stageCounts` — the
    * modality funnel's per-stage counts; `ledger` — the full-pool
    * verdict ledger, persisted under batch `base` in the new root.
    */
  case class MediaRecurateResult(versionDir: String,
                                 stageCounts: Seq[(String, Long)],
                                 ledger: DataFrame)

  private def publishMediaRoot(spark: SparkSession, warehouse: String,
                               db: String, token: String,
                               ledger: DataFrame,
                               stageCounts: Seq[(String, Long)])
                              (seed: String => Unit)
      : MediaRecurateResult = {
    import spark.implicits._
    val vdir = publishState(spark, warehouse, db, token) { root =>
      seed(root)
      ledger.select(col("id"), col("admitted"), col("reason"),
          col("dup_of"))
        .withColumn("batch_id", lit("base"))
        .write.mode("overwrite").partitionBy("batch_id")
        .parquet(s"$root/ledger")
      stageCounts.toDF("stage", "rows")
        .withColumn("batch_id", lit("base"))
        .write.mode("overwrite").partitionBy("batch_id")
        .parquet(s"$root/metrics")
    }
    MediaRecurateResult(vdir.toString, stageCounts, ledger)
  }

  private def admittedOf(media: org.apache.spark.sql.Dataset[
      graft.operators.Multimodal.MediaRecord], ledger: DataFrame)
      : org.apache.spark.sql.Dataset[
        graft.operators.Multimodal.MediaRecord] = {
    val sess = media.sparkSession
    import sess.implicits._
    media.toDF().join(
        ledger.filter(col("admitted"))
          .select(col("id").as("media_id")),
        Seq("media_id"), "left_semi")
      .as[graft.operators.Multimodal.MediaRecord]
  }

  /** IMAGE re-curation: [[CurateImages.run]] over the accumulated raw
    * media pool (decode-stage checkpoint resume via
    * `stageCheckpointDir`/`resume`, the funnel's own discipline), then
    * the pHash/exact/sem state rebuilds from the admitted survivors
    * under batch `base` and swaps in atomically. Funnel dials derive
    * from the INCREMENT config so the rebuilt state pins exactly what
    * the next [[Increment.curateImageIncrement]] expects.
    */
  def runImage(spark: SparkSession, warehouse: String, db: String,
               token: String,
               media: org.apache.spark.sql.Dataset[
                 graft.operators.Multimodal.MediaRecord],
               cfg: Increment.ImageIncrementConfig =
                 Increment.ImageIncrementConfig(),
               stageCheckpointDir: Option[String] = None,
               resume: Boolean = false): MediaRecurateResult = {
    val res = CurateImages.run(media, CurateImages.ImageCurateConfig(
      maxPixels = cfg.maxPixels, maxHamming = cfg.maxHamming,
      nBands = cfg.nBands,
      semDedupThresholdE4 = cfg.semDedupThresholdE4,
      semGrid = cfg.semGrid, semCentroidEvery = cfg.semCentroidEvery,
      semNassign = cfg.semNassign, emitLedger = true,
      stageCheckpointDir = stageCheckpointDir, resume = resume,
      runToken = token))
    val ledger = res.ledger.get.localCheckpoint(eager = true)
    publishMediaRoot(spark, warehouse, db, token, ledger,
      res.stageCounts) { root =>
      Increment.initImageStateFromCurated(spark, root,
        admittedOf(media, ledger), cfg)
    }
  }

  /** The audio/video funnel-via-bootstrap shape shared by [[runAudio]]
    * and [[runVideo]]: the modality increment runs once against an
    * EMPTY scratch state (named `db__v{token}_scratch` — version-shaped
    * so a crashed attempt's residue is [[Restore.gcUnreferenced]]
    * collectible, never the pointer target), its ledger is the funnel
    * verdict set, and the published root seeds from the survivors.
    */
  private def runViaBootstrap(spark: SparkSession, warehouse: String,
                              db: String, token: String,
                              media: org.apache.spark.sql.Dataset[
                                graft.operators.Multimodal.MediaRecord],
                              bootstrap: (org.apache.spark.sql.Dataset[
                                  graft.operators.Multimodal.MediaRecord],
                                String) => IncrementResult)
                             (seed: (String, org.apache.spark.sql.Dataset[
                                graft.operators.Multimodal.MediaRecord])
                                => Unit): MediaRecurateResult = {
    val scratch = new org.apache.hadoop.fs.Path(warehouse,
      s"${db}__v${token}_scratch")
    val fsW = scratch.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (fsW.exists(scratch)) fsW.delete(scratch, true) // crashed attempt
    val r = bootstrap(media, scratch.toString)
    val ledger = r.ledger.localCheckpoint(eager = true)
    val out = publishMediaRoot(spark, warehouse, db, token, ledger,
      r.stageCounts)(root => seed(root, admittedOf(media, ledger)))
    fsW.delete(scratch, true): Unit
    out
  }

  /** AUDIO re-curation: fingerprint funnel (bootstrap increment) over
    * the raw pool → exact/fp/sem state rebuild → atomic swap.
    */
  def runAudio(spark: SparkSession, warehouse: String, db: String,
               token: String,
               media: org.apache.spark.sql.Dataset[
                 graft.operators.Multimodal.MediaRecord],
               cfg: Increment.AudioIncrementConfig =
                 Increment.AudioIncrementConfig()): MediaRecurateResult =
    runViaBootstrap(spark, warehouse, db, token, media,
      (m, s) => Increment.curateAudioIncrement(m, s, "r0", cfg))(
      (root, adm) =>
        Increment.initAudioStateFromCurated(spark, root, adm, cfg))

  /** VIDEO re-curation: keyframe funnel (bootstrap increment) over the
    * raw pool → exact/frame/sem state rebuild → atomic swap.
    */
  def runVideo(spark: SparkSession, warehouse: String, db: String,
               token: String,
               media: org.apache.spark.sql.Dataset[
                 graft.operators.Multimodal.MediaRecord],
               cfg: Increment.VideoIncrementConfig =
                 Increment.VideoIncrementConfig()): MediaRecurateResult =
    runViaBootstrap(spark, warehouse, db, token, media,
      (m, s) => Increment.curateVideoIncrement(m, s, "r0", cfg))(
      (root, adm) =>
        Increment.initVideoStateFromCurated(spark, root, adm, cfg))
}
