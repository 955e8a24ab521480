package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.operators.{Dedup, Multimodal}

/** IMAGE-corpus curation funnel — the multimodal twin of `Curate.run`'s
  * dedup stages, with the same per-document accounting contract: every
  * input image gets exactly one ledger verdict (id, admitted, reason,
  * dup_of), funnel counts per stage, survivors out the bottom.
  *
  * Stages, in funnel order:
  *  1. `decode` — payloads whose DCT pHash is the −1 marker (undecodable
  *     bytes or a pixel-bomb claim over `maxPixels`) drop with reason
  *     "undecodable". Batch curation REJECTS what it cannot read —
  *     unlike the streaming gate (`PhashStream.gate`), which admits
  *     markers because an ingest gate must not silently discard; the
  *     divergence is deliberate and spec-pinned.
  *  2. `exact_dedup` — byte-identical payloads collapse to the min-id
  *     representative (md5 of the raw bytes; reason "exact_dup",
  *     `dup_of` = keeper).
  *  3. `near_dup` — pHash banded pairs at `maxHamming` →
  *     connected components → min-id canonical survives (reason
  *     "near_dup", `dup_of` = component label), exactly the text
  *     funnel's MinHash-component semantics.
  *
  * Scale shape: decode + hash is ONE bounded-batch mapPartitions pass
  * over the payloads (the q146 path); everything after runs on the
  * 16-byte-per-image signature table — the banded equi join, the
  * checkpointed label propagation, and bounded anti joins. Nothing
  * re-reads image bytes past stage 1, which is what makes the funnel
  * viable when the corpus is 100 TB of media but only GBs of
  * signatures.
  */
object CurateImages {

  case class ImageCurateConfig(
      maxPixels: Long = 64L << 20,
      maxHamming: Int = 3,
      nBands: Int = 4,
      emitLedger: Boolean = false)

  /** `kept` — surviving (media_id, phash); `stageCounts` — rows
    * surviving each stage in order; `ledger` — one verdict per INPUT
    * image when `emitLedger` (reasons: undecodable | exact_dup |
    * near_dup | admitted).
    */
  case class ImageCurateResult(kept: DataFrame,
                               stageCounts: Seq[(String, Long)],
                               ledger: Option[DataFrame])

  def run(media: Dataset[Multimodal.MediaRecord],
          cfg: ImageCurateConfig = ImageCurateConfig())
      : ImageCurateResult = {
    val counts = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val led = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def reject(ids: DataFrame, reason: String): Unit =
      if (cfg.emitLedger) led += ids
        .select(col("media_id").cast("long").as("id"),
          lit(false).as("admitted"), lit(reason).as("reason"),
          coalesce(col("__dup_of"), col("media_id")).cast("long")
            .as("dup_of"))
        .localCheckpoint(eager = true)

    // ---- decode + hash: the ONE pass over raw payloads ------------------
    // exact-dup must collapse BYTE-identical payloads, so the content
    // hash rides along from the same pass (hashing signatures alone
    // would alias distinct bytes with equal pHash)
    import media.sparkSession.implicits._
    val hashed = media.mapPartitions { it =>
        val d = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          d.reset()
          (r.media_id, d.digest(r.media).map(b => f"${b & 0xff}%02x")
            .mkString)
        }
      }
      .toDF("media_id", "__md5")
      .join(Multimodal.imagePHash(media, maxPixels = cfg.maxPixels).toDF(),
        Seq("media_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val decoded = hashed.filter(col("phash") =!= -1L)
      .persist(StorageLevel.MEMORY_AND_DISK)
    counts += (("decode", decoded.count()))
    reject(hashed.filter(col("phash") === -1L)
      .select(col("media_id"), lit(null).cast("long").as("__dup_of")),
      "undecodable")

    // ---- exact payload dedup -------------------------------------------
    val keeper = decoded.groupBy("__md5")
      .agg(min(col("media_id")).as("__keep"))
    val withKeep = decoded.join(keeper, Seq("__md5"))
    val exact = withKeep.filter(col("media_id") === col("__keep"))
      .select("media_id", "phash")
      .persist(StorageLevel.MEMORY_AND_DISK)
    counts += (("exact_dedup", exact.count()))
    reject(withKeep.filter(col("media_id") =!= col("__keep"))
      .select(col("media_id"), col("__keep").as("__dup_of")),
      "exact_dup")

    // ---- pHash near-dup components -------------------------------------
    val pairsM = Multimodal.phashBandNearDupPairsOf(
      exact.select(col("media_id"), col("phash").as("ahash")),
      cfg.maxHamming, cfg.nBands)
    val compM = Dedup.connectedComponentsManaged(pairsM.df
      .select(col("idA"), col("idB")))
    val victims = compM.df.filter(col("id") =!= col("label"))
    val kept = exact.join(
        victims.select(col("id").as("media_id")),
        Seq("media_id"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    counts += (("near_dup", kept.count()))
    reject(victims.select(col("id").as("media_id"),
      col("label").as("__dup_of")), "near_dup")
    val ledger =
      if (!cfg.emitLedger) None
      else {
        val admitted = kept.select(col("media_id").cast("long").as("id"),
          lit(true).as("admitted"), lit("admitted").as("reason"),
          col("media_id").cast("long").as("dup_of"))
        Some(led.foldLeft(admitted)(_ unionByName _)
          .localCheckpoint(eager = true))
      }
    compM.close(); pairsM.close()
    hashed.unpersist(); decoded.unpersist(); exact.unpersist()
    ImageCurateResult(kept, counts.toSeq, ledger)
  }
}
