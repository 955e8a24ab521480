package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-consistent verdicts for PAIRED multimodal documents (a doc with
  * text plus image refs) — VERDICT r14 #6: the text funnel
  * ([[Curate.run]] with `emitLedger`) and the image funnel
  * ([[CurateImages.run]]) each account for their own modality; an
  * interleaved corpus needs ONE verdict per pair with
  * drop-the-pair-if-either-side-rejected semantics. This is a
  * composition of the two ledgers keyed by the pairing, not a new
  * operator: two equi joins, no new state.
  *
  * Reason vocabulary: `admitted`, or the deciding modality prefixed
  * onto its funnel reason (`text:exact_dup`, `image:near_dup`, …).
  * TEXT decides when both sides reject (deployment order: the text
  * gates run first). A pair referencing an id ABSENT from its ledger
  * is rejected loudly as `text:missing` / `image:missing` — corpus
  * accounting must cover every pair, and a silent inner join would
  * just drop it.
  */
object Paired {

  private def side(ledger: DataFrame, key: String, tag: String) =
    ledger.select(col("id").as(key), col("admitted").as(s"__${tag}a"),
      col("reason").as(s"__${tag}r"), col("dup_of").as(s"__${tag}d"))

  /** One verdict row per (doc_id, media_id) pair: `admitted` iff both
    * sides admitted; `reason` names the deciding modality; `dup_of` is
    * the deciding side's duplicate lineage (the pair's own doc_id when
    * admitted or missing).
    */
  def pairedVerdicts(textLedger: DataFrame, imageLedger: DataFrame,
                     pairs: DataFrame): DataFrame =
    pairs.select(col("doc_id").cast("long").as("doc_id"),
        col("media_id").cast("long").as("media_id"))
      .join(side(textLedger, "doc_id", "t"), Seq("doc_id"), "left_outer")
      .join(side(imageLedger, "media_id", "i"), Seq("media_id"),
        "left_outer")
      .select(col("doc_id"), col("media_id"),
        (coalesce(col("__ta"), lit(false)) &&
          coalesce(col("__ia"), lit(false))).as("admitted"),
        when(col("__ta").isNull, lit("text:missing"))
          .when(!col("__ta"), concat(lit("text:"), col("__tr")))
          .when(col("__ia").isNull, lit("image:missing"))
          .when(!col("__ia"), concat(lit("image:"), col("__ir")))
          .otherwise(lit("admitted")).as("reason"),
        when(col("__ta").isNull, col("doc_id"))
          .when(!col("__ta"), col("__td"))
          .when(col("__ia").isNull, col("doc_id"))
          .when(!col("__ia"), col("__id"))
          .otherwise(col("doc_id")).cast("long").as("dup_of"))

  /** One verdict row per DOC: admitted iff its text admitted AND every
    * referenced image admitted (a doc with no image refs is its text
    * verdict alone). `reason`/`dup_of` come from the text verdict when
    * text rejected, else from the smallest-media_id rejecting pair,
    * else `admitted`.
    */
  def pairedDocVerdicts(textLedger: DataFrame, imageLedger: DataFrame,
                        pairs: DataFrame): DataFrame = {
    val pv = pairedVerdicts(textLedger, imageLedger, pairs)
    // the deciding pair per doc: smallest media_id among rejecting pairs
    val deciding = pv.filter(!col("admitted"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("media_id").asc)))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("reason").as("__pr"),
        col("dup_of").as("__pd"))
    side(textLedger, "doc_id", "t")
      .join(deciding, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        (col("__ta") && col("__pr").isNull).as("admitted"),
        when(!col("__ta"), concat(lit("text:"), col("__tr")))
          .when(col("__pr").isNotNull, col("__pr"))
          .otherwise(lit("admitted")).as("reason"),
        when(!col("__ta"), col("__td"))
          .when(col("__pr").isNotNull, col("__pd"))
          .otherwise(col("doc_id")).cast("long").as("dup_of"))
  }
}
