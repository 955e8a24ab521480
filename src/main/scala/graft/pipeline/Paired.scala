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

  /** N-MODALITY pair verdicts — [[pairedVerdicts]] generalized to any
    * set of media funnels (VERDICT r15 #5): `mediaLedgers` is the
    * (modality name → ledger) sequence IN PRECEDENCE ORDER, `pairs` is
    * (doc_id, modality, media_id). Semantics are the two-modality
    * contract unchanged: a pair admits iff the doc's text verdict AND
    * its media item's own-modality verdict both admitted; TEXT decides
    * when both reject; an id absent from its ledger is `<mod>:missing`
    * (loud, never silently dropped), and a pair naming a modality with
    * NO registered ledger is `<mod>:unknown_modality` — a pipeline
    * wiring error surfaced as data, not a dropped row.
    *
    * Output: (doc_id, modality, media_id, admitted, reason, dup_of).
    */
  def pairedVerdictsN(textLedger: DataFrame,
                      mediaLedgers: Seq[(String, DataFrame)],
                      pairs: DataFrame): DataFrame = {
    val names = mediaLedgers.map(_._1)
    require(names.nonEmpty && names.distinct.size == names.size &&
        !names.contains("text"),
      s"pairedVerdictsN: modality names must be distinct, non-empty and " +
        s"not 'text' (got ${names.mkString(", ")})")
    val p = pairs.select(col("doc_id").cast("long").as("doc_id"),
      col("modality").cast("string").as("modality"),
      col("media_id").cast("long").as("media_id"))
    val t = side(textLedger, "doc_id", "t")
    val perModality = mediaLedgers.map { case (m, led) =>
      p.filter(col("modality") === m)
        .join(t, Seq("doc_id"), "left_outer")
        .join(side(led, "media_id", "i"), Seq("media_id"), "left_outer")
        .select(col("doc_id"), col("modality"), col("media_id"),
          (coalesce(col("__ta"), lit(false)) &&
            coalesce(col("__ia"), lit(false))).as("admitted"),
          when(col("__ta").isNull, lit("text:missing"))
            .when(!col("__ta"), concat(lit("text:"), col("__tr")))
            .when(col("__ia").isNull, lit(s"$m:missing"))
            .when(!col("__ia"), concat(lit(s"$m:"), col("__ir")))
            .otherwise(lit("admitted")).as("reason"),
          when(col("__ta").isNull, col("doc_id"))
            .when(!col("__ta"), col("__td"))
            .when(col("__ia").isNull, col("doc_id"))
            .when(!col("__ia"), col("__id"))
            .otherwise(col("doc_id")).cast("long").as("dup_of"))
    }
    val unknown = p
      .filter(!col("modality").isInCollection(names))
      .select(col("doc_id"), col("modality"), col("media_id"),
        lit(false).as("admitted"),
        concat(col("modality"), lit(":unknown_modality")).as("reason"),
        col("doc_id").as("dup_of"))
    (perModality :+ unknown).reduce(_ unionByName _)
  }

  /** N-modality DOC verdicts: admitted iff text admitted AND every
    * attached media item of every modality admitted. The deciding pair
    * among rejections follows the DECLARED modality precedence (the
    * `mediaLedgers` order), then smallest media_id — pinned, so a doc
    * rejected by both an image and an audio clip reports the image when
    * image is declared first. Unknown-modality pairs reject their doc
    * (wiring errors must not admit content unexamined).
    */
  def pairedDocVerdictsN(textLedger: DataFrame,
                         mediaLedgers: Seq[(String, DataFrame)],
                         pairs: DataFrame): DataFrame = {
    val names = mediaLedgers.map(_._1)
    val pv = pairedVerdictsN(textLedger, mediaLedgers, pairs)
    val prec = names.zipWithIndex
      .foldLeft(when(lit(false), lit(0)))((w, ni) =>
        w.when(col("modality") === ni._1, lit(ni._2)))
      .otherwise(lit(names.size))
    val deciding = pv.filter(!col("admitted"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(prec.asc, col("media_id").asc)))
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

  /** [[pairedVerdictsN]]'s verdicts plus the VERSION VECTOR they were
    * composed from: the resolved state-root path per modality (key
    * `text` plus each media modality name).
    */
  case class ResolvedPairVerdicts(verdicts: DataFrame,
                                  roots: Map[String, String])

  /** Root-RESOLVED pair verdicts (r17 verdict #4) — the composition
    * contract when modality roots are re-curated INDEPENDENTLY
    * ([[Recurate.run]] swaps the text root; [[Recurate.runImage]]/
    * `runAudio`/`runVideo` swap media roots on their own cadence):
    *
    *  - semantics are PER-MODALITY-LATEST, by design: each modality's
    *    CURRENT committed root is resolved ONCE, up front, and the
    *    composition pairs the newest committed verdict of each
    *    modality. There is no cross-modality transaction — a doc
    *    re-admitted by a text re-curation pairs against media verdicts
    *    from an older media rebuild, and that is the documented
    *    contract (the alternative, refusing to compose across vintages,
    *    would block every paired read between any two modality
    *    recurations).
    *  - what IS guaranteed: the resolution is a SNAPSHOT. Every ledger
    *    read binds to the version dirs resolved here (immutable, and
    *    retained through the [[Restore.gcUnreferenced]] grace period),
    *    so a pointer swap landing MID-composition — or between this
    *    call and the output's materialization — cannot mix roots: the
    *    output reflects exactly the returned version vector, and a
    *    rerun against the same vector is deterministic. Callers log
    *    `roots` with the output; that is the provenance line a 100 TB
    *    corpus audit joins on.
    *
    * `mediaDbs` is (modality name → warehouse db) in precedence order;
    * a modality whose db has no committed version is refused loudly
    * (composing around an absent ledger would silently verdict every
    * one of its pairs `<mod>:missing`).
    */
  def pairedVerdictsResolved(spark: org.apache.spark.sql.SparkSession,
                             warehouse: String, textDb: String,
                             mediaDbs: Seq[(String, String)],
                             pairs: DataFrame): ResolvedPairVerdicts = {
    def resolve(db: String): String =
      Restore.resolveVersioned(spark, warehouse, db).getOrElse(
        throw new IllegalStateException(
          s"pairedVerdictsResolved: no committed version of $db under " +
            s"$warehouse")).toString
    val textRoot = resolve(textDb)
    val media = mediaDbs.map { case (m, db) => (m, resolve(db)) }
    ResolvedPairVerdicts(
      pairedVerdictsN(Increment.readLedger(spark, textRoot),
        media.map { case (m, root) =>
          m -> Increment.readLedger(spark, root) }, pairs),
      (("text" -> textRoot) +: media).toMap)
  }

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
