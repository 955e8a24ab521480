package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.sources.Warc

/** Crawl-ingest front end for [[CurateStream.gate]]: an unbounded stream
  * of WARC files → one `(id, text)` row per kept HTTP response record —
  * the streaming analog of the q108→q109 batch path (WARC parse →
  * HTML→text), so the crawl end feeds the streaming curation ledger the
  * way the batch funnel already does.
  *
  * Stateless by construction: the FILE is the event and the parallelism
  * unit (records within a file are sequential by format —
  * sources/Warc.scala's batch discipline verbatim, same per-file
  * flatMap), so this stage adds no streaming state of its own and
  * composes with the gate's stateful stages unchanged.
  *
  * Kept records: `warc_type == "response"`, HTTP 200, non-empty body —
  * warcinfo/request/metadata records and error responses never reach the
  * gate. `htmlToText` (the batch column, one definition) runs HERE so
  * the gate's dedup states see clean text — the batch funnel's ordering.
  *
  * `id` is derived from `(file_id, rec_index)` as `file_id · 2^20 +
  * rec_index` — STABLE across at-least-once redelivery, so a replayed
  * file's documents hit the gate's exact-dedup state as duplicates of
  * themselves (`dup_of == id`) instead of minting new identities; the
  * downstream writer stays idempotent off the ledger alone. The stride
  * bounds files at 2^20 records — far above the ~1 GiB files crawl
  * archives actually ship (reference corpus: tens of thousands of
  * records per file).
  */
object WarcIngestStream {

  /** Records-per-file id stride (2^20). */
  val RecStride: Long = 1L << 20

  def docs(files: Dataset[Warc.WarcFile], html: Boolean = true): DataFrame = {
    val kept = Warc.parseRecords(files).toDF()
      .filter(col("warc_type") === "response" &&
        col("http_status") === 200 && length(col("body")) > 0)
      // ENFORCE the stride bound the id scheme depends on: a pathological
      // file with >= 2^20 records would otherwise mint ids colliding with
      // the next file_id and silently corrupt the replay-dedup property.
      // Such records are excluded (the file's first 2^20 records still
      // flow); excluding beats raise_error here because one corrupt file
      // must not kill an unbounded ingest stream.
      .filter(col("rec_index") < RecStride)
      .select(
        (col("file_id") * lit(RecStride) + col("rec_index")).as("id"),
        col("body"))
    val text =
      if (html) graft.operators.Curation.htmlToText(col("body"))
      else col("body")
    kept.select(col("id"), trim(text).as("text"))
      .filter(length(col("text")) > 0)
  }
}
