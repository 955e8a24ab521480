package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode / feature-extract runs as a typed
  * `mapPartitions` over case-class rows in bounded batches (the Scala analog
  * of arrow-batched pandas UDFs — per-partition iterators, no driver
  * materialization, batch size bounds peak memory).
  *
  * The actual media decode is STUBBED (this container ships no image/audio
  * codecs): [[Multimodal.decodeStub]] derives deterministic fake features
  * from the payload bytes (md5-based), so the Spark-side plumbing — schema,
  * batching, partitioning, typed encoders — is real and oracle-testable
  * while the codec call is an obvious swap-in point.
  */
object Multimodal {

  /** One media payload: id + raw bytes + declared mime. */
  case class MediaRecord(media_id: Long, media: Array[Byte], mime: String)

  /** Stub "decoded" features — all derived from the bytes deterministically. */
  case class MediaFeatures(media_id: Long, n_bytes: Long, digest: String,
                           fake_width: Int, fake_height: Int)

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  /** The swap-in point for a real codec. Fake dims come from the first two
    * digest nibbles (1..16) — matching `strpos('0123456789abcdef', …)` in
    * the oracle.
    */
  def decodeOne(r: MediaRecord): MediaFeatures = {
    val digest = md5Hex(r.media)
    def nib(i: Int): Int = 1 + Character.digit(digest.charAt(i), 16)
    MediaFeatures(r.media_id, r.media.length.toLong, digest, nib(0), nib(1))
  }

  /** Batched per-partition decode. `batchSize` bounds how many payloads are
    * resident per task at once (a real codec would amortize model/codec init
    * across the batch, exactly like an arrow-batch UDF).
    */
  def decodeStub(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // codec init would happen here, once per batch
        batch.iterator.map(decodeOne)
      }
    }
  }

  /** Frame sampling for video-ish payloads: every `stride`-th `frameSize`-
    * byte slice (a real implementation would seek keyframes via the codec —
    * same swap-in point as [[decodeOne]]). Pure per-row function used via
    * the same batched mapPartitions shape.
    */
  def sampleFrames(bytes: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] =
    bytes.grouped(frameSize).zipWithIndex
      .collect { case (frame, i) if i % stride == 0 => frame }
      .toSeq

  /** documents → MediaRecord dataset (UTF-8 text bytes standing in for an
    * opaque payload; the schema/partitioning is what is under test).
    */
  def documentsAsMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.selectExpr("doc_id AS media_id", "CAST(text AS BINARY) AS media",
      "'text/plain' AS mime").as[MediaRecord]
  }
}
