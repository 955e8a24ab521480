package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Payload (byte-stream) operators: the reference treats backup payloads as
  * opaque streams (SURVEY.md §1.1 "byte streams"); here they are rows of
  * `binaryFile` scans.
  *
  *  - OP-3  streaming HTTP source → Hadoop FS connector concern; the
  *    DataFrame face is `spark.read.format("binaryFile")` ([[scan]])
  *  - OP-4  zip introspection (exactly-one-member validation, cloud.py:215-264)
  *  - OP-26 chunked md5 checksum (db.py:843-851) — chunking is an IO detail;
  *    the column form is `md5(content)`
  *  - OP-28 progress decile bucketing (db.py:249-258) — batch analog over
  *    per-file progress fractions
  */
object Payloads {

  /** Recursive binary scan: (path, modificationTime, length, content). */
  def scan(spark: SparkSession, dir: String, glob: String = "*.zip"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)

  /** OP-4: names of zip members (cloud.py:226-228 — callers gate on
    * `size(members) === 1`), DRAINING each entry's bytes: ZipInputStream
    * reads names from streamed local headers and silently returns null at
    * a truncation point, so listing without reading would accept a
    * half-uploaded archive as complete; decompressing to the end makes
    * truncated deflate data throw (and the reference reads members anyway
    * — checksums/restore).
    */
  def zipMembers(bytes: Array[Byte]): Seq[String] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Byte](8192)
    try Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
      .map { e =>
        while (zin.read(buf) >= 0) {} // drain: truncation throws here
        e.getName
      }.toList
    finally zin.close()
  }

  /** True iff an End-of-Central-Directory record signature appears in the
    * archive tail (its legal window: last 65557 bytes). Python's zipfile —
    * what the reference opens payloads with — REQUIRES the EOCD, so a
    * truncated upload that lost the central directory is invalid there
    * even when every local entry streamed fine; ZipInputStream alone
    * never notices (it reads local headers and returns null at the cut).
    */
  def hasEndOfCentralDirectory(bytes: Array[Byte]): Boolean = {
    val from = math.max(0, bytes.length - 65557)
    var i = bytes.length - 22 // minimal EOCD is 22 bytes
    while (i >= from) {
      if (bytes(i) == 0x50 && bytes(i + 1) == 0x4b &&
        bytes(i + 2) == 0x05 && bytes(i + 3) == 0x06) return true
      i -= 1
    }
    false
  }

  /** [[zipMembers]] that treats a corrupt/truncated archive as INVALID
    * (empty member list) instead of failing the task: a half-uploaded
    * backup is exactly the payload the pipeline must fall through on, not
    * abort the whole job for (the reference's single-member gate likewise
    * just skips the bad file). Invalid = missing EOCD (reference zipfile
    * parity) or an exception while draining entries.
    */
  def zipMembersSafe(bytes: Array[Byte]): Seq[String] =
    if (bytes.length < 22 || !hasEndOfCentralDirectory(bytes)) Seq.empty
    else try zipMembers(bytes)
    catch { case _: java.io.IOException => Seq.empty } // ZipException/EOF included

  /** Validate the one-member rule over a binaryFile frame; returns
    * (path, member) for valid payloads only — corrupt archives are
    * filtered out, never thrown. Runs distributed via a typed map — the
    * zip central-directory read is per-row imperative logic.
    */
  def validZips(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select("path", "content").as[(String, Array[Byte])]
      .map { case (p, bytes) => (p, zipMembersSafe(bytes)) }
      .filter(_._2.length == 1)
      .map { case (p, ms) => (p, ms.head) }
      .toDF("path", "member")
  }

  /** OP-26: md5 checksum per payload (column form of _zipChecksum). */
  def checksums(df: DataFrame): DataFrame =
    df.select(col("path"), md5(col("content")).as("checksum"),
      col("length"))

  /** OP-28: decile bucket of a progress fraction column (0..1): the batch
    * analog of the 10%-step progress reporter.
    */
  def decileBucket(fraction: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (floor(fraction * 100 / 10) * 10).cast("int")
}
