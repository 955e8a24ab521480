package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic sketch operators for corpus-scale summary statistics:
  * count-min (heavy-hitter frequency estimation) and HyperLogLog
  * (distinct counting). Both are DETERMINISTIC given the input — hashes
  * are md5-prefix arithmetic (`conv(hex,16,10)` == DuckDB
  * `('0x'||hex)::BIGINT`, the repo-wide convention from Dedup) — so the
  * DuckDB oracle can recompute the exact same sketch, estimates
  * included. The HLL estimate keeps the register sum as an INTEGER
  * (Σ 2^(55−M_b), each term a power of two ≤ 2^55, 64 terms < 2^62) so
  * no float summation order can perturb it; only the final
  * alpha·m²/S division is floating point, on an identical expression
  * tree both sides.
  *
  * Scale shape: the count-min build runs on the ALREADY-AGGREGATED
  * (key, count) vocabulary frame — summing per-key counts into buckets
  * is identical to sketching the raw occurrence stream, without
  * multiplying the corpus by the sketch depth. The counter table is
  * depth×width rows (256 at the defaults) — broadcast-joined to any
  * candidate set. HLL is one hash aggregation to ≤ m register rows; the
  * estimate is a second ≤ m-row aggregation. Nothing here ever holds
  * state proportional to the corpus.
  */
object Sketches {

  /** h_j(key) ∈ [0, width): md5 of "key:j", first 8 hex chars as a long. */
  private def bucketCol(key: Column, j: Column, width: Int): Column =
    conv(substring(md5(concat(key, lit(":"), j.cast("string"))), 1, 8),
      16, 10).cast("long") % width

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  /** Scala twin of [[bucketCol]] — the streaming form maps rows to
    * buckets in task code; the parity spec pins scala ≡ column.
    */
  def bucketOf(key: String, j: Int, width: Int): Long =
    java.lang.Long.parseLong(md5Hex(s"$key:$j").substring(0, 8), 16) % width

  /** Scala twin of the [[hllRegisters]] hash: (bucket, rho). */
  def hllBucketRho(key: String): (Long, Long) = {
    val v = java.lang.Long.parseLong(md5Hex(key).substring(0, 15), 16)
    val w = v >>> 6
    val rho = if (w == 0L) 55L
      else 55L - (64L - java.lang.Long.numberOfLeadingZeros(w))
    (v % 64, rho)
  }

  /** Build count-min counters from a pre-aggregated (key, count) frame.
    * Output: (j, bucket, c) — depth×width rows.
    */
  def cmsCounters(counts: DataFrame, keyCol: String, cntCol: String,
                  depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be positive")
    counts
      .select(col(keyCol).cast("string").as("__k"), col(cntCol).as("__c"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .groupBy(col("j"), bucketCol(col("__k"), col("j"), width).as("bucket"))
      .agg(sum(col("__c")).as("c"))
  }

  /** Point-estimate each candidate key against the counters:
    * est = min_j counters[j][h_j(key)] (0 for a never-seen bucket).
    * Counters are broadcast (≤ depth×width rows by construction).
    * Output: (keyCol, est).
    */
  def cmsEstimates(candidates: DataFrame, keyCol: String,
                   counters: DataFrame, depth: Int = 4,
                   width: Int = 64): DataFrame =
    candidates
      .select(col(keyCol),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("bucket",
        bucketCol(col(keyCol).cast("string"), col("j"), width))
      .join(broadcast(counters), Seq("j", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))

  /** HyperLogLog registers over a key column, m = 64 (p = 6). The hash
    * is 60 bits (15 md5 hex chars — stays positive in a long): low 6
    * bits pick the register, the remaining 54 bits w give
    * rho = (leading zeros of w in 54 bits) + 1 = 55 − bitlength(w),
    * computed exactly via `length(bin(w))` (no float log). Duplicate
    * keys are free — max() absorbs them; no distinct pass needed.
    * Output: (bucket, mrho) for PRESENT buckets only (absent ⇒ M_b = 0).
    */
  def hllRegisters(keys: DataFrame, keyCol: String): DataFrame = {
    val v = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    keys
      .select(v.as("__v"))                        // hash ONCE per row
      .select((col("__v") % 64).as("bucket"),
        expr("shiftright(__v, 6)").as("__w"))
      .select(col("bucket"),
        when(col("__w") === 0, lit(55L))
          .otherwise(lit(55L) - length(expr("bin(__w)")).cast("long"))
          .as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("mrho"))
  }

  /** One-row HLL estimate from the registers frame: s55 = Σ_b 2^(55−M_b)
    * over ALL 64 registers (absent ⇒ 2^55), zeros = count of zero
    * registers, est_e6 = the standard m=64 estimator (alpha = 0.709)
    * with the small-range linear-counting correction, e6-rounded.
    */
  def hllEstimate(registers: DataFrame): DataFrame =
    registers
      .agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - mrho AS INT))"))
          .as("spart"),
        count(lit(1)).as("present"))
      .select(
        (col("spart") + (lit(64L) - col("present")) * lit(1L << 55))
          .as("s55"),
        (lit(64L) - col("present")).as("zeros"))
      .withColumn("eraw",
        lit(0.709) * lit(4096.0) * lit(3.6028797018963968e16) / col("s55"))
      .withColumn("est_e6", floor(
        when(col("eraw") <= lit(160.0) && col("zeros") > 0,
          lit(64.0) * log(lit(64.0) / col("zeros")))
          .otherwise(col("eraw")) * lit(1e6) + lit(0.5)).cast("long"))
      .select("s55", "zeros", "est_e6")
}
