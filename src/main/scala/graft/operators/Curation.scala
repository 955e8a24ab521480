package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for the training-data pipeline: deterministic
  * sampling, sequence-packing preparation, and shard assignment. All are
  * content-hash driven — reproducible across runs, engines, and
  * partitionings (the property that rules out `rand()`-based sampling for
  * dataset curation).
  */
object Curation {

  /** Deterministic keep-predicate at `hexDigits.size`/16 rate from the md5
    * first nibble of `keyCol` — e.g. `Seq("0","1","2")` keeps 3/16.
    */
  def hashSampleKeep(keyCol: Column, hexDigits: Seq[String]): Column =
    substring(md5(keyCol), 1, 1).isin(hexDigits: _*)

  /** Per-stratum sampling report: total vs sampled count and ratio. The
    * write path filters on [[hashSampleKeep]]; this audits the rates.
    */
  def stratifiedSampleReport(df: DataFrame, stratum: String, keyCol: Column,
                             hexDigits: Seq[String]): DataFrame =
    df.groupBy(stratum)
      .agg(count(lit(1)).as("n_total"),
        count(when(hashSampleKeep(keyCol, hexDigits), 1)).as("n_sampled"))
      .withColumn("ratio",
        round(col("n_sampled") * lit(1.0) / col("n_total"), 4)
          .cast("decimal(10,4)"))

  /** Token-length bin (floor to `binWidth`, capped at `cap`) — the
    * histogram behind sequence-packing batch planning.
    */
  def tokenBin(tokens: Column, binWidth: Int = 16, cap: Int = 64): Column =
    least(floor(tokens / binWidth) * binWidth, lit(cap)).cast("long")

  /** Deterministic `numShards`-way shard from the content hash. The writer
    * pairs this with `.repartition(col("shard")).write.partitionBy("shard")`
    * so each training shard lands as one directory, co-written by the tasks
    * that own its hash range.
    */
  def shardAssign(keyCol: Column, numShards: Int = 16): Column = {
    require(numShards == 16,
      "first-nibble sharding is 16-way; compose nibbles for more shards")
    conv(substring(md5(keyCol), 1, 1), 16, 10).cast("int")
  }

  /** Write training shards: one directory per shard under `path`
    * (`shard=N/…`), each shard's rows co-located by a repartition on the
    * shard column so a shard is written by the tasks that own its hash
    * range — no small-files explosion, direct per-shard consumption by
    * the training loader.
    */
  def writeShards(df: DataFrame, keyCol: Column, path: String): Unit =
    df.withColumn("shard", shardAssign(keyCol))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
