package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard writer — the terminal stage of the tokenize path
  * ([[graft.operators.Bpe.encodeCorpusGpt2]] →
  * [[graft.operators.Curation.packTokenIds]] → THIS): packed sequences
  * land as shard-partitioned parquet a training job reads shard by
  * shard. Round-robin on `seq_id` (`pmod(seq_id, numShards)`) balances
  * shards to within one sequence by construction — no skew, no
  * sampling — and `repartition` on the shard column makes each shard
  * directory co-written by the tasks that own it (the
  * [[graft.operators.Curation.shardAssign]] writer discipline).
  *
  * Index-family commit contract: `dir/seqs` partitioned by
  * (batch_id, shard), `dir/meta` (num_shards, re-stated per batch and
  * checked on read) partitioned by batch_id, meta written LAST as the
  * COMMIT MARKER. Retries of a failed write reuse their batch id under
  * dynamic overwrite (replaced, never doubled); readers see only
  * committed batches — a torn shard write is invisible to the training
  * job.
  */
object Shards {

  /** Write one batch of packed sequences (seq_id, ids, n_tokens,
    * n_docs). `overwrite = true` (the "base" snapshot) statically
    * replaces the whole table; appends are per-batch dynamic.
    */
  def writePackedShards(packed: DataFrame, dir: String,
                        numShards: Int = 16,
                        batchId: String = "base"): Unit = {
    require(numShards >= 1, s"writePackedShards: numShards ($numShards)")
    require(batchId.nonEmpty && batchId != "__HIVE_DEFAULT_PARTITION__",
      s"writePackedShards: invalid batch id '$batchId'")
    val spark = packed.sparkSession
    val overwrite = batchId == "base"
    def writer(d: DataFrame, parts: Seq[String]) =
      d.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").partitionBy(parts: _*)
        .option("partitionOverwriteMode",
          if (overwrite) "static" else "dynamic")
    writer(packed
        .withColumn("shard", pmod(col("seq_id"), lit(numShards.toLong))
          .cast("int"))
        .repartition(col("shard")),
      Seq("batch_id", "shard")).parquet(s"$dir/seqs")
    writer(spark.range(1).select(lit(numShards).as("num_shards")),
      Seq("batch_id")).parquet(s"$dir/meta")
  }

  /** The committed sequences (batch_id, shard, seq_id, ids, n_tokens,
    * n_docs) — torn writes invisible; inconsistent shard counts across
    * committed batches fail loudly.
    */
  def readPackedShards(spark: SparkSession, dir: String): DataFrame = {
    val meta = spark.read.parquet(s"$dir/meta")
    val ns = meta.select("num_shards").distinct().collect()
    require(ns.length == 1,
      s"packed shards at $dir: inconsistent num_shards across batches " +
        s"(${ns.length} distinct)")
    val committed = meta.select("batch_id").distinct()
    spark.read.parquet(s"$dir/seqs")
      .join(broadcast(committed), Seq("batch_id"), "left_semi")
  }
}
