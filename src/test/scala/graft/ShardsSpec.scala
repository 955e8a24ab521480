package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Shards

/** Training-shard writer: balance, read-back fidelity, retry
  * idempotence, torn-batch invisibility, shard-count pinning.
  */
class ShardsSpec extends SparkSpec {
  import spark.implicits._

  private def packed(ids: Range, tag: Int) =
    ids.map(i => (i.toLong, Seq(tag, i, i + 1), 3L, 1L))
      .toDF("seq_id", "ids", "n_tokens", "n_docs")

  test("shards balance round-robin, read back verbatim, retries replace " +
      "and torn batches stay invisible") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shards").toString
    Shards.writePackedShards(packed(0 until 64, 0), dir, numShards = 8)
    val base = Shards.readPackedShards(spark, dir)
    // balance: 64 sequences round-robin into 8 shards of exactly 8
    assert(base.groupBy("shard").count()
      .select("count").as[Long].collect().toSeq == Seq.fill(8)(8L))
    // fidelity: every row back verbatim
    assert(base.select("seq_id", "ids", "n_tokens", "n_docs")
      .as[(Long, Seq[Int], Long, Long)].collect().toSet ==
      packed(0 until 64, 0).as[(Long, Seq[Int], Long, Long)]
        .collect().toSet)
    // append a batch, then RETRY it — partitions replaced, not doubled
    Shards.writePackedShards(packed(64 until 80, 1), dir, 8, "b1")
    val once = Shards.readPackedShards(spark, dir)
      .orderBy("seq_id").collect().toSeq
    Shards.writePackedShards(packed(64 until 80, 1), dir, 8, "b1")
    assert(Shards.readPackedShards(spark, dir)
      .orderBy("seq_id").collect().toSeq == once)
    assert(once.length == 80)
    // torn batch: seqs written, meta marker missing → invisible
    val fsys = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(s"$dir/seqs").filter(col("batch_id") === "b1")
      .drop("batch_id").withColumn("batch_id", lit("torn"))
      .write.mode("overwrite").partitionBy("batch_id", "shard")
      .option("partitionOverwriteMode", "dynamic").parquet(s"$dir/seqs")
    assert(Shards.readPackedShards(spark, dir).count() == 80)
    fsys.delete(new org.apache.hadoop.fs.Path(s"$dir/seqs/batch_id=torn"),
      true)
    // a batch pinning a DIFFERENT shard count fails loudly on read
    Shards.writePackedShards(packed(80 until 84, 2), dir, 4, "b2")
    val err = intercept[IllegalArgumentException] {
      Shards.readPackedShards(spark, dir)
    }
    assert(err.getMessage.contains("num_shards"))
  }
}
