package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row
import graft.core.Ops
import graft.sources.Inventory

/** Structured Streaming face of the incremental patterns (SURVEY.md §2.9):
  *
  *  - OP-48 in-flight guard → event-time watermark on `modified` (15 min,
  *    the 900 s constant from cloud.py:132)
  *  - OP-51 at-least-once append + dedup → `dropDuplicates` within the
  *    watermark on the natural key
  *  - OP-50 checksum idempotence → `foreachBatch` anti-join against the
  *    sink before append (exactly-once effect on re-delivery)
  *
  * The batch pipeline and this stream share the same transforms — an
  * inventory row is an inventory row; only the source/sink wiring differs.
  */
object InventoryStream {

  /** Parse + watermark + in-watermark dedup over a streaming listing frame
    * with columns (file, url, modified_raw). `asOfLiteral` mirrors the batch
    * OP-2 guard; the watermark handles true lateness.
    */
  def parse(listing: DataFrame): DataFrame =
    listing
      .withColumn("modified", to_timestamp(col("modified_raw"), Inventory.TsFormat))
      .filter(col("file").endsWith(".zip") && col("file").contains("-"))
      .withWatermark("modified", "15 minutes")
      // WithinWatermark: plain dropDuplicates on non-event-time keys would
      // never evict its state (unbounded growth over the query lifetime)
      .dropDuplicatesWithinWatermark("file", "url")
      .withColumn("instance", Inventory.instanceKey(col("file")))
      .drop("modified_raw")

  /** Exactly-once-effect append into a parquet ledger keyed by `keys`:
    * each micro-batch is anti-joined against current sink contents before
    * append (the streaming form of Ops.antiJoinAppend; re-delivered rows
    * vanish in the anti-join).
    */
  def dedupAppendSink(parsed: DataFrame, sinkPath: String,
                      keys: Seq[String]): DataStreamWriter[Row] =
    parsed.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // only a genuinely-absent sink means "empty"; a transient READ
        // error must propagate (treating it as empty would re-append
        // duplicates and break the exactly-once effect)
        val sinkHadoopPath = new org.apache.hadoop.fs.Path(sinkPath)
        val fs = sinkHadoopPath
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val existing =
          if (!fs.exists(sinkHadoopPath))
            spark.createDataFrame(spark.sparkContext.emptyRDD[Row], batch.schema)
          else spark.read.parquet(sinkPath)
        val fresh = batch.dropDuplicates(keys)
          .join(existing.select(keys.map(col): _*).dropDuplicates(keys),
            keys, "left_anti")
        fresh.write.mode("append").parquet(sinkPath)
        ()
      }

  /** [[dedupAppendSink]] with a compacted keys-only sidecar ledger
    * (`<sinkPath>__keys`): the per-batch anti-join reads the small ledger,
    * NOT the whole sink — the full-sink re-read grows without bound as the
    * sink grows, which is the scale problem this variant removes.
    *
    * Protocol per batch: anti-join against the ledger (bootstrapped from
    * sink keys if the ledger is absent), append fresh rows to the sink,
    * append fresh keys to the ledger, and every `compactEvery` batches
    * rebuild the ledger from the sink's actual keys. Consistency: data is
    * written before its keys, so a crash between the two writes can only
    * cause a re-appended duplicate in that window (at-least-once), never a
    * lost row; the periodic rebuild re-derives the ledger from the sink, so
    * any divergence heals instead of accumulating.
    */
  def dedupAppendSinkCompact(parsed: DataFrame, sinkPath: String,
                             keys: Seq[String],
                             compactEvery: Long = 10): DataStreamWriter[Row] =
    parsed.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val ledgerPath = sinkPath + "__keys"
        val hc = spark.sparkContext.hadoopConfiguration
        val sinkP = new org.apache.hadoop.fs.Path(sinkPath)
        val ledgerP = new org.apache.hadoop.fs.Path(ledgerPath)
        val fs = sinkP.getFileSystem(hc)
        val keyCols = keys.map(col)
        // A ledger DIRECTORY can exist but be unreadable (crash mid-write
        // left only _temporary, or a partial commit) — treating "dir
        // exists" as "ledger valid" would either fail every restart or
        // silently lose keys. Readability is probed (schema inference),
        // and an unreadable ledger falls back to the sink bootstrap.
        val ledger: Option[DataFrame] =
          if (!fs.exists(ledgerP)) None
          else scala.util.Try {
            val df = spark.read.parquet(ledgerPath); df.schema; df
          }.toOption
        val known = ledger.getOrElse {
          if (fs.exists(sinkP)) // bootstrap/repair: derive from sink once
            spark.read.parquet(sinkPath).select(keyCols: _*)
          else batch.select(keyCols: _*).limit(0)
        }
        val fresh = batch.dropDuplicates(keys)
          .join(known.dropDuplicates(keys), keys, "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          fresh.write.mode("append").parquet(sinkPath) // data first …
          fresh.select(keyCols: _*).write.mode("append").parquet(ledgerPath) // … then keys
          if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1 &&
              fs.exists(sinkP)) {
            // rebuild from truth via write-tmp + swap — overwriting the
            // live ledger in place would leave a partial directory on a
            // crash. Crash windows: mid-tmp-write → live ledger intact;
            // after delete, before rename → no ledger dir → next batch
            // bootstraps from the sink. Either way the dedup contract holds.
            val tmpPath = ledgerPath + "__compact"
            val tmpP = new org.apache.hadoop.fs.Path(tmpPath)
            spark.read.parquet(sinkPath).select(keyCols: _*)
              .dropDuplicates(keys)
              .write.mode("overwrite").parquet(tmpPath)
            if (fs.exists(ledgerP)) fs.delete(ledgerP, true)
            if (!fs.rename(tmpP, ledgerP))
              throw new java.io.IOException(s"rename $tmpP -> $ledgerP failed")
          }
        } finally fresh.unpersist()
        ()
      }
}
