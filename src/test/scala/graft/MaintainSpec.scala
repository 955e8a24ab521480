package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextStats}
import graft.pipeline.{Maintain, Restore}

/** Index lifecycle maintenance: append-until-drift → decision flip →
  * retrain/compact into a new published version → serving parity.
  */
class MaintainSpec extends SparkSpec {
  import spark.implicits._

  private def tmpWarehouse(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_maint_$tag").toString

  test("IVF: aligned appends decide none; drifted appends flip to " +
      "retrain; retrain publishes a new version whose serving equals a " +
      "fresh build over the full corpus and resets the decision") {
    val wh = tmpWarehouse("ivf")
    val rnd = new scala.util.Random(3)
    // base corpus: two tight clusters around orthogonal axes
    def cluster(n: Int, axis: Int, off: Long) = Seq.tabulate(n) { i =>
      (off + i, Seq.tabulate(8)(d =>
        (if (d == axis) 5.0 else 0.0) + rnd.nextGaussian() * 0.05))
    }
    val base = (cluster(40, 0, 0L) ++ cluster(40, 1, 1000L))
      .toDF("id", "v")
    Restore.publishVersionedDir(spark, wh, "ivfidx", "0") { vdir =>
      Similarity.writeIvfIndex(base,
        Similarity.buildIvf(base, numCells = 2, iters = 1), vdir.toString)
    }
    def curDir = Restore.resolveVersioned(spark, wh, "ivfidx").get.toString
    assert(Maintain.ivfDecision(spark, curDir).action == "none")

    // an ALIGNED batch (same clusters, new ids): high cosine, no retrain
    val aligned = (cluster(10, 0, 5000L) ++ cluster(10, 1, 6000L))
      .toDF("id", "v")
    Maintain.appendIvfRecorded(spark, curDir, aligned, "b1")
    val d1 = Maintain.ivfDecision(spark, curDir)
    assert(d1.action == "none" && d1.metric > 8500L, d1.toString)

    // a DRIFTED batch: a new cluster on an axis no centroid owns —
    // appended vectors score near-zero cosine to their frozen centroid
    val drifted = cluster(60, 5, 9000L).toDF("id", "v")
    Maintain.appendIvfRecorded(spark, curDir, drifted, "b2")
    val d2 = Maintain.ivfDecision(spark, curDir)
    assert(d2.action == "retrain" && d2.metric < 8500L, d2.toString)

    // retrain: new version, fresh centroids fit the drifted corpus
    val newDir = Maintain.ivfRetrain(spark, wh, "ivfidx", "1",
      numCells = 3, iters = 1)
    assert(curDir == newDir.toString, "marker did not flip")
    assert(Maintain.ivfDecision(spark, curDir).action == "none",
      "fresh version must carry no drift ledger")
    // serving parity: the retrained index answers exactly like the
    // in-memory path over the full corpus with the same deterministic
    // build (buildIvf is hash-seeded and fixed-point — same vector set,
    // same centroids)
    val full = base.unionByName(aligned).unionByName(drifted)
    val queries = full.filter(col("id") % 10 === 0)
    val got = Similarity.ivfTopKIndexed(spark, curDir, queries,
        nprobe = 2, k = 3)
      .select("vec_id", "other_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val want = Similarity.ivfTopK(full,
        Similarity.buildIvf(full, numCells = 3, iters = 1), queries,
        nprobe = 2, k = 3)
      .select("vec_id", "other_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    // the drifted cluster is now served well: its members' top hits are
    // in-cluster (the frozen-centroid index had them scattered)
    val driftedHits = got.filter(t => t._1 >= 9000L && t._3 == 1L)
    assert(driftedHits.nonEmpty && driftedHits.forall(_._2 >= 9000L),
      driftedHits.toString)
  }

  test("BM25: batch-count decision flips at the threshold; compaction " +
      "publishes one base batch with bit-identical serving") {
    val wh = tmpWarehouse("bm25")
    val docs = Seq((1L, "spark catalyst plans joins"),
      (2L, "catalyst codegen stages")).toDF("doc_id", "text")
    Restore.publishVersionedDir(spark, wh, "bm", "0") { vdir =>
      TextStats.writeBm25Index(docs, "doc_id", "text", vdir.toString)
    }
    def curDir = Restore.resolveVersioned(spark, wh, "bm").get.toString
    for (b <- 1 to 3)
      TextStats.appendToBm25Index(spark, curDir,
        Seq((100L + b, s"batch $b spark joins document"))
          .toDF("doc_id", "text"),
        "doc_id", "text", s"b$b")
    val d = Maintain.bm25Decision(spark, curDir, maxBatches = 2)
    assert(d.action == "compact" && d.metric == 4L, d.toString)
    val queries = Seq((1L, "spark"), (1L, "joins"), (2L, "catalyst"))
      .toDF("qid", "term")
    val before = TextStats.bm25AgainstIndex(spark, curDir, queries,
        "qid", "term", k = 3)
      .select("qid", "id", "score_e6", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSet
    Maintain.bm25Compact(spark, wh, "bm", "1")
    val dAfter = Maintain.bm25Decision(spark, curDir, maxBatches = 2)
    assert(dAfter.action == "none" && dAfter.metric == 1L, dAfter.toString)
    val after = TextStats.bm25AgainstIndex(spark, curDir, queries,
        "qid", "term", k = 3)
      .select("qid", "id", "score_e6", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(after == before, "compaction changed serving results")
  }

  test("MinHash: compaction merges committed batches; near-dup serving " +
      "is bit-identical and the banding meta survives") {
    val wh = tmpWarehouse("mh")
    val docA = "the quick brown fox jumps over the lazy dog again and again"
    val old = Seq((1L, docA),
      (2L, "completely different content about spark catalyst plans"))
      .toDF("doc_id", "text")
    Restore.publishVersionedDir(spark, wh, "mh", "0") { vdir =>
      Dedup.writeMinhashIndex(old, "doc_id", "text", vdir.toString)
    }
    def curDir = Restore.resolveVersioned(spark, wh, "mh").get.toString
    for (b <- 1 to 3)
      Dedup.appendToMinhashIndex(spark, curDir,
        Seq((100L + b, docA + s" tail $b")).toDF("doc_id", "text"),
        "doc_id", "text", s"b$b")
    assert(Maintain.minhashDecision(spark, curDir, maxBatches = 2)
      .action == "compact")
    // exact dup of an indexed doc: band match guaranteed (identical
    // shingle set), so the parity compare has content on both sides
    val probe = Seq((500L, docA)).toDF("doc_id", "text")
    def serve(): Set[(Long, Long, Long)] = {
      val m = Dedup.nearDupAgainstIndex(spark, curDir, probe,
        "doc_id", "text")
      val r = m.df.select("id_new", "id_old", "jacc_e4")
        .as[(Long, Long, Long)].collect().toSet
      m.close(); r
    }
    val before = serve()
    assert(before.nonEmpty, "probe should band-match the planted dups")
    Maintain.minhashCompact(spark, wh, "mh", "1")
    assert(Maintain.minhashDecision(spark, curDir, maxBatches = 2)
      .metric == 1L)
    assert(serve() == before, "compaction changed near-dup serving")
  }
}
