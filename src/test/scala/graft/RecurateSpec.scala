package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{CurateConfig, Increment, IncrementConfig, Recurate,
  Restore}

/** The periodic full re-curation orchestrator (r16 verdict #2): full
  * funnel with pool-relative gates over the accumulated corpus →
  * rebuild every state table into a versioned root → atomic pointer
  * swap; crash before the swap leaves the old root serving.
  */
class RecurateSpec extends SparkSpec {
  import spark.implicits._

  private def goodText(salt: String): String =
    s"the table row scan key " +
      (1 to 24).map(i => s"$salt$i").mkString(" ") + " the a"

  private def verdictMap(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "admitted", "reason", "dup_of")
      .as[(Long, Boolean, String, Long)].collect()
      .map(v => v._1 -> ((v._2, v._3, v._4))).toMap

  private val bench = Seq(900L -> "benchmark eval only phrase")
    .toDF("doc_id", "text")

  test("recurate: full funnel (incl. the pool-relative ppl-bucket " +
      "gate) → versioned state root → increments serve from it; " +
      "parity with a manually seeded root") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_recur_wh").toString
    // 30 fluent docs + 1 exact dup + gibberish the self-trained KN
    // buckets push to the tail (the pool-relative gate increments
    // cannot run)
    val corpus = ((1L to 30L).map(i => i -> goodText(s"s$i")) ++
      Seq(31L -> goodText("s1"), // exact dup of 1
        40L -> (1 to 26).map(i => s"zq$i xv$i").mkString(" ")))
      .toDF("doc_id", "text")
    val cfg = CurateConfig(minQualityE4 = 0,
      pplBucketsKeep = Some(Set("head", "middle")))
    val r = Recurate.run(spark, wh, "state", "1", corpus, "doc_id",
      "text", bench, "text", cfg)
    // the pointer resolves to the committed root
    val cur = Restore.resolveVersioned(spark, wh, "state")
    assert(cur.map(_.toString).contains(r.versionDir))
    // the base ledger: the exact dup fell, the ppl gate REJECTED at
    // least one tail doc (the pool-relative stage actually ran)
    val led = verdictMap(Increment.readLedger(spark, r.versionDir))
    assert(led(31L) == ((false, "exact_dup", 1L)))
    assert(led.values.exists(_._2 == "ppl"), led.toString)
    assert(led(1L) == ((true, "admitted", 1L)))
    // metrics carry the funnel's stage series under base
    assert(Increment.readMetrics(spark, r.versionDir)
      .filter(col("stage") === "exact_dedup").count() == 1)
    // an increment against the recurated root: exact/near vs state
    val batch = Seq(100L -> goodText("s2"),            // exact dup of 2
      101L -> (goodText("s3") + " appended"),          // near-dup of 3
      102L -> goodText("fresh")).toDF("doc_id", "text")
    val got = verdictMap(Increment.curateIncrement(batch, "doc_id",
      "text", cur.get.toString, "b1").ledger)
    assert(got(100L) == ((false, "exact_dup", 2L)))
    assert(got(101L) == ((false, "near_dup", 3L)))
    assert(got(102L) == ((true, "admitted", 102L)))
    // parity: the same increment against a MANUALLY seeded root over
    // the same admitted docs is verdict-identical
    val manual = java.nio.file.Files
      .createTempDirectory("graft_recur_manual").toString
    val admittedDocs = corpus.join(
      Increment.readLedger(spark, r.versionDir)
        .filter(col("admitted")).select(col("id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    Increment.initStateFromCurated(spark, manual, admittedDocs,
      "doc_id", "text")
    val want = verdictMap(Increment.curateIncrement(batch, "doc_id",
      "text", manual, "b1").ledger)
    assert(got == want)
  }

  test("kill-mid-rebuild: a crashed publish (orphan version dir, no " +
      "pointer swap) leaves the old root serving; the same-token " +
      "retry clears the orphan and completes the swap") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_recur_crash_wh").toString
    val corpus1 = (1L to 8L).map(i => i -> goodText(s"a$i"))
      .toDF("doc_id", "text")
    val cfg = CurateConfig(minQualityE4 = 0)
    val r1 = Recurate.run(spark, wh, "state", "1", corpus1, "doc_id",
      "text", bench, "text", cfg)
    // simulate a crashed second attempt: a half-built version dir
    // exists but its marker never swapped
    val fs = new org.apache.hadoop.fs.Path(wh).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val orphan = new org.apache.hadoop.fs.Path(wh, "state__v2")
    fs.mkdirs(new org.apache.hadoop.fs.Path(orphan, "exact"))
    // old root serves: pointer unchanged, increments run against it
    assert(Restore.resolveVersioned(spark, wh, "state")
      .map(_.toString).contains(r1.versionDir))
    val v = verdictMap(Increment.curateIncrement(
      Seq(100L -> goodText("a1")).toDF("doc_id", "text"), "doc_id",
      "text", r1.versionDir, "b1").ledger)
    assert(v(100L) == ((false, "exact_dup", 1L)))
    // retry with the SAME token: orphan cleared, publish completes
    val corpus2 = (1L to 8L).map(i => i -> goodText(s"b$i"))
      .toDF("doc_id", "text")
    val r2 = Recurate.run(spark, wh, "state", "2", corpus2, "doc_id",
      "text", bench, "text", cfg)
    assert(Restore.resolveVersioned(spark, wh, "state")
      .map(_.toString).contains(r2.versionDir))
    // the new root gates on the NEW pool
    val v2 = verdictMap(Increment.curateIncrement(
      Seq(200L -> goodText("b1"), 201L -> goodText("a1"))
        .toDF("doc_id", "text"), "doc_id", "text", r2.versionDir,
      "b1").ledger)
    assert(v2(200L) == ((false, "exact_dup", 1L)))
    assert(v2(201L) == ((true, "admitted", 201L)))
  }

  test("recurate with the semantic stage rebuilds the sem sub-state: " +
      "the next increment sem-dups a word-permuted twin of recurated " +
      "history") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_recur_sem_wh").toString
    val corpus = (1L to 6L).map(i => i -> goodText(s"c$i"))
      .toDF("doc_id", "text")
    val cfg = CurateConfig(minQualityE4 = 0,
      semDedupThresholdE4 = Some(9500L))
    val r = Recurate.run(spark, wh, "state", "1", corpus, "doc_id",
      "text", bench, "text", cfg)
    def rev(t: String): String = t.split(" ").reverse.mkString(" ")
    val got = verdictMap(Increment.curateIncrement(
      Seq(100L -> rev(goodText("c2"))).toDF("doc_id", "text"),
      "doc_id", "text", r.versionDir, "b1",
      IncrementConfig(minQualityE4 = 0,
        semDedupThresholdE4 = Some(9500L))).ledger)
    assert(got(100L) == ((false, "sem_dup", 2L)), got.toString)
  }

  test("publishState refuses to reuse a COMMITTED token (ADVICE r17): " +
      "a superseded version dir is immutable history, not a crashed " +
      "orphan; unlogged orphans still clear") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_recur_vlog_wh").toString
    val fs = new org.apache.hadoop.fs.Path(wh).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def touch(root: String, name: String): Unit =
      fs.create(new org.apache.hadoop.fs.Path(root, name), true).close()
    Recurate.publishState(spark, wh, "db", "1")(touch(_, "a"))
    Recurate.publishState(spark, wh, "db", "2")(touch(_, "b"))
    // v1 is off-pointer (superseded) but COMMITTED — reuse is refused
    // loudly and the historical dir is untouched
    val e = intercept[IllegalArgumentException] {
      Recurate.publishState(spark, wh, "db", "1")(touch(_, "c"))
    }
    assert(e.getMessage.contains("committed-version log"))
    assert(fs.exists(new org.apache.hadoop.fs.Path(wh, "db__v1/a")))
    assert(Restore.resolveVersioned(spark, wh, "db")
      .map(_.getName).contains("db__v2"))
    // a CRASHED orphan (dir exists, never committed → unlogged) still
    // clears under same-token retry, and the retry commits
    fs.mkdirs(new org.apache.hadoop.fs.Path(wh, "db__v3/half"))
    Recurate.publishState(spark, wh, "db", "3")(touch(_, "d"))
    assert(Restore.resolveVersioned(spark, wh, "db")
      .map(_.getName).contains("db__v3"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(wh, "db__v3/half")))
    // and now-committed v3 refuses reuse too
    intercept[IllegalArgumentException] {
      Recurate.publishState(spark, wh, "db", "3")(touch(_, "e"))
    }
  }

  test("publishState seeds every modality family atomically: " +
      "audio/video/embedding roots publish through the same pointer " +
      "swap and their increments serve from the resolved dir") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_recur_fam_wh").toString
    // embedding family via initSemStateFromCurated
    val vecs = Seq(
      (1L, Array(1.0, 0.0, 0.0)), (2L, Array(0.0, 1.0, 0.0)))
      .toDF("id", "v")
    Recurate.publishState(spark, wh, "emb", "1") { root =>
      Increment.initSemStateFromCurated(spark, root, vecs)
    }
    val embRoot = Restore.resolveVersioned(spark, wh, "emb").get.toString
    val ev = verdictMap(Increment.curateEmbeddingIncrement(
      Seq((10L, Array(1.0, 0.0, 0.0)),                // exact of 1
        (11L, Array(0.0, 0.99, 0.01)),                // sem-near of 2
        (12L, Array(0.0, 0.0, 1.0))).toDF("id", "v"), // fresh
      embRoot, "b1").ledger)
    assert(ev(10L) == ((false, "exact_dup", 1L)))
    // the embedding increment's cosine stage IS its near-dup stage
    assert(ev(11L) == ((false, "near_dup", 2L)))
    assert(ev(12L) == ((true, "admitted", 12L)))
  }
}
