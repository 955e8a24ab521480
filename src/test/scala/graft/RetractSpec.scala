package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal.MediaRecord
import graft.pipeline.{Increment, IncrementConfig}

/** Retraction (right-to-be-forgotten) from accumulated increment state:
  * a retracted doc stops causing exact/near/semantic verdicts, its
  * resubmission admits fresh, the ledger keeps an audit row, other
  * docs' state is untouched, and the sweep is idempotent.
  */
class RetractSpec extends SparkSpec {
  import spark.implicits._

  private def goodText(salt: String): String =
    s"the table row scan key " +
      (1 to 24).map(i => s"$salt$i").mkString(" ") + " the a"

  private def vm(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "admitted", "reason", "dup_of")
      .as[(Long, Boolean, String, Long)].collect()
      .map(v => v._1 -> ((v._2, v._3, v._4))).toMap

  test("text state: retraction clears exact, minhash, AND semantic " +
      "hits; ledger flips to retracted; others untouched; idempotent") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_retract_t").toString
    val cfg = IncrementConfig(minQualityE4 = 0,
      semDedupThresholdE4 = Some(9500L))
    def rev(t: String): String = t.split(" ").reverse.mkString(" ")
    Increment.curateIncrement(
      Seq(1L -> goodText("one"), 3L -> goodText("two"))
        .toDF("doc_id", "text"), "doc_id", "text", dir, "b1", cfg)
    // the state really gates: exact echo of 1, near of 3, permuted 3
    val m2 = vm(Increment.curateIncrement(
      Seq(10L -> goodText("one"), 11L -> (goodText("two") + " zz"),
        12L -> rev(goodText("two"))).toDF("doc_id", "text"),
      "doc_id", "text", dir, "b2", cfg).ledger)
    assert(m2(10L) == ((false, "exact_dup", 1L)))
    assert(m2(11L)._2 == "near_dup" && m2(11L)._3 == 3L)
    assert(m2(12L) == ((false, "sem_dup", 3L)))
    // retract 1 AND 3
    Increment.retract(spark, dir, Seq(1L, 3L).toDF("id"))
    val led = Increment.readLedger(spark, dir)
      .filter(col("batch_id") === "b1")
    assert(vm(led) == Map(
      1L -> ((false, "retracted", 1L)),
      3L -> ((false, "retracted", 3L))))
    // the same contents now admit fresh through every gate
    val m3 = vm(Increment.curateIncrement(
      Seq(20L -> goodText("one"), 21L -> (goodText("two") + " zz"),
        22L -> rev(goodText("two"))).toDF("doc_id", "text"),
      "doc_id", "text", dir, "b3", cfg).ledger)
    assert(m3(20L) == ((true, "admitted", 20L)))
    assert(m3(21L) == ((true, "admitted", 21L)))
    // 22 is a word-permutation of 21's base text — they semantically
    // collide WITHIN b3; the retracted 3 no longer decides
    assert(m3(22L)._2 != "exact_dup" && m3(22L)._3 != 3L)
    // idempotent rerun; unrelated new dups still gate (21 is state now)
    Increment.retract(spark, dir, Seq(1L, 3L).toDF("id"))
    val m4 = vm(Increment.curateIncrement(
      Seq(30L -> (goodText("two") + " zz")).toDF("doc_id", "text"),
      "doc_id", "text", dir, "b4", cfg).ledger)
    assert(m4(30L) == ((false, "exact_dup", 21L)))
  }

  test("image state: retraction clears exact-payload and pHash hits") {
    def mix(id: Long, p: Long): Long = {
      var z = id * 0x9E3779B97F4A7C15L + p * 0xC2B2AE3D27D4EB4FL
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      (z ^ (z >>> 27)) & 0xffL
    }
    def png(seed: Long, nudge: Int): Array[Byte] =
      graft.operators.Multimodal.encodeGrayPixelsPng(16, 16,
        Array.tabulate(256)(p => (mix(seed, p.toLong).toInt +
          (if (p < 40) nudge else 0)).min(255)))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_retract_i").toString
    Increment.curateImageIncrement(
      Seq(MediaRecord(1L, png(1, 0), "image/png"),
        MediaRecord(2L, png(2, 0), "image/png")).toDS(), dir, "b1")
    val m2 = vm(Increment.curateImageIncrement(
      Seq(MediaRecord(10L, png(1, 0), "image/png"),
        MediaRecord(11L, png(2, 7), "image/png")).toDS(),
      dir, "b2").ledger)
    assert(m2(10L) == ((false, "exact_dup", 1L)))
    assert(m2(11L) == ((false, "near_dup", 2L)))
    Increment.retract(spark, dir, Seq(1L, 2L).toDF("id"))
    val m3 = vm(Increment.curateImageIncrement(
      Seq(MediaRecord(20L, png(1, 0), "image/png"),
        MediaRecord(21L, png(2, 7), "image/png")).toDS(),
      dir, "b3").ledger)
    assert(m3(20L) == ((true, "admitted", 20L)))
    assert(m3(21L) == ((true, "admitted", 21L)))
  }
}
