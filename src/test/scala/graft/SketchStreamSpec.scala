package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.Sketches
import graft.streaming.SketchStream

class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  test("scala hash twins match the column arithmetic exactly") {
    val keys = Seq("alpha", "beta", "gamma", "a b c", "", "ümlaut")
    // CMS buckets: batch counters of a single count-1 key expose its
    // (j, bucket) row per depth
    keys.foreach { k =>
      val rows = Sketches.cmsCounters(Seq((k, 1L)).toDF("key", "cnt"),
          "key", "cnt", depth = 4, width = 64)
        .select("j", "bucket").as[(Int, Long)].collect().toMap
      (0 until 4).foreach { j =>
        assert(rows(j) === Sketches.bucketOf(k, j, 64), s"key=$k j=$j")
      }
    }
    // HLL (bucket, rho)
    keys.foreach { k =>
      val reg = Sketches.hllRegisters(Seq(k).toDF("k"), "k")
        .as[(Long, Long)].collect().head
      assert(reg === Sketches.hllBucketRho(k), s"key=$k")
    }
  }

  test("streaming counters after any prefix equal the batch sketch of " +
      "everything ingested") {
    val input = MemoryStream[(String, Long)](spark)
    val q = SketchStream.cmsCounters(input.toDS())
      .toDF("j", "bucket", "c")
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      def finalCounters = spark.table("cms_stream")
        .groupBy("j", "bucket").agg(max("c").as("c"))
        .as[(Int, Long, Long)].collect().toSet
      def batchOf(rows: Seq[(String, Long)]) =
        Sketches.cmsCounters(rows.toDF("key", "cnt"), "key", "cnt")
          .as[(Int, Long, Long)].collect().toSet
      val b1 = Seq(("apple", 3L), ("pear", 1L), ("apple", 2L))
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(finalCounters === batchOf(b1))
      val b2 = Seq(("plum", 5L), ("apple", 1L))
      input.addData(b2: _*)
      q.processAllAvailable()
      assert(finalCounters === batchOf(b1 ++ b2))
    } finally q.stop()
  }

  test("streaming HLL registers track the batch registers; estimate " +
      "follows") {
    val input = MemoryStream[String](spark)
    val q = SketchStream.hllRegisters(input.toDS())
      .toDF("bucket", "mrho")
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      def finalRegs = spark.table("hll_stream")
        .groupBy("bucket").agg(max("mrho").as("mrho"))
      input.addData((1 to 30).map(i => s"k$i"): _*)
      q.processAllAvailable()
      input.addData((20 to 50).map(i => s"k$i"): _*)   // overlap re-ingest
      q.processAllAvailable()
      val batch = Sketches.hllRegisters(
        (1 to 50).map(i => s"k$i").toDF("k"), "k")
      assert(finalRegs.as[(Long, Long)].collect().toSet ===
        batch.as[(Long, Long)].collect().toSet)
      // the running estimate is the batch estimate of the union
      val se = Sketches.hllEstimate(finalRegs)
        .as[(Long, Long, Long)].collect().head
      val be = Sketches.hllEstimate(batch)
        .as[(Long, Long, Long)].collect().head
      assert(se === be)
    } finally q.stop()
  }
}
