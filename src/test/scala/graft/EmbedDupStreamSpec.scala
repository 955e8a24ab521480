package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EmbedDupStream

class EmbedDupStreamSpec extends SparkSpec {
  import spark.implicits._

  test("hashEmbedExpr is bit-identical to the batch hashEmbed gather") {
    import graft.operators.TextStats
    val docs = Seq((1L, "the table row scan key table table"),
      (2L, "join merge window batch"), (3L, "")).toDF("doc_id", "text")
    val batch = TextStats.hashEmbedGather(
        TextStats.hashEmbed(docs, "doc_id", "text", dim = 16), "doc_id")
      .select(col("id"), col("v")).as[(Long, Seq[Double])].collect().toMap
    val perRow = docs.select(col("doc_id"),
        TextStats.hashEmbedExpr(col("text"), 16).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(perRow == batch, s"$perRow vs $batch")
  }

  test("streaming semantic near-dup: scaled copy rejected with lineage, " +
      "unrelated admitted, zero-norm admitted without state") {
    val rnd = new scala.util.Random(5)
    val base = Seq.fill(8)(rnd.nextGaussian())
    val scaled = base.map(_ * 2.0)          // cosine exactly 1
    val other = Seq.fill(8)(rnd.nextGaussian())
    assert(EmbedDupStream.cosine(base, other).exists(_ < 0.95))

    val input = MemoryStream[EmbedDupStream.Doc](spark)
    val q = EmbedDupStream.admittedAppend(
        EmbedDupStream.bandVotes(input.toDS(), dim = 8, thresholdE4 = 9500L))
      .toDF("id", "admitted", "dup_of")
      .writeStream.format("memory").queryName("embed_dup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(EmbedDupStream.Doc(1L, base))
      q.processAllAvailable()
      input.addData(
        EmbedDupStream.Doc(2L, scaled),
        EmbedDupStream.Doc(3L, other),
        EmbedDupStream.Doc(4L, Seq.fill(8)(0.0))) // zero-norm
      q.processAllAvailable()
      val got = spark.table("embed_dup")
        .as[(Long, Boolean, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      assert(got(1L) == ((true, 1L)))
      assert(got(2L) == ((false, 1L)), got.toString) // exact scaled copy
      assert(got(3L) == ((true, 3L)))
      assert(!got.contains(4L), "zero-norm emits no votes (admit upstream)")
    } finally q.stop()

    // chain semantics: a near-dup of a REJECTED doc is also rejected
    val input2 = MemoryStream[EmbedDupStream.Doc](spark)
    val q2 = EmbedDupStream.admittedAppend(
        EmbedDupStream.bandVotes(input2.toDS(), dim = 8, thresholdE4 = 9500L))
      .toDF("id", "admitted", "dup_of")
      .writeStream.format("memory").queryName("embed_dup_chain")
      .outputMode(OutputMode.Append()).start()
    try {
      input2.addData(EmbedDupStream.Doc(1L, base))
      q2.processAllAvailable()
      input2.addData(EmbedDupStream.Doc(2L, scaled))
      q2.processAllAvailable()
      input2.addData(EmbedDupStream.Doc(3L, scaled.map(_ * 3.0)))
      q2.processAllAvailable()
      val got = spark.table("embed_dup_chain")
        .as[(Long, Boolean, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      assert(got(2L)._1 == false && got(3L)._1 == false)
      assert(got(3L)._2 == 1L, got.toString) // matched the chain's root
    } finally q2.stop()
  }
}
