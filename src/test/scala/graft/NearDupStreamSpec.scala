package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.NearDupStream
import graft.streaming.NearDupStream.{Doc, Vote}

class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  test("hamming16 and band keys") {
    assert(NearDupStream.hamming16(0x0000L, 0x0001L) == 1)
    assert(NearDupStream.hamming16(0x0000L, 0xffffL) == 16)
    // two sigs within hamming 3 share at least one exact 4-bit band
    val a = 0x1234L
    val b = a ^ 0x0007L // 3 bits flipped, all in band 0
    val shared = NearDupStream.bandKeys(a).toSet
      .intersect(NearDupStream.bandKeys(b).toSet)
    assert(shared.nonEmpty)
  }

  test("streaming gate admits firsts and flags close signatures across batches") {
    val input = MemoryStream[Doc](spark)
    val votes = NearDupStream.bandVotes(input.toDS(), maxHamming = 3)
    val q = NearDupStream.admitted(votes)
      .writeStream.format("memory").queryName("neardup_admitted")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(Doc(1L, 0x0000L), Doc(3L, 0xffffL))
      q.processAllAvailable()
      input.addData(
        Doc(2L, 0x0001L), // hamming 1 from doc 1 -> dup
        Doc(4L, 0xfff7L), // hamming 1 from doc 3 -> dup
        Doc(5L, 0x0f0fL)) // hamming 8 from both -> clean
      q.processAllAvailable()
      val got = spark.table("neardup_admitted")
        .select("id", "is_dup", "dup_of").as[(Long, Boolean, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got(1L) == ((false, 1L)))
      assert(got(3L) == ((false, 3L)))
      assert(got(2L) == ((true, 1L)))
      assert(got(4L) == ((true, 3L)))
      assert(got(5L) == ((false, 5L)))
    } finally q.stop()
  }

  test("within one batch the smaller id wins its bucket deterministically") {
    val input = MemoryStream[Doc](spark)
    val votes = NearDupStream.bandVotes(input.toDS(), maxHamming = 3)
    val q = NearDupStream.admitted(votes)
      .writeStream.format("memory").queryName("neardup_batch")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(Doc(11L, 0x00aaL), Doc(10L, 0x00abL)) // hamming 1, same batch
      q.processAllAvailable()
      val got = spark.table("neardup_batch")
        .select("id", "is_dup", "dup_of").as[(Long, Boolean, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got(10L) == ((false, 10L))) // smaller id admitted
      assert(got(11L) == ((true, 10L)))
    } finally q.stop()
  }

  test("near-dup chains collapse transitively (batch-component parity)") {
    // doc2 is rejected (near doc1); doc3 is near doc2 but NOT doc1 —
    // the chain semantics (class doc) rejects doc3 with parent doc2,
    // exactly as batch connectedComponents would put 1-2-3 in one group.
    val input = MemoryStream[Doc](spark)
    val votes = NearDupStream.bandVotes(input.toDS(), maxHamming = 3)
    val q = NearDupStream.admitted(votes)
      .writeStream.format("memory").queryName("neardup_chain")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(Doc(1L, 0x0000L))
      q.processAllAvailable()
      input.addData(Doc(2L, 0x0007L)) // hamming 3 from doc1 -> dup of 1
      q.processAllAvailable()
      input.addData(Doc(3L, 0x0707L)) // hamming 6 from doc1, 3 from doc2
      q.processAllAvailable()
      val got = spark.table("neardup_chain")
        .select("id", "is_dup", "dup_of").as[(Long, Boolean, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got(1L) == ((false, 1L)))
      assert(got(2L) == ((true, 1L)))
      assert(got(3L) == ((true, 2L))) // parent pointer, not cluster root
    } finally q.stop()
  }

  test("admittedAppend emits one verdict per doc with self-cleaning state") {
    val input = MemoryStream[Doc](spark)
    val votes = NearDupStream.bandVotes(input.toDS(), maxHamming = 3)
    val q = NearDupStream.admittedAppend(votes)
      .writeStream.format("memory").queryName("neardup_append")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Doc(1L, 0x0000L), Doc(3L, 0xffffL))
      q.processAllAvailable()
      input.addData(Doc(2L, 0x0001L))
      q.processAllAvailable()
      val got = spark.table("neardup_append")
        .select("id", "is_dup", "dup_of").as[(Long, Boolean, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got.size == 3) // exactly one verdict per doc, append-only
      assert(got(1L) == ((false, 1L)))
      assert(got(3L) == ((false, 3L)))
      assert(got(2L) == ((true, 1L)))
    } finally q.stop()
  }
}
