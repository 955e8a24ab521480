package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.sources.Warc
import graft.streaming.{CurateStream, WarcIngestStream}

/** Streaming WARC→Curate ingest (round-8): the crawl front end parses
  * files into (id, text) docs with batch parity, and composes with the
  * streaming gate so a REPLAYED file (at-least-once delivery) resolves
  * as exact-dups of itself off the stable (file_id, rec_index) ids.
  */
class WarcIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private def goodText(salt: String): String =
    s"the table row scan key " +
      (1 to 24).map(i => s"$salt$i").mkString(" ") + " the a"

  private def htmlDoc(body: String): String =
    s"<html><head><script>if (a &lt; b) {}</script></head>" +
      s"<body><p>$body</p></body></html>"

  test("docs: streaming parse+clean matches the batch path on the same " +
      "files (malformed tail included)") {
    val f1 = Warc.buildFile(3L, Seq(
      1L -> htmlDoc(goodText("one")), 2L -> htmlDoc(goodText("two"))))
    // truncate mid-record: the parser keeps the records before the break
    val f2raw = Warc.buildFile(4L, Seq(
      5L -> htmlDoc(goodText("three")), 6L -> htmlDoc(goodText("four"))))
    val f2 = Warc.WarcFile(4L, f2raw.data.dropRight(40))
    val files = Seq(f1, f2)

    val batch = WarcIngestStream.docs(files.toDS())
      .as[(Long, String)].collect().toSet

    val input = MemoryStream[Warc.WarcFile](spark)
    val q = WarcIngestStream.docs(input.toDS())
      .writeStream.format("memory").queryName("warc_docs")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(f1)
      input.addData(f2)
      q.processAllAvailable()
      val streamed = spark.table("warc_docs")
        .as[(Long, String)].collect().toSet
      assert(streamed === batch)
      // stable ids: file_id * 2^20 + rec_index (rec 0 is warcinfo, so
      // responses start at rec_index 1); the truncated file kept only
      // its first response
      val ids = streamed.map(_._1)
      assert(ids === Set(3L * (1L << 20) + 1, 3L * (1L << 20) + 2,
        4L * (1L << 20) + 1))
      // html stripped: no tags survive, body text does
      assert(streamed.forall { case (_, t) =>
        !t.contains("<") && t.contains("table row scan key") })
    } finally q.stop()
  }

  test("docs: gzipped files (.warc.gz member layout + whole-file) flow " +
      "through the stream identically to their plain twins") {
    val payload1 = Seq(1L -> htmlDoc(goodText("one")),
      2L -> htmlDoc(goodText("two")))
    val payload2 = Seq(5L -> htmlDoc(goodText("three")))
    val batch = WarcIngestStream.docs(Seq(
        Warc.buildFile(3L, payload1), Warc.buildFile(4L, payload2)).toDS())
      .as[(Long, String)].collect().toSet

    val input = MemoryStream[Warc.WarcFile](spark)
    val q = WarcIngestStream.docs(input.toDS())
      .writeStream.format("memory").queryName("warc_docs_gz")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Warc.buildFileGz(3L, payload1))      // per-record members
      input.addData(Warc.buildFileWholeGz(4L, payload2)) // one member
      q.processAllAvailable()
      val streamed = spark.table("warc_docs_gz")
        .as[(Long, String)].collect().toSet
      assert(streamed === batch && streamed.size === 3)
    } finally q.stop()
  }

  test("docs → gate: one verdict per crawl doc; a replayed file resolves " +
      "as exact-dups of itself (idempotent at-least-once ingest)") {
    val fileA = Warc.buildFile(1L, Seq(
      11L -> htmlDoc(goodText("alpha")),
      12L -> htmlDoc(goodText("beta"))))
    val fileB = Warc.buildFile(2L, Seq(
      21L -> htmlDoc(goodText("gamma"))))

    val input = MemoryStream[Warc.WarcFile](spark)
    val q = CurateStream.gate(
        WarcIngestStream.docs(input.toDS()), "id", "text")
      .writeStream.format("memory").queryName("warc_gate")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(fileA)
      q.processAllAvailable()
      input.addData(fileB)
      input.addData(fileA) // redelivery
      q.processAllAvailable()
      val got = spark.table("warc_gate")
        .as[CurateStream.GateVerdict].collect()
        .groupBy(_.id).view.mapValues(_.toSeq).toMap
      val idA1 = 1L * (1L << 20) + 1
      val idA2 = 1L * (1L << 20) + 2
      val idB1 = 2L * (1L << 20) + 1
      assert(got.keySet === Set(idA1, idA2, idB1))
      // first delivery admitted
      assert(got(idA1).exists(v => v.admitted && v.reason == "admitted"))
      assert(got(idA2).exists(v => v.admitted && v.reason == "admitted"))
      assert(got(idB1).exists(v => v.admitted && v.reason == "admitted"))
      // replay: same ids come back as exact-dups OF THEMSELVES — the
      // ledger consumer drops them without any id bookkeeping
      val replays = got(idA1) ++ got(idA2)
      assert(replays.count(v =>
        !v.admitted && v.reason == "exact_dup" && v.dup_of == v.id) == 2)
    } finally q.stop()
  }
}
