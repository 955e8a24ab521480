package graft

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.functions._
import graft.sources.Warc

class WarcSpec extends SparkSpec {
  import spark.implicits._

  test("round-trip: synthesized file parses back to every field") {
    val f = Warc.buildFile(3L, Seq((31L, "hello world"), (32L, "")))
    val recs = Warc.parseFile(f)
    assert(recs.map(_.warc_type) === Seq("warcinfo", "response", "response"))
    assert(recs.map(_.rec_index) === Seq(0, 1, 2))
    val r1 = recs(1)
    assert(r1.uri === "https://example.org/doc/31")
    assert(r1.http_status === 200)
    assert(r1.body === "hello world")
    assert(r1.content_length === 45L + "hello world".getBytes(UTF_8).length)
    // empty body: prefix-only payload
    assert(recs(2).body === "")
    assert(recs(2).content_length === 45L)
    // non-response records carry no HTTP fields
    assert(recs.head.http_status === -1 && recs.head.body === "")
  }

  test("malformed input never throws: truncation, garbage, bad lengths") {
    val good = Warc.buildFile(0L, Seq((1L, "abc def")))
    // truncate mid-payload: the warcinfo record parses, the response doesn't
    val cut = Warc.parseFile(Warc.WarcFile(0L, good.data.take(good.data.length - 10)))
    assert(cut.map(_.warc_type) === Seq("warcinfo"))
    // pure garbage → zero records, no throw
    assert(Warc.parseFile(Warc.WarcFile(0L, Array.fill[Byte](64)(0x41))) === Seq())
    assert(Warc.parseFile(Warc.WarcFile(0L, Array.emptyByteArray)) === Seq())
    // corrupt Content-Length → scan stops at that record
    val s = new String(good.data, UTF_8)
      .replaceFirst("Content-Length: \\d+\r\n\r\nsoftware", "Content-Length: zz\r\n\r\nsoftware")
    assert(Warc.parseFile(Warc.WarcFile(0L, s.getBytes(UTF_8))) === Seq())
    // missing WARC/ version line → not a record
    val noVer = "OOPS/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    assert(Warc.parseFile(Warc.WarcFile(0L, noVer.getBytes(UTF_8))) === Seq())
  }

  test("gzip layouts: per-record members and whole-file gzip both parse " +
      "identically to the plain file") {
    val docs = Seq((31L, "hello world"), (32L, ""), (33L, "third doc text"))
    val plain = Warc.parseFile(Warc.buildFile(3L, docs))
    assert(Warc.parseFile(Warc.buildFileGz(3L, docs)) === plain)
    assert(Warc.parseFile(Warc.buildFileWholeGz(3L, docs)) === plain)
    assert(plain.count(_.warc_type == "response") === 3)
  }

  test("gzip damage degrades to a parsed prefix, never a throw") {
    val docs = Seq((1L, "first doc"), (2L, "second doc"), (3L, "third doc"))
    val gz = Warc.buildFileGz(7L, docs)
    // truncate inside the LAST member's deflate data (an 8-byte cut only
    // loses the CRC trailer, after the full payload already inflated):
    // earlier members inflate fully, the ragged tail is dropped by the
    // structural parse
    val cut = Warc.parseFile(Warc.WarcFile(7L, gz.data.take(gz.data.length - 60)))
    val full = Warc.parseFile(gz)
    assert(cut.nonEmpty && cut.size < full.size)
    assert(cut === full.take(cut.size))
    // flip a byte deep in the deflate stream: prefix kept, no throw
    val bad = gz.data.clone()
    bad(bad.length - 40) = (bad(bad.length - 40) ^ 0x55).toByte
    val corrupt = Warc.parseFile(Warc.WarcFile(7L, bad))
    assert(corrupt.size <= full.size)
    // a gzip bomb inflates to a bounded prefix (cap, not OOM)
    val bomb = Warc.gzipBytes(Array.fill[Byte](1 << 20)(0x41))
    assert(Warc.gunzipIfGzip(bomb, maxInflated = 1024).length <= 1024 + (64 << 10))
    // non-gzip bytes pass through untouched
    val plainBytes = "WARC/1.0\r\n".getBytes(UTF_8)
    assert(Warc.gunzipIfGzip(plainBytes) eq plainBytes)
  }

  test("parseRecords distributes per file and preserves file ids") {
    val files = Seq(
      Warc.buildFile(0L, Seq((1L, "a"), (2L, "b"))),
      Warc.buildFile(1L, Seq((10L, "c")))).toDS()
    val got = Warc.parseRecords(files)
      .filter(col("warc_type") === "response")
      .select("file_id", "uri").as[(Long, String)].collect().toSet
    assert(got === Set(
      (0L, "https://example.org/doc/1"), (0L, "https://example.org/doc/2"),
      (1L, "https://example.org/doc/10")))
  }

  test("htmlToText: subtree drop, entity single-unescape, collapse") {
    import graft.operators.Curation
    val in = Seq(
      "<p>plain</p>",
      "<script>x &lt; y</script>keep",
      "<style a=b>p{}</style><b>bold</b>  and&#39;s",
      "a &amp;lt; b",                       // single unescape, not double
      "<SCRIPT>upper</SCRIPT>tail",         // case-insensitive
      "  spaced\t\r\n  out  "
    ).toDF("html").select(Curation.htmlToText(col("html")).as("t"))
      .as[String].collect().toSeq
    assert(in === Seq(
      "plain", "keep", "bold and's", "a &lt; b", "tail", "spaced out"))
  }
}
