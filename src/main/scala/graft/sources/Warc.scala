package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.Dataset

/** WARC (Web ARChive, ISO 28500) container parsing — the ingest end of a
  * web-crawl training-data pipeline. A WARC file is a concatenation of
  * records: a header block (`WARC/1.0` version line + `Name: value`
  * lines, CRLF, blank-line terminated), a `Content-Length`-sized payload
  * block, then a CRLF CRLF separator. `response` records carry a full
  * HTTP response as payload — status line, headers, blank line, body.
  *
  * Real crawl archives ship compressed: Common Crawl's `.warc.gz` is one
  * gzip member PER RECORD (so a reader can seek to a record), and plain
  * archives are often whole-file gzipped. [[parseFile]] sniffs the gzip
  * magic and inflates either layout through one `GZIPInputStream` walk
  * (JDK-only, concatenated members handled natively) before the byte
  * scan — truncated members degrade to a parsed prefix, same as
  * structural damage.
  *
  * Parsing is pure byte/offset arithmetic (same discipline as the ISO-BMFF
  * walk in operators/Multimodal.scala): malformed structure ends the scan
  * of that file — never a throw — so one corrupt record cannot kill a
  * 100 TB ingest task. Files travel as opaque `binary` columns; the parse
  * is a typed flatMap per file (records within a file are sequential by
  * format — the file, not the record, is the unit of parallelism, which
  * is how crawl archives shard anyway: many ~1 GiB WARC files).
  */
object Warc {

  /** One WARC file as an opaque payload. */
  case class WarcFile(file_id: Long, data: Array[Byte])

  /** One parsed record. `http_status`/`body` are -1/"" for records whose
    * payload is not an HTTP response (warcinfo, request, metadata …).
    */
  case class WarcRec(file_id: Long, rec_index: Int, warc_type: String,
                     uri: String, http_status: Int, content_length: Long,
                     body: String)

  /** Find the CRLF CRLF terminator at/after `from`; -1 if absent. */
  private def blankLine(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Inflate a gzip payload — or pass it through untouched when the magic
    * bytes say it is not one (plain WARC files keep working unsniffed).
    * Handles BOTH real-world layouts with one code path: a whole-file
    * gzip is one member, and Common Crawl's `.warc.gz` is one gzip member
    * PER RECORD, concatenated — `GZIPInputStream` walks concatenated
    * members natively, and the concatenation of the inflated members IS
    * the plain record stream [[parseFile]] already scans.
    *
    * Failure discipline matches the byte scanner: a truncated final
    * member (interrupted upload) or a corrupt deflate stream keeps the
    * bytes inflated so far and lets the structural parse handle the
    * ragged tail — never a throw. `maxInflated` bounds the output
    * (decompression-bomb guard, the decodeImages claimedPixels
    * discipline): a bomb yields a bounded prefix, costing one partial
    * file, not an executor OOM.
    */
  private[graft] def gunzipIfGzip(b: Array[Byte],
                                  maxInflated: Long = 1L << 30): Array[Byte] = {
    if (b.length < 2 || (b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b)
      return b
    val out = new java.io.ByteArrayOutputStream(math.min(b.length * 4, 1 << 20))
    val buf = new Array[Byte](64 << 10)
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      var n = in.read(buf)
      while (n > 0 && out.size.toLong <= maxInflated) {
        out.write(buf, 0, n)
        n = in.read(buf)
      }
    } catch {
      case _: java.io.IOException => () // truncated/corrupt member: keep prefix
    }
    out.toByteArray
  }

  /** Gzip one buffer as a single member (synthesis half of the `.warc.gz`
    * round trip; JDK `GZIPOutputStream`, no timestamps — deterministic).
    */
  def gzipBytes(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.finish(); gz.close()
    bos.toByteArray
  }

  /** Parse every record in one WARC payload — gzipped (whole-file or
    * per-record members, auto-sniffed) or plain. Returns the records
    * parsed before the first structural error (truncated header,
    * bad/missing Content-Length, payload overrunning the file).
    */
  def parseFile(f: WarcFile): Seq[WarcRec] = {
    val b = gunzipIfGzip(f.data)
    val out = Seq.newBuilder[WarcRec]
    var pos = 0
    var idx = 0
    var ok = true
    while (ok && pos + 4 <= b.length) {
      val hdrEnd = blankLine(b, pos)
      if (hdrEnd < 0) ok = false
      else {
        val header = new String(b, pos, hdrEnd - pos, UTF_8)
        val lines = header.split("\r\n")
        if (lines.isEmpty || !lines(0).startsWith("WARC/")) ok = false
        else {
          val kv = lines.iterator.drop(1).flatMap { l =>
            val c = l.indexOf(':')
            if (c < 0) None
            else Some(l.substring(0, c).trim.toLowerCase ->
              l.substring(c + 1).trim)
          }.toMap
          val clen = kv.get("content-length").flatMap(_.toLongOption)
          val blockStart = hdrEnd + 4
          clen match {
            case Some(n) if n >= 0 && blockStart + n <= b.length =>
              val wtype = kv.getOrElse("warc-type", "unknown")
              val uri = kv.getOrElse("warc-target-uri", "")
              val (status, body) =
                if (wtype == "response")
                  parseHttp(b, blockStart, n.toInt)
                else (-1, "")
              out += WarcRec(f.file_id, idx, wtype, uri, status, n, body)
              idx += 1
              // records are separated by CRLF CRLF after the block
              val next = blockStart + n.toInt
              if (next + 4 <= b.length && b(next) == '\r' &&
                b(next + 1) == '\n' && b(next + 2) == '\r' &&
                b(next + 3) == '\n') pos = next + 4
              else { pos = next; ok = next >= b.length }
            case _ => ok = false
          }
        }
      }
    }
    out.result()
  }

  /** Split an HTTP response block into (status, body): status-line code,
    * body = bytes after the first CRLF CRLF. (-1, "") when malformed.
    */
  private def parseHttp(b: Array[Byte], start: Int, len: Int): (Int, String) = {
    val hdrEnd = blankLine(b, start)
    if (hdrEnd < 0 || hdrEnd >= start + len) (-1, "")
    else {
      val head = new String(b, start, hdrEnd - start, UTF_8)
      val statusLine = head.takeWhile(_ != '\r')
      val parts = statusLine.split(" ")
      val status =
        if (parts.length >= 2 && parts(0).startsWith("HTTP/"))
          parts(1).toIntOption.getOrElse(-1)
        else -1
      val bodyStart = hdrEnd + 4
      val bodyLen = start + len - bodyStart
      if (bodyLen < 0) (status, "")
      else (status, new String(b, bodyStart, bodyLen, UTF_8))
    }
  }

  /** Distributed parse: one task per file (the WARC sharding unit). */
  def parseRecords(files: Dataset[WarcFile]): Dataset[WarcRec] = {
    import files.sparkSession.implicits._
    files.flatMap(parseFile _)
  }

  /** The synthesized record stream of a spec-shaped WARC file — one
    * byte-chunk per record (CRLF CRLF separator included): one `warcinfo`
    * record, then one `response` record per (id, text) doc, in order.
    */
  private def recordChunks(fileId: Long,
                           docs: Seq[(Long, String)]): Seq[Array[Byte]] = {
    val chunks = Seq.newBuilder[Array[Byte]]
    def chunk(f: java.io.ByteArrayOutputStream => Unit): Unit = {
      val bos = new java.io.ByteArrayOutputStream()
      f(bos)
      chunks += bos.toByteArray
    }
    def w(bos: java.io.ByteArrayOutputStream, s: String): Unit =
      bos.write(s.getBytes(UTF_8))
    val info = s"software: graft-synth\nfile: $fileId\n"
    chunk { bos =>
      w(bos, "WARC/1.0\r\n")
      w(bos, "WARC-Type: warcinfo\r\n")
      w(bos, s"Content-Length: ${info.getBytes(UTF_8).length}\r\n\r\n")
      w(bos, info)
      w(bos, "\r\n\r\n")
    }
    docs.foreach { case (id, text) =>
      val http = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + text
      val httpLen = http.getBytes(UTF_8).length
      chunk { bos =>
        w(bos, "WARC/1.0\r\n")
        w(bos, "WARC-Type: response\r\n")
        w(bos, s"WARC-Target-URI: https://example.org/doc/$id\r\n")
        w(bos, s"WARC-Record-ID: <urn:graft:$id>\r\n")
        w(bos, "Content-Type: application/http; msgtype=response\r\n")
        w(bos, s"Content-Length: $httpLen\r\n\r\n")
        w(bos, http)
        w(bos, "\r\n\r\n")
      }
    }
    chunks.result()
  }

  private def concatBytes(chunks: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    chunks.foreach(bos.write)
    bos.toByteArray
  }

  /** Synthesize a spec-shaped plain WARC file. Used by tests and the
    * probe's oracle-mirrorable corpus synthesis.
    */
  def buildFile(fileId: Long, docs: Seq[(Long, String)]): WarcFile =
    WarcFile(fileId, concatBytes(recordChunks(fileId, docs)))

  /** The same file in Common Crawl's `.warc.gz` layout: one gzip member
    * PER RECORD, concatenated. ([[buildFileWholeGz]] covers the
    * whole-file-gzip layout; both parse identically.)
    */
  def buildFileGz(fileId: Long, docs: Seq[(Long, String)]): WarcFile =
    WarcFile(fileId, concatBytes(recordChunks(fileId, docs).map(gzipBytes)))

  /** The same file gzipped as ONE member (archived plain WARC). */
  def buildFileWholeGz(fileId: Long, docs: Seq[(Long, String)]): WarcFile =
    WarcFile(fileId, gzipBytes(concatBytes(recordChunks(fileId, docs))))
}
