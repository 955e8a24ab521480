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

  /** Parse every record in one WARC payload. Returns the records parsed
    * before the first structural error (truncated header, bad/missing
    * Content-Length, payload overrunning the file).
    */
  def parseFile(f: WarcFile): Seq[WarcRec] = {
    val b = f.data
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

  /** Synthesize a spec-shaped WARC file: one `warcinfo` record, then one
    * `response` record per (id, text) doc, in the given order. Used by
    * tests and the probe's oracle-mirrorable corpus synthesis.
    */
  def buildFile(fileId: Long, docs: Seq[(Long, String)]): WarcFile = {
    val sb = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = sb.write(s.getBytes(UTF_8))
    val info = s"software: graft-synth\nfile: $fileId\n"
    w("WARC/1.0\r\n")
    w("WARC-Type: warcinfo\r\n")
    w(s"Content-Length: ${info.getBytes(UTF_8).length}\r\n\r\n")
    w(info)
    w("\r\n\r\n")
    docs.foreach { case (id, text) =>
      val http = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + text
      val httpLen = http.getBytes(UTF_8).length
      w("WARC/1.0\r\n")
      w("WARC-Type: response\r\n")
      w(s"WARC-Target-URI: https://example.org/doc/$id\r\n")
      w(s"WARC-Record-ID: <urn:graft:$id>\r\n")
      w("Content-Type: application/http; msgtype=response\r\n")
      w(s"Content-Length: $httpLen\r\n\r\n")
      w(http)
      w("\r\n\r\n")
    }
    WarcFile(fileId, sb.toByteArray)
  }
}
