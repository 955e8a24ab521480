package graft.sources

/** Resilient transfer primitives — the pure logic of the reference's
  * download/upload connectors with ALL IO injected, so the retry/chunk/range
  * semantics are library surface (testable, reusable against any transport)
  * while sockets stay a deployment concern:
  *
  *  - [[retrying]]   — chunked-GET retry protocol (webdav.py:105-135):
  *    bounded attempts, a between-attempt hook (the reference sleeps 3 s and
  *    re-logins), last failure rethrown.
  *  - [[RangeStream]] — HTTP-range random access (httpfile.py:26-50): a
  *    seekable byte stream over a `(offset, length) => bytes` fetch, with the
  *    reference's short-read check.
  *  - [[uploadPlan]] — 10 MiB multipart upload sequencing (webdav.py:137-192):
  *    the create/single-shot/start/continue/finish request sequence for a
  *    given payload length.
  */
object Connectors {

  /** Run `f`, retrying up to `attempts` times total. Between attempts the
    * `between(attemptIndex, error)` hook runs (reference: sleep(3) + fresh
    * login, webdav.py:126-128); the final failure propagates unchanged.
    */
  def retrying[T](attempts: Int = 5,
                  between: (Int, Throwable) => Unit = (_, _) => ())(f: => T): T = {
    require(attempts >= 1, "attempts must be >= 1")
    var attempt = 0
    while (true) {
      try return f
      catch {
        case scala.util.control.NonFatal(e) =>
          attempt += 1
          if (attempt >= attempts) throw e
          between(attempt, e)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Seekable read-only stream over a ranged fetch — the shape a remote-zip
    * central-directory reader needs (httpfile.py: seek to EOF, read the
    * directory, seek to one member). `fetch(offset, count)` returns exactly
    * the requested range; a short read is an error (httpfile.py:35-36), not
    * silently tolerated — a truncated range would corrupt the zip parse.
    */
  final class RangeStream(val size: Long, fetch: (Long, Long) => Array[Byte]) {
    private var offset = 0L

    def tell: Long = offset

    /** whence: 0 = absolute, 1 = relative, 2 = from end (httpfile.py:41-49). */
    def seek(off: Long, whence: Int = 0): Unit = whence match {
      case 0 => offset = off
      case 1 => offset += off
      case 2 => offset = size + off
      case w => throw new IllegalArgumentException(s"invalid whence $w")
    }

    /** Read `count` bytes (all remaining when negative) from the current
      * offset, advancing it.
      */
    def read(count: Long = -1L): Array[Byte] = {
      val n = if (count < 0) size - offset else count
      val got = fetch(offset, n)
      if (got.length < n)
        throw new java.io.IOException(s"wanted $n bytes, got ${got.length} bytes")
      offset += n
      got.take(n.toInt)
    }
  }

  /** One request of a multipart upload. `kind` ∈ create | single | start |
    * continue | finish, mirroring the reference's SharePoint-style verbs;
    * (offset, length) is the payload slice the request carries.
    */
  case class UploadPart(kind: String, offset: Long, length: Long)

  val DefaultBufferSize: Long = 10L * 1024 * 1024 // webdav.py:153

  /** The multipart request sequence for a payload of `totalLen` bytes
    * (webdav.py:154-192):
    *  - an initial zero-byte `create` (the reference's offset=-1 add())
    *  - then a single-shot `single` when the payload fits one buffer,
    *  - else `start` (first chunk) → `continue`* → `finish` (last chunk).
    *
    * Divergence from the reference (recorded in DIVERGENCES.md): when
    * `totalLen` is an exact buffer multiple the reference's loop exits on
    * the empty read WITHOUT ever issuing finishupload (webdav.py:166-168,
    * 190-191), leaving the server-side upload session open. Here the last
    * full chunk is emitted as `finish` — the sequence always terminates.
    */
  /** The webdav delete verb (webdav.py:63-75): SharePoint tunnels DELETE
    * through a POST against `getfilebyserverrelativeurl` with an
    * `X-HTTP-Method: DELETE` override header. [[deleteRequest]] builds that
    * request for a (baseUrl, path, remotePath) triple — `webUri` is the
    * plain concatenation `path + remotePath`, exactly the reference's
    * `'%s%s'`.
    */
  case class DeleteRequest(url: String, method: String,
                           headers: Map[String, String])

  def deleteRequest(baseUrl: String, path: String,
                    remotePath: String): DeleteRequest = {
    val webUri = s"$path$remotePath"
    DeleteRequest(
      url = s"$baseUrl/_api/web/getfilebyserverrelativeurl('$webUri')",
      method = "POST",
      headers = Map("X-HTTP-Method" -> "DELETE"))
  }

  /** Execute a delete via an injected transport. Success is status 200/201
    * (webdav.py:73-74); anything else raises with the response body, like
    * the reference's `raise Exception(result.content)`.
    */
  def delete(baseUrl: String, path: String, remotePath: String,
             post: DeleteRequest => (Int, String)): Boolean = {
    val (status, body) = post(deleteRequest(baseUrl, path, remotePath))
    if (status != 200 && status != 201)
      throw new java.io.IOException(s"delete failed: $body")
    true
  }

  def uploadPlan(totalLen: Long,
                 bufferSize: Long = DefaultBufferSize): Seq[UploadPart] = {
    require(totalLen >= 0 && bufferSize > 0)
    val create = UploadPart("create", 0L, 0L)
    if (totalLen <= bufferSize)
      return Seq(create, UploadPart("single", 0L, totalLen))
    val chunks = Iterator.iterate(0L)(_ + bufferSize)
      .takeWhile(_ < totalLen)
      .map(off => (off, math.min(bufferSize, totalLen - off))).toSeq
    val parts = chunks.zipWithIndex.map { case ((off, len), i) =>
      val kind =
        if (i == 0) "start"
        else if (i == chunks.size - 1) "finish"
        else "continue"
      UploadPart(kind, off, len)
    }
    create +: parts
  }
}
