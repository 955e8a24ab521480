package graft.pipeline

/** Remote log collector (main.py:899-904): progress lines are buffered for
  * the whole run and POSTed once at exit to `<remote>?who=<hostname>` with
  * the newline-joined log as the body. The HTTP POST is injected — the
  * buffering, URL shape, and payload rendering are the library part.
  */
final class Logs(post: (String, String) => Unit = (_, _) => ()) {
  private val buf = scala.collection.mutable.ListBuffer[String]()

  /** Record one progress line (ufload.progress analog). */
  def progress(line: String): Unit = synchronized { buf += line }

  def lines: Seq[String] = synchronized(buf.toList)

  /** Flush to the collector: POST body = '\n'.join(lines) to
    * `remote?who=hostname` (main.py:903-904). No-op when `remote` is None —
    * the reference only posts when `--remote` is set.
    */
  def flush(remote: Option[String],
            hostname: String = Logs.hostname): Unit = remote.foreach { r =>
    post(s"$r?who=$hostname", lines.mkString("\n"))
  }
}

object Logs {
  /** `socket.gethostname() or 'unknown'` (main.py:901). */
  def hostname: String =
    try {
      val h = java.net.InetAddress.getLocalHost.getHostName
      if (h == null || h.isEmpty) "unknown" else h
    } catch { case scala.util.control.NonFatal(_) => "unknown" }
}
