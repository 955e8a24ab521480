package graft.pipeline

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Config precedence (main.py:868-886): an INI file at `$HOME/.ufload`
  * provides per-section defaults; command-line values override file values;
  * sections map to subcommands plus the shared `onedrive/postgres/logs/sync`
  * groups. Re-expressed as a pure merge over string maps — the Spark app's
  * config object is built once on the driver.
  */
object Config {

  /** Minimal INI parse: `[section]` headers, `key=value` lines, `#`/`;`
    * comments, whitespace-tolerant. (The reference uses SafeConfigParser;
    * only this subset appears in its sample config.)
    */
  def parseIni(text: String): Map[String, Map[String, String]] = {
    val out = scala.collection.mutable.Map.empty[String, Map[String, String]]
    var section = ""
    text.linesIterator.map(_.trim).foreach {
      case l if l.isEmpty || l.startsWith("#") || l.startsWith(";") =>
      case l if l.startsWith("[") && l.endsWith("]") =>
        section = l.substring(1, l.length - 1).trim
        out.getOrElseUpdate(section, Map.empty)
      case l if l.contains("=") =>
        val Array(k, v) = l.split("=", 2)
        out(section) = out.getOrElse(section, Map.empty) +
          (k.trim -> v.trim)
      case _ =>
    }
    out.toMap
  }

  def parseIniFile(path: Path): Map[String, Map[String, String]] =
    if (!Files.exists(path)) Map.empty
    else parseIni(Files.readAllLines(path).asScala.mkString("\n"))

  /** File sections (in order) merged as defaults, CLI wins (the
    * set_defaults-then-parse_args precedence).
    */
  def resolve(fileSections: Seq[Map[String, String]],
              cli: Map[String, String]): Map[String, String] =
    fileSections.foldLeft(Map.empty[String, String])(_ ++ _) ++ cli

  /** The sections a subcommand reads, mirroring main.py:874-883. */
  def sectionsFor(subcommand: String): Seq[String] =
    Seq("onedrive", "postgres", "logs", "sync") ++
      (if (Seq("ls", "restore", "archive", "upgrade").contains(subcommand))
        Seq(subcommand) else Nil)

  /** OC abbreviation → backup directory (main.py:41-53, cloud.py:34-48):
    * the lookup table behind OP-47 (q18 exercises the Column form).
    */
  val OcDirectories: Map[String, String] = Map(
    "oca" -> "OCA_Backups", "ocb" -> "OCB_Backups", "ocg" -> "OCG_Backups",
    "ocp" -> "OCP_Backups")

  def ocDirectory(oc: String): Option[String] = OcDirectories.get(oc.toLowerCase)

  /** Cloud `host:name` split (cloud.py:15-20): one split on the FIRST colon;
    * a bare name falls back to the default cloud hostname.
    */
  val DefaultCloudHost = "cloud.msf.org"
  def splitCloudName(x: String): (String, String) = x.split(":", 2) match {
    case Array(host, name) => (host, name)
    case _                 => (DefaultCloudHost, x)
  }

  /** Cloud password deobfuscation (cloud.py:22-31): strip whitespace, drop
    * the first four characters, base64-decode the rest. The reference's
    * failure mode is lenient — it logs and returns None — so this returns
    * `None` on any decode failure rather than throwing (DIVERGENCES.md:
    * python2's b64decode silently discards non-alphabet characters; the MIME
    * decoder here does the same, but both reject bad padding).
    */
  def decryptPassword(pwd: String): Option[String] = {
    val x = pwd.trim.drop(4)
    try Some(new String(java.util.Base64.getMimeDecoder.decode(x),
      java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: IllegalArgumentException => None }
  }

  /** The one rendering of the cloud personal-directory template. */
  private def personalDir(oc: String): String =
    s"/personal/UF_${oc.toUpperCase}_msf_geneva_msf_org/"

  /** Instance name → cloud personal directory (cloud.py:34-48): suffix/prefix
    * dispatch, first match wins, empty string when nothing matches.
    */
  def instanceToDir(instance: String): String =
    if (instance.endsWith("_OCA")) personalDir("OCA")
    else if (instance.startsWith("OCB")) personalDir("OCB")
    else if (instance.startsWith("OCP")) personalDir("OCP")
    else if (instance.startsWith("OCG_")) personalDir("OCG")
    else ""

  /** Resolved cloud connection record (cloud.py:51-79): decrypted password,
    * OC-derived personal dir + sub path, the verbatim url/login fields.
    */
  final case class CloudInfo(url: String, dir: String, site: String,
                             path: String, login: String,
                             password: Option[String])

  def cloudInfo(pw: String, oc: Option[String], cloudPath: String,
                cloudUrl: String, user: String,
                subDir: String = ""): CloudInfo = {
    // an unknown OC code yields a fabricated dir here while instanceToDir
    // returns "" — faithful: the reference builds from args.oc
    // unconditionally (cloud.py:57) but dispatches instance names through
    // the fixed list (cloud.py:34-48); the two derivations genuinely differ
    val dir = oc.fold("")(personalDir)
    CloudInfo(url = cloudUrl, dir = dir + cloudPath + subDir, site = dir,
      path = cloudPath, login = user, password = decryptPassword(pw))
  }
}
