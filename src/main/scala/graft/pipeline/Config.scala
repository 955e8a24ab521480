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
}
