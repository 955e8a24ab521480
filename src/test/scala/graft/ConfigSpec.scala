package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Config

class ConfigSpec extends AnyFunSuite {

  private val ini =
    """# comment
      |[onedrive]
      |user=alice
      |pw=secret with spaces
      |
      |[restore]
      |adminpw=rpw
      |; another comment
      |[postgres]
      |db_user=openpg
      |""".stripMargin

  test("parseIni handles sections, comments, values with spaces") {
    val got = Config.parseIni(ini)
    assert(got("onedrive") == Map("user" -> "alice", "pw" -> "secret with spaces"))
    assert(got("restore") == Map("adminpw" -> "rpw"))
    assert(got("postgres") == Map("db_user" -> "openpg"))
  }

  test("resolve: later sections override earlier; CLI overrides file") {
    val merged = Config.resolve(
      Seq(Map("a" -> "1", "b" -> "file"), Map("b" -> "file2", "c" -> "3")),
      cli = Map("c" -> "cli"))
    assert(merged == Map("a" -> "1", "b" -> "file2", "c" -> "cli"))
  }

  test("sectionsFor mirrors the reference's subcommand mapping") {
    assert(Config.sectionsFor("restore").last == "restore")
    assert(Config.sectionsFor("clean") ==
      Seq("onedrive", "postgres", "logs", "sync"))
  }

  test("ocDirectory lookup is case-insensitive, unknown → None") {
    assert(Config.ocDirectory("OCG").contains("OCG_Backups"))
    assert(Config.ocDirectory("nope").isEmpty)
  }
}
