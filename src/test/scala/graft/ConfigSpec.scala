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

  test("splitCloudName: first-colon split, bare name gets default host") {
    assert(Config.splitCloudName("files.example.org:OCA_KE1") ==
      (("files.example.org", "OCA_KE1")))
    // only the FIRST colon splits — the rest stays in the name
    assert(Config.splitCloudName("h:a:b") == (("h", "a:b")))
    assert(Config.splitCloudName("OCA_KE1") ==
      ((Config.DefaultCloudHost, "OCA_KE1")))
  }

  test("decryptPassword: 4-char prefix stripped, b64 decoded, lenient") {
    val enc = "xyz!" + java.util.Base64.getEncoder.encodeToString(
      "s3cret".getBytes("UTF-8"))
    assert(Config.decryptPassword(enc).contains("s3cret"))
    assert(Config.decryptPassword("  " + enc + " \n").contains("s3cret"),
      "reference strips whitespace before the prefix drop")
    // non-b64 remainder → None (reference logs + returns None, never throws)
    assert(Config.decryptPassword("xyz!@@not-base64@@=").isEmpty)
    // short strings: drop(4) of "ab" is "", decodes to empty password
    assert(Config.decryptPassword("ab").contains(""))
  }

  test("instanceToDir: suffix/prefix dispatch, first match wins") {
    assert(Config.instanceToDir("KE1_OCA") == "/personal/UF_OCA_msf_geneva_msf_org/")
    assert(Config.instanceToDir("OCB_NE1") == "/personal/UF_OCB_msf_geneva_msf_org/")
    assert(Config.instanceToDir("OCP_X") == "/personal/UF_OCP_msf_geneva_msf_org/")
    assert(Config.instanceToDir("OCG_HQ") == "/personal/UF_OCG_msf_geneva_msf_org/")
    // OCG without the underscore matches nothing (reference checks 'OCG_')
    assert(Config.instanceToDir("OCGX") == "")
    assert(Config.instanceToDir("other") == "")
  }

  test("cloudInfo: OC-derived dir + sub path, decrypted password") {
    val enc = "pfx:" + java.util.Base64.getEncoder.encodeToString(
      "pw".getBytes("UTF-8"))
    val info = Config.cloudInfo(pw = enc, oc = Some("oca"),
      cloudPath = "UF_Backups/", cloudUrl = "https://c.example.org/dav",
      user = "bob", subDir = "patches/")
    assert(info.dir == "/personal/UF_OCA_msf_geneva_msf_org/UF_Backups/patches/")
    assert(info.site == "/personal/UF_OCA_msf_geneva_msf_org/")
    assert(info.password.contains("pw"))
    val noOc = Config.cloudInfo(enc, None, "p/", "u", "bob")
    assert(noOc.dir == "p/" && noOc.site == "")
  }
}
