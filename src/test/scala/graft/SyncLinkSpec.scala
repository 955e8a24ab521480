package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Delive, SyncLink}

/** Sync-server-side rule vectors (db.py:713-719, main.py:449-478). */
class SyncLinkSpec extends SparkSpec {
  import spark.implicits._

  private def users = Seq(
    (1L, "admin", "oldpw"),
    (7L, "sandboxsync", "oldpw"),
    (9L, "other", "oldpw"))
    .toDF("id", "login", "password")

  private def entities = Seq(
    ("OCG_KE1_NBO", 3L, "none"),
    ("OCA_TD1_ABC", 4L, "none"),
    ("OCP_FR1_PAR", 5L, "old-hw"))
    .toDF("name", "user_id", "hardware_id")

  private def sequences = Seq(
    ("sync.server.update", 100L),
    ("other.seq", 50L))
    .toDF("code", "number_next")

  private def tables = Map(
    "sync_server_entity" -> entities,
    "res_users" -> users,
    "ir_sequence" -> sequences)

  test("allAdminRules: every entity syncs as user 1 (db.py:714)") {
    val out = Delive(tables, SyncLink.allAdminRules)
    val ids = out("sync_server_entity").select("user_id").as[Long].collect()
    assert(ids.toSet == Set(1L))
  }

  test("sandbox sync user: scalar subquery resolves login to id; pw reset " +
       "only with a password (db.py:716-719)") {
    val out = Delive(tables,
      SyncLink.sandboxSyncUserRules("sandboxsync", Some("npw")))
    assert(out("sync_server_entity").select("user_id").as[Long]
      .collect().toSet == Set(7L))
    val pws = out("res_users").select("login", "password")
      .as[(String, String)].collect().toMap
    assert(pws("sandboxsync") == "npw" && pws("admin") == "oldpw")

    // no password supplied → res_users untouched (db.py:718 guard)
    val noPw = Delive(tables, SyncLink.sandboxSyncUserRules("sandboxsync"))
    assert(noPw("res_users").select("password").as[String]
      .collect().toSet == Set("oldpw"))
  }

  test("scalar subquery: zero matches assigns NULL, two matches errors " +
       "(Postgres parity)") {
    val out = Delive(tables, SyncLink.sandboxSyncUserRules("nouser"))
    assert(out("sync_server_entity").filter(col("user_id").isNull).count() == 3)

    val dup = tables + ("res_users" ->
      users.union(Seq((8L, "sandboxsync", "x")).toDF()))
    val ex = intercept[IllegalStateException] {
      Delive(dup, SyncLink.sandboxSyncUserRules("sandboxsync"))
    }
    assert(ex.getMessage.contains("more than one row"))
  }

  test("syncLink targeted: only restored instances re-linked; sequence " +
       "gap +1000 (main.py:456,464-471)") {
    val out = Delive(tables, SyncLink.syncLinkRules(
      connectionUser = "sandboxsync", connectionPw = None,
      hwid = Some("HW42"),
      dbs = Seq("OCG_KE1_NBO_20240110_0800", "OCA_TD1_ABC_20240109_0800"),
      targeted = true))
    val hw = out("sync_server_entity").select("name", "hardware_id")
      .as[(String, String)].collect().toMap
    assert(hw("OCG_KE1_NBO") == "HW42" && hw("OCA_TD1_ABC") == "HW42")
    assert(hw("OCP_FR1_PAR") == "old-hw") // other server's entity untouched
    val seqs = out("ir_sequence").select("code", "number_next")
      .as[(String, Long)].collect().toMap
    assert(seqs("sync.server.update") == 1100L && seqs("other.seq") == 50L)
  }

  test("syncLink untargeted claims every entity; no hwid writes nothing " +
       "(main.py:460-462,475)") {
    val all = Delive(tables, SyncLink.syncLinkRules(
      "sandboxsync", None, Some("HW9"), dbs = Nil, targeted = false))
    assert(all("sync_server_entity").select("hardware_id").as[String]
      .collect().toSet == Set("HW9"))

    val none = Delive(tables, SyncLink.syncLinkRules(
      "sandboxsync", None, hwid = None, dbs = Nil, targeted = false))
    assert(none("sync_server_entity").select("hardware_id").as[String]
      .collect().toSet == Set("none", "old-hw"))
  }

  test("prefixed db names strip the prefix before entity lookup " +
       "(db.py:623-634 via main.py:467)") {
    val out = Delive(tables, SyncLink.syncLinkRules(
      "sandboxsync", None, Some("HWP"),
      dbs = Seq("pfx_OCG_KE1_NBO_20240110_0800"), targeted = true,
      dbPrefix = Some("pfx")))
    val hw = out("sync_server_entity").select("name", "hardware_id")
      .as[(String, String)].collect().toMap
    assert(hw("OCG_KE1_NBO") == "HWP" && hw("OCA_TD1_ABC") == "none")
  }

  test("missing res_users table: scalar rule skipped, entities unchanged " +
       "(psql tolerance)") {
    val out = Delive(tables - "res_users",
      SyncLink.sandboxSyncUserRules("sandboxsync", Some("npw")))
    assert(out("sync_server_entity").select("user_id").as[Long]
      .collect().toSet == Set(3L, 4L, 5L))
  }
}
