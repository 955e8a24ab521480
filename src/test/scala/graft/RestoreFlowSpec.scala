package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.Naming
import graft.pipeline.{Delive, Restore}
import graft.sources.Inventory

/** End-to-end trace of the reference's main path (SURVEY.md §3.1
  * `ufload restore`): cloud listing → parse/guard → wildcard filter →
  * auto-upload gate → newest-first candidates → name derivation →
  * skip-if-exists → staged publish → de-live → sibling GC. Every stage is
  * the library operator, composed the way a production driver would.
  */
class RestoreFlowSpec extends SparkSpec {
  import spark.implicits._

  test("full restore flow: listing to sanitized published tables with GC") {
    val wh = Files.createTempDirectory("graft_restore_wh").toString

    // 1. cloud listing (OP-1/2): auto-upload day-rotation names
    //    `INSTANCE-Day.zip`; two instances; one junk file
    val inv = Inventory.fromListing(spark, Seq(
      ("OCG_KE1_NBO-Mon.zip", "u1", "2024-01-10T08:00:00Z"),
      ("OCG_KE1_NBO-Tue.zip", "u2", "2024-01-11T09:00:00Z"),
      ("OCA_TD1_ABC-Sun.zip", "u3", "2024-01-09T07:00:00Z"),
      ("OCA_TD1_ABC-badname.txt", "u4", "2024-01-09T07:00:00Z")),
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))

    // 2. include filter + auto-upload gate (OP-12/15)
    val gated = Inventory.autoUploadGate(
      Inventory.filterInstances(inv, include = Seq("OCG,OCA"), exclude = Nil))

    // 3. newest-first candidates (OP-30 ordering); take rank 1 per instance
    val candidates = Inventory.rankedCandidates(gated)
      .filter(col("rank") === 1)
      .select("instance", "file").as[(String, String)].collect().toMap
    assert(candidates == Map(
      "OCG_KE1_NBO" -> "OCG_KE1_NBO-Tue.zip",
      "OCA_TD1_ABC" -> "OCA_TD1_ABC-Sun.zip"))

    // 4. per candidate: the zip's INNER dump name (OP-4 peek) feeds
    //    _file_to_db (main.py:317-318, db from str(n) not the zip name);
    //    restore = staged publish of the "dump" (a users table stands in)
    val innerDump = Map(
      "OCG_KE1_NBO-Tue.zip" -> "OCG_KE1_NBO-20240111-090000-A-UF2.1.dump",
      "OCA_TD1_ABC-Sun.zip" -> "OCA_TD1_ABC-20240109-070000-A-UF2.1.dump")
    val usersRaw = Seq((1L, "livemin", "livepw", true), (2L, "alice", "pw2", true))
      .toDF("id", "login", "password", "active")
    val published = candidates.map { case (_, file) =>
      val db = Naming.fileToDb(innerDump(file))
      // 5. de-live before publish (OP-17..20, db.py:349-537)
      val clean = Delive(Map("res_users" -> usersRaw),
        Delive.rules(Delive.Config(adminUser = "admin",
          usersPw = Some("stomped"), adminPw = Some("adm"))))
      Restore.publish(spark, clean("res_users"), wh, db)
      db
    }.toSeq
    assert(published.sorted == Seq(
      "OCA_TD1_ABC_20240109_0700", "OCG_KE1_NBO_20240111_0900"))

    // 6. published data is sanitized
    val pw = spark.read.parquet(s"$wh/OCG_KE1_NBO_20240111_0900")
      .select("login", "password").as[(String, String)].collect().toMap
    assert(pw("admin") == "adm" && pw("alice") == "stomped")

    // 7. a later restore of the same instance + GC drops the older sibling
    Restore.publish(spark, usersRaw, wh, "OCG_KE1_NBO_20240112_0900")
    val victims = Restore.gcVictims(Restore.catalog(spark, wh))
      .select("db").as[String].collect().toSet
    assert(victims == Set("OCG_KE1_NBO_20240111_0900"))
    Restore.dropDbs(spark, wh, victims.toSeq)

    // 8. skip-if-exists (OP-6): the surviving dbs are findable
    val cat = Restore.catalog(spark, wh).as[String].collect().toSet
    assert(cat == Set("OCA_TD1_ABC_20240109_0700", "OCG_KE1_NBO_20240112_0900"))
  }
}
