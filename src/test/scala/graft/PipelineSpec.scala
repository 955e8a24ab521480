package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.{Archive, Delive, Ls, Restore}
import graft.sources.Inventory

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def listing = Seq(
    ("OCG_KE1_NBO-Mon.zip", "u1", "2024-01-10T08:00:00Z"),
    ("OCG_KE1_NBO-Tue.zip", "u2", "2024-01-11T08:00:00Z"),
    ("OCA_TD1_ABC-Mon.zip", "u3", "2024-01-09T08:00:00Z"),
    ("notazip.txt", "u4", "2024-01-09T08:00:00Z"),          // ext filter
    ("OCP_FR1_PAR-Wed.zip", "u5", "2024-01-12T07:55:00Z"))  // in-flight guard

  test("Inventory parse: ext filter, late guard, instance key") {
    val inv = Inventory.fromListing(spark, listing, ts("2024-01-12 08:00:00"))
    val instances = inv.select("instance").as[String].collect().toSet
    assert(instances == Set("OCG_KE1_NBO", "OCA_TD1_ABC")) // PAR too fresh, txt dropped
  }

  test("Ls returns newest per instance with include/exclude wildcards") {
    val inv = Inventory.fromListing(spark, listing, ts("2024-01-13 08:00:00"))
    val all = Ls.run(inv).select("instance", "file").as[(String, String)].collect().toMap
    assert(all("OCG_KE1_NBO") == "OCG_KE1_NBO-Tue.zip") // newest wins
    assert(all.size == 3)
    val onlyOcg = Ls.run(inv, include = Seq("OCG"))
      .select("instance").as[String].collect().toSet
    assert(onlyOcg == Set("OCG_KE1_NBO"))
    val noKe = Ls.run(inv, exclude = Seq("KE1"))
      .select("instance").as[String].collect().toSet
    assert(!noKe.contains("OCG_KE1_NBO") && noKe.size == 2)
  }

  test("Delive rules sanitize passwords, crons, sync connection") {
    val tables = Map(
      "res_users" -> Seq((1L, "livemin", "secret1", true),
        (2L, "alice", "secret2", true), (3L, "synch", "secret3", true))
        .toDF("id", "login", "password", "active"),
      "ir_cron" -> Seq((1L, "backup.config", true), (2L, "other.model", true))
        .toDF("id", "model", "active"),
      "sync_client_sync_server_connection" ->
        Seq((true, "live-host", 1234, "LIVE_DB", "x", "y"))
          .toDF("automatic_patching", "host", "port", "database", "login", "protocol"))
    val cfg = Delive.Config(adminUser = "Admin", usersPw = Some("newpw"),
      adminPw = Some("adminpw"), inactiveUsers = true)
    val out = Delive(tables, Delive.rules(cfg))

    val users = out("res_users")
      .select("id", "login", "password", "active")
      .as[(Long, String, String, Boolean)].collect().sortBy(_._1)
    assert(users(0) == ((1L, "admin", "adminpw", true)))   // admin renamed, pw set
    assert(users(1) == ((2L, "alice", "newpw", false)))    // stomped + deactivated
    assert(users(2) == ((3L, "synch", "newpw", true)))     // synch stays active

    val crons = out("ir_cron").select("model", "active")
      .as[(String, Boolean)].collect().toMap
    assert(!crons("backup.config") && crons("other.model"))

    val sync = out("sync_client_sync_server_connection")
      .select("automatic_patching", "host", "port", "database",
        "ufload_automatic_patching_prod_value")
      .as[(Boolean, String, Int, String, Boolean)].head()
    assert(sync == ((false, "127.0.0.1", 8069, "SYNC_SERVER_LOCAL", true)))
  }

  test("Delive live=true is a no-op; missing tables/columns tolerated") {
    assert(Delive.rules(Delive.Config(live = true)).isEmpty)
    val only = Map("res_users" -> Seq((1L, "a")).toDF("id", "login"))
    val out = Delive(only, Delive.rules(Delive.Config(usersPw = Some("x"))))
    // no password column → rule skipped, frame unchanged
    assert(out("res_users").columns.toSeq == Seq("id", "login"))
  }

  test("hidegroups: truncates shortcuts, hides groups, deletes memberships cross-table") {
    val tables = Map(
      "ir_ui_view_sc" -> Seq((1L, "sc")).toDF("id", "name"),
      "res_groups" -> Seq((100L, "g_secret", true), (101L, "g_ok", true))
        .toDF("id", "name", "visible_res_groups"),
      "res_groups_users_rel" -> Seq((1L, 100L), (1L, 101L), (2L, 100L))
        .toDF("uid", "gid"))
    val out = Delive(tables,
      Delive.rules(Delive.Config(hideGroups = Seq("G_SECRET"), noPwReset = true)))
    assert(out("ir_ui_view_sc").count() == 0)
    val vis = out("res_groups").select("name", "visible_res_groups")
      .as[(String, Boolean)].collect().toMap
    assert(!vis("g_secret") && vis("g_ok"))
    val rels = out("res_groups_users_rel").as[(Long, Long)].collect().toSet
    assert(rels == Set((1L, 101L))) // memberships of the hidden group dropped
  }

  test("createUsers explodes spec into users and memberships") {
    val existing = Seq((10L, "old")).toDF("id", "login")
    val groups = Seq((100L, "g_admin"), (101L, "g_read")).toDF("id", "name")
    val (users, rels) = Delive.createUsers(spark,
      "Bob:pw1:g_admin,g_read;carol:pw2:g_read", existing, groups, "dflt")
    val u = users.select("id", "login", "password")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(u.toSeq == Seq((11L, "bob", "pw1"), (12L, "carol", "pw2")))
    val r = rels.as[(Long, Long)].collect().toSet
    assert(r == Set((11L, 100L), (11L, 101L), (12L, 101L)))
  }

  test("password template renders [pos+add] digits from db name") {
    // db.py:459-473: 'x[2+5]y' over 'abc…' → char 2 = 'b'(98) → 98-96+5 = 7
    assert(Delive.renderPasswordTemplate("x[2+5]y", "abc") == "x7y")
    assert(Delive.renderPasswordTemplate("plain", "abc") == "plain")
  }

  test("Restore publish is atomic; GC keeps newest per instance") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    Restore.publish(spark, df, wh, "OCG_KE1_NBO_20240110_0800")
    Restore.publish(spark, df, wh, "OCG_KE1_NBO_20240111_0800")
    Restore.publish(spark, df, wh, "OCA_TD1_ABC_20240109_0800")
    Restore.publish(spark, df, wh, "BADNAME")

    // republish over an existing name succeeds (old incarnation dropped)
    Restore.publish(spark, df.limit(1), wh, "OCG_KE1_NBO_20240111_0800")
    assert(spark.read.parquet(s"$wh/OCG_KE1_NBO_20240111_0800").count() == 1)

    val cat = Restore.catalog(spark, wh)
    assert(Restore.invalidDbs(cat).as[String].collect().toSeq == Seq("BADNAME"))

    val victims = Restore.gcVictims(cat.filter(col("db") =!= "BADNAME"))
      .select("db").as[String].collect().toSet
    assert(victims == Set("OCG_KE1_NBO_20240110_0800"))
    Restore.dropDbs(spark, wh, victims.toSeq)
    assert(Restore.catalog(spark, wh).count() == 3)
    assert(!Restore.needsReload(Some(42L), 42L))
    assert(Restore.needsReload(Some(41L), 42L))
    assert(Restore.needsReload(None, 42L))
    // column form (q114) agrees with the scalar on all three cases,
    // None represented as NULL
    val colGot = Seq((Some(42L), 42L), (Some(41L), 42L), (None, 42L))
      .toDF("stored", "remote")
      .select(Restore.needsReloadCol(col("stored"), col("remote")))
      .as[Boolean].collect().toSeq
    assert(colGot == Seq(false, true, true))
  }

  test("publish recovers a crash-window aside before deleting anything") {
    // simulate run 1 crashing between rename(target, aside) and
    // rename(staging, target): target ABSENT, aside holds the only copy
    val wh = Files.createTempDirectory("graft_wh_crash").toString
    val db = "OCG_KE1_NBO_20240110_0800"
    val old = Seq((1, "old")).toDF("id", "v")
    Restore.publish(spark, old, wh, db)
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(wh, db),
      new org.apache.hadoop.fs.Path(wh, s"${db}__old__staging")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(wh, db)))

    // run 2 publishes new data: must succeed, and at NO point was the old
    // copy deleted before the new one was in place
    Restore.publish(spark, Seq((2, "new")).toDF("id", "v"), wh, db)
    assert(spark.read.parquet(s"$wh/$db").as[(Int, String)].collect().toSeq ==
      Seq((2, "new")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(wh, s"${db}__old__staging")))
  }

  test("Delive skips rules whose WHERE names a column the backup lacks") {
    // psql-tolerance: an old schema without visible_res_groups/model must
    // skip those rules, not abort the sanitization with AnalysisException
    val oldGroups = Seq((1L, "g1")).toDF("id", "name") // no visible_res_groups
    val rels = Seq((10L, 1L)).toDF("uid", "gid")
    val out = Delive.apply(
      Map("res_groups" -> oldGroups, "res_groups_users_rel" -> rels),
      Seq(
        Delive.DeleteWhere("res_groups_users_rel",
          "gid IN (SELECT id FROM res_groups WHERE visible_res_groups = false)"),
        Delive.SetCols("res_groups", Map("name" -> "'x'"),
          Some("no_such_column = true")),
        Delive.DeleteWhere("res_groups", "another_missing_col = 1")))
    assert(out("res_groups_users_rel").count() == 1) // delete skipped
    assert(out("res_groups").as[(Long, String)].collect().toSeq ==
      Seq((1L, "g1"))) // set + delete skipped, nothing thrown
  }

  test("validZips filters corrupt archives instead of failing the job") {
    val okZip = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      z.putNextEntry(new java.util.zip.ZipEntry("only.dump"))
      z.write("data".getBytes("UTF-8")); z.closeEntry(); z.close()
      bos.toByteArray
    }
    val truncated = okZip.take(okZip.length / 2) // mid-archive truncation
    val garbage = "not a zip at all".getBytes("UTF-8")
    val df = Seq(("ok.zip", okZip), ("trunc.zip", truncated),
      ("junk.zip", garbage)).toDF("path", "content")
    val got = graft.sources.Payloads.validZips(df)
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("ok.zip", "only.dump")))
  }

  test("Archive merge is idempotent insert-if-absent on (instance, remote_id)") {
    val local = Seq(
      Archive.OperationsEvent("i1", "k", ts("2024-01-01 00:00:00"), 1, "d1"))
      .toDS()
    val remote = Seq(
      Archive.OperationsEvent("i1", "k", ts("2024-01-01 00:00:00"), 1, "dup"),
      Archive.OperationsEvent("i1", "k", ts("2024-01-02 00:00:00"), 2, "d2"),
      Archive.OperationsEvent("i2", "k", ts("2024-01-03 00:00:00"), 1, "d3"))
      .toDS()
    val merged = Archive.mergeEventsTyped(local, remote).collect()
    assert(merged.length == 3)
    assert(merged.find(e => e.instance == "i1" && e.remote_id == 1).get.data == "d1")
    // re-run: no growth
    val again = Archive.mergeEvents(merged.toSeq.toDS().toDF(), remote.toDF())
    assert(again.count() == 3)
  }

  test("parseDsn splits whitespace key=value tokens") {
    assert(Archive.parseDsn("hostaddr=1.2.3.4 dbname=db user=u") ==
      Map("hostaddr" -> "1.2.3.4", "dbname" -> "db", "user" -> "u"))
  }

  test("Apply.patchInserts: checksum-idempotent b64 ledger rows (db.py:863-896)") {
    val patches = Seq(
      ("2.1", "sumA", "zipbytesA".getBytes("UTF-8")),
      ("2.2", "sumB", "zipbytesB".getBytes("UTF-8")))
      .toDF("version", "sum", "content")
    val installed = Seq("sumA").toDF("sum") // 2.1 already in the ledger
    val rows = graft.pipeline.Apply.patchInserts(patches, installed).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("name") == "2.2")
    assert(r.getAs[String]("state") == "confirmed")
    assert(r.getAs[String]("importance") == "required")
    assert(r.getAs[String]("comment") == "Version 2.2 installed by ufload")
    assert(r.getAs[String]("patch") ==
      java.util.Base64.getEncoder.encodeToString("zipbytesB".getBytes("UTF-8")))
  }
}
