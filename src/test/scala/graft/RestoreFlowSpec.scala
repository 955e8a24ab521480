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

  test("Restore.run: first-success fallback, exists-skip, notify, GC") {
    val wh = Files.createTempDirectory("graft_run_wh").toString

    // OCG has two candidates (newest will be CORRUPT → fallback to older);
    // OCA has one good candidate; OCX is excluded by pattern.
    val inv = Inventory.fromListing(spark, Seq(
      ("OCG_KE1_NBO-Tue.zip", "u-corrupt", "2024-01-11T09:00:00Z"),
      ("OCG_KE1_NBO-Mon.zip", "u-good-g", "2024-01-10T08:00:00Z"),
      ("OCA_TD1_ABC-Sun.zip", "u-good-a", "2024-01-09T07:00:00Z"),
      ("OCX_ZZ9_XXX-Fri.zip", "u-other", "2024-01-08T06:00:00Z")),
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))

    val innerDump = Map(
      "OCG_KE1_NBO-Mon.zip" -> "OCG_KE1_NBO-20240110-080000-A-UF2.1.dump",
      "OCA_TD1_ABC-Sun.zip" -> "OCA_TD1_ABC-20240109-070000-A-UF2.1.dump")
    val dump = Seq((1L, "admin")).toDF("id", "login")
    // the connector: newest OCG file is a bad payload (no dump inside)
    val fetch: (String, String) => Option[(String, org.apache.spark.sql.DataFrame)] =
      (url, file) =>
        if (url == "u-corrupt") None
        else innerDump.get(file).map(n => (n, dump))

    val notified = scala.collection.mutable.ListBuffer[String]()
    val attempts = Restore.run(spark, inv, wh, fetch,
      include = Seq("OCG,OCA"), onRestored = db => notified += db)

    // corrupt newest fell through; second-newest restored (main.py:309-313)
    assert(attempts.map(a => (a.file, a.status)).toSet == Set(
      ("OCG_KE1_NBO-Tue.zip", "invalid"),
      ("OCG_KE1_NBO-Mon.zip", "restored"),
      ("OCA_TD1_ABC-Sun.zip", "restored")))
    assert(notified.toSet ==
      Set("OCG_KE1_NBO_20240110_0800", "OCA_TD1_ABC_20240109_0700"))
    assert(Restore.catalog(spark, wh).as[String].collect().toSet ==
      Set("OCG_KE1_NBO_20240110_0800", "OCA_TD1_ABC_20240109_0700"))

    // re-run: both dbs exist → exists-skip breaks each instance (the
    // corrupt newest is still probed first — reference order is preserved)
    val again = Restore.run(spark, inv, wh, fetch,
      include = Seq("OCG,OCA"))
    assert(again.map(a => (a.file, a.status)).toSet == Set(
      ("OCG_KE1_NBO-Tue.zip", "invalid"),
      ("OCG_KE1_NBO-Mon.zip", "exists"),
      ("OCA_TD1_ABC-Sun.zip", "exists")))

    // GC is per-RESTORED-instance (db.py:660-677): an exists-skip run must
    // NOT clean (the reference cleans only after a successful load), and a
    // fresh restore drops only the restored instance's siblings
    Restore.publish(spark, dump, wh, "OCG_KE1_NBO_20240101_0000") // older sibling
    Restore.publish(spark, dump, wh, "OCZ_UN1_XXX_20200101_0000") // uninvolved
    val existsRun = Restore.run(spark, inv, wh, fetch, include = Seq("OCG,OCA"))
    assert(!existsRun.exists(_.status == "restored"))
    assert(Restore.catalog(spark, wh).as[String].collect().toSet == Set(
      "OCG_KE1_NBO_20240110_0800", "OCA_TD1_ABC_20240109_0700",
      "OCG_KE1_NBO_20240101_0000", "OCZ_UN1_XXX_20200101_0000"))

    Restore.dropDbs(spark, wh, Seq("OCG_KE1_NBO_20240110_0800"))
    Restore.run(spark, inv, wh, fetch, include = Seq("OCG,OCA"))
    // OCG restored again → its older sibling GC'd; the uninvolved OCZ db
    // and the exists-skipped OCA db survive
    assert(Restore.catalog(spark, wh).as[String].collect().toSet == Set(
      "OCG_KE1_NBO_20240110_0800", "OCA_TD1_ABC_20240109_0700",
      "OCZ_UN1_XXX_20200101_0000"))
  }

  test("Restore.run show mode: dry-run reports actions, zero side effects") {
    val wh = Files.createTempDirectory("graft_show_wh").toString
    val inv = Inventory.fromListing(spark, Seq(
      ("OCG_KE1_NBO-Tue.zip", "u-corrupt", "2024-01-11T09:00:00Z"),
      ("OCG_KE1_NBO-Mon.zip", "u-good-g", "2024-01-10T08:00:00Z"),
      ("OCA_TD1_ABC-Sun.zip", "u-good-a", "2024-01-09T07:00:00Z")),
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    val innerDump = Map(
      "OCG_KE1_NBO-Mon.zip" -> "OCG_KE1_NBO-20240110-080000-A-UF2.1.dump",
      "OCA_TD1_ABC-Sun.zip" -> "OCA_TD1_ABC-20240109-070000-A-UF2.1.dump")
    val dump = Seq((1L, "admin")).toDF("id", "login")
    val fetch: (String, String) => Option[(String, org.apache.spark.sql.DataFrame)] =
      (url, file) =>
        if (url == "u-corrupt") None
        else innerDump.get(file).map(n => (n, dump))

    // an older sibling that a REAL run's GC would drop after restoring OCG
    Restore.publish(spark, dump, wh, "OCG_KE1_NBO_20240101_0000")
    val before = Restore.catalog(spark, wh).as[String].collect().toSet

    val notified = scala.collection.mutable.ListBuffer[String]()
    val actions = scala.collection.mutable.ListBuffer[Restore.Action]()
    val attempts = Restore.run(spark, inv, wh, fetch,
      include = Seq("OCG,OCA"), onRestored = db => notified += db,
      show = true, onAction = actions += _)

    // control flow identical to a real run: corrupt newest falls through,
    // the would-be publish completes the instance
    assert(attempts.map(a => (a.file, a.status)).toSet == Set(
      ("OCG_KE1_NBO-Tue.zip", "invalid"),
      ("OCG_KE1_NBO-Mon.zip", "restored"),
      ("OCA_TD1_ABC-Sun.zip", "restored")))
    // the action list names every suppressed mutation, publishes carry a plan
    assert(actions.map(a => (a.op, a.target)).toSet == Set(
      ("publish", "OCG_KE1_NBO_20240110_0800"),
      ("notify", "OCG_KE1_NBO_20240110_0800"),
      ("publish", "OCA_TD1_ABC_20240109_0700"),
      ("notify", "OCA_TD1_ABC_20240109_0700"),
      ("drop", "OCG_KE1_NBO_20240101_0000")))
    assert(actions.filter(_.op == "publish").forall(_.plan.contains("Physical Plan")))
    // ZERO side effects: no hook fired, warehouse byte-identical
    assert(notified.isEmpty)
    assert(Restore.catalog(spark, wh).as[String].collect().toSet == before)
  }

  test("Upgrade.run show mode: ledger insert suppressed, RPC still live") {
    import graft.pipeline.{Restore, Upgrade}
    val installed = scala.collection.mutable.ListBuffer[String]()
    val connected = scala.collection.mutable.ListBuffer[String]()
    val actions = scala.collection.mutable.ListBuffer[Restore.Action]()
    val report = Upgrade.run(
      plan = Seq(("uf1.patch.zip", "s1"), ("uf2.patch.zip", "s2")),
      download = _ => Array[Byte](1),
      installPatch = (v, _) => { installed += v; true },
      instances = Seq("I1"),
      connect = i => { connected += i; Right(()) },
      manualSync = _ => Right(()),
      manualUpgrade = () => fail("no update available; must not upgrade"),
      ping = () => true,
      show = true, onAction = actions += _)
    // -n gates the psql ledger layer only (db.py:13-15): no install ran,
    // each suppressed insert is reported, the RPC side still executed
    assert(installed.isEmpty)
    assert(actions.map(a => (a.op, a.target)) ==
      Seq(("installPatch", "uf1"), ("installPatch", "uf2")))
    assert(report.patches.map(_.status) == Seq("installed", "installed"))
    assert(connected == Seq("I1"))
  }

  test("publishVersioned: pointer-commit swap, crash residue GC, immutability") {
    val wh = Files.createTempDirectory("graft_ver_wh").toString
    val v1data = Seq((1L, "a")).toDF("id", "x")
    val v2data = Seq((2L, "b")).toDF("id", "x")

    // never published → absent
    assert(Restore.resolveVersioned(spark, wh, "DB1").isEmpty)

    val p1 = Restore.publishVersioned(spark, v1data, wh, "DB1", "t1")
    assert(Restore.resolveVersioned(spark, wh, "DB1").contains(p1))
    assert(spark.read.parquet(p1.toString).as[(Long, String)].collect()
      .toSeq == Seq((1L, "a")))

    // second publish: pointer moves, but the superseded dir is RETAINED
    // (mtime refreshed, grace-protected) so a reader that resolved the old
    // pointer just before the swap can finish its scan; gcUnreferenced is
    // the one cleanup path
    val p2 = Restore.publishVersioned(spark, v2data, wh, "DB1", "t2")
    assert(Restore.resolveVersioned(spark, wh, "DB1").contains(p2))
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(p1), "superseded version dir must survive the swap " +
      "for grace-window readers")
    assert(spark.read.parquet(p1.toString).as[(Long, String)].collect()
      .toSeq == Seq((1L, "a")), "retained dir stays fully readable")
    // young (mtime refreshed at supersede) → a default-grace sweep spares it
    assert(Restore.gcUnreferenced(spark, wh) == Seq.empty)
    assert(fs.exists(p1))

    // version dirs are immutable: token reuse refuses
    intercept[IllegalArgumentException] {
      Restore.publishVersioned(spark, v1data, wh, "DB1", "t2")
    }

    // crash residue: a version dir with no pointer (writer died pre-swap)
    v1data.write.parquet(new org.apache.hadoop.fs.Path(wh, "DB1__vcrash").toString)
    // and a second db whose CURRENT version must survive the sweep
    val q1 = Restore.publishVersioned(spark, v1data, wh, "DB2", "t1")
    // default grace: a YOUNG unreferenced dir is indistinguishable from a
    // live publisher's not-yet-committed write — never collected
    assert(Restore.gcUnreferenced(spark, wh) == Seq.empty)
    assert(fs.exists(new org.apache.hadoop.fs.Path(wh, "DB1__vcrash")))
    // past the grace window (cutoff pushed into the future) the crash
    // residue AND the superseded v1 dir are both collected
    assert(Restore.gcUnreferenced(spark, wh, graceMs = -60000L).sorted ==
      Seq("DB1__vcrash", "DB1__vt1"))
    assert(Restore.resolveVersioned(spark, wh, "DB1").contains(p2))
    assert(Restore.resolveVersioned(spark, wh, "DB2").contains(q1))

    // lost pointer target = absence, not stale data
    fs.delete(q1, true)
    assert(Restore.resolveVersioned(spark, wh, "DB2").isEmpty)

    // torn/empty marker read = absence too (an empty name would otherwise
    // resolve to the warehouse dir itself, which exists)
    val torn = new org.apache.hadoop.fs.Path(wh, "DB3.commit")
    val out = fs.create(torn, true)
    out.close() // zero bytes written
    assert(Restore.resolveVersioned(spark, wh, "DB3").isEmpty)
  }

  test("publishVersioned: a publish chain leaves exactly the last version; " +
      "a racer's orphan dir is grace-protected then collected") {
    val wh = Files.createTempDirectory("graft_race_wh").toString
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v0 = Restore.publishVersioned(spark, Seq((0L, "x")).toDF("id", "x"),
      wh, "DBR", "t0")
    val a = Restore.publishVersioned(spark, Seq((1L, "a")).toDF("id", "x"),
      wh, "DBR", "tA")
    val b = Restore.publishVersioned(spark, Seq((2L, "b")).toDF("id", "x"),
      wh, "DBR", "tB")
    // sequential chain: pointer tracks the last publish; superseded dirs
    // are retained for grace-window readers, then swept together
    assert(Restore.resolveVersioned(spark, wh, "DBR").contains(b))
    assert(fs.exists(v0) && fs.exists(a))
    assert(spark.read.parquet(b.toString).count() == 1)
    // a RACING publisher that lost the pointer race before its swap (its
    // dir written, never referenced — the scenario gcUnreferenced's grace
    // exists for): protected young, collected old; the winner untouched
    Seq((9L, "r")).toDF("id", "x").write
      .parquet(new org.apache.hadoop.fs.Path(wh, "DBR__vracer").toString)
    assert(Restore.gcUnreferenced(spark, wh) == Seq.empty)
    assert(Restore.gcUnreferenced(spark, wh, graceMs = -60000L).sorted ==
      Seq("DBR__vracer", "DBR__vt0", "DBR__vtA"))
    assert(Restore.resolveVersioned(spark, wh, "DBR").contains(b))
    assert(!fs.exists(v0) && !fs.exists(a))
  }

  test("publishVersioned PROPERTY: random publish/GC/resolve interleavings " +
      "keep the pointer protocol's invariants") {
    // ScalaCheck drives the op sequences; after every op the protocol
    // must satisfy: (1) resolve names the LAST completed publish, (2) the
    // resolved dir's data is the data that publish wrote, (3) a
    // default-grace GC never touches the current version nor any
    // young-superseded dir, (4) an AGED GC leaves exactly the current
    // version among __v dirs. This pins the r5 race fixes (pointer swap,
    // GC grace) and the r6 retention change as one executable contract.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    sealed trait Op
    case object Publish extends Op
    case object GcYoung extends Op
    case object GcAged extends Op
    case object Resolve extends Op
    val opGen: Gen[List[Op]] = Gen.choose(4, 10).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        4 -> Gen.const(Publish), 2 -> Gen.const(GcYoung),
        1 -> Gen.const(GcAged), 3 -> Gen.const(Resolve))))
    var case_n = 0
    val prop = Prop.forAll(opGen) { ops =>
      case_n += 1
      val wh = Files.createTempDirectory(s"graft_prop_wh$case_n").toString
      val fs = new org.apache.hadoop.fs.Path(wh)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      var published = 0
      var current: Option[(org.apache.hadoop.fs.Path, Long)] = None
      ops.forall { op =>
        op match {
          case Publish =>
            published += 1
            val p = Restore.publishVersioned(spark,
              Seq((published.toLong, s"v$published")).toDF("id", "x"),
              wh, "DBP", s"t$published")
            current = Some((p, published.toLong))
          case GcYoung =>
            Restore.gcUnreferenced(spark, wh)
          case GcAged =>
            Restore.gcUnreferenced(spark, wh, graceMs = -60000L)
          case Resolve => ()
        }
        val resolved = Restore.resolveVersioned(spark, wh, "DBP")
        val pointerOk = resolved == current.map(_._1)
        val dataOk = current.forall { case (p, tag) =>
          spark.read.parquet(p.toString).as[(Long, String)]
            .collect().toSeq == Seq((tag, s"v$tag"))
        }
        val dirsAfterAged = op != GcAged || {
          val vdirs = fs.listStatus(new org.apache.hadoop.fs.Path(wh))
            .filter(e => e.isDirectory && e.getPath.getName.contains("__v"))
            .map(_.getPath.getName).toSet
          vdirs == current.map(c => Set(c._1.getName)).getOrElse(Set.empty)
        }
        pointerOk && dataOk && dirsAfterAged
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("publishVersioned RACE: concurrent publishers, readers and GC " +
      "never lose the pointer or fail a read") {
    val wh = Files.createTempDirectory("graft_race_threads").toString
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    // 3 publishers × 4 publishes each, token-unique; every publish fully
    // succeeds (the protocol is last-writer-wins on the marker)
    val publishers = (1 to 3).map { p =>
      new Thread(() => {
        try {
          for (k <- 1 to 4) {
            Restore.publishVersioned(spark,
              Seq((p.toLong * 100 + k, s"p$p-k$k")).toDF("id", "x"),
              wh, "DBT", s"p$p-t$k")
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    // reader: resolve + full read in a loop — with the retention grace a
    // resolved dir must stay readable even when superseded mid-scan
    val reader = new Thread(() => {
      try {
        while (!done.get()) {
          Restore.resolveVersioned(spark, wh, "DBT").foreach { p =>
            spark.read.parquet(p.toString).collect()
          }
        }
      } catch { case t: Throwable => errors.add(t) }
    })
    // GC at default grace, concurrent with everything
    val gc = new Thread(() => {
      try { while (!done.get()) { Restore.gcUnreferenced(spark, wh) } }
      catch { case t: Throwable => errors.add(t) }
    })
    reader.start(); gc.start(); publishers.foreach(_.start())
    publishers.foreach(_.join(120000))
    done.set(true); reader.join(30000); gc.join(30000)
    assert(errors.isEmpty, errors.toArray.mkString("\n"))
    // the surviving pointer names one of the 12 published versions and reads
    val p = Restore.resolveVersioned(spark, wh, "DBT")
    assert(p.nonEmpty)
    assert(p.get.getName.startsWith("DBT__vp"))
    assert(spark.read.parquet(p.get.toString).count() == 1)
    // aged GC after quiescence: every loser/superseded dir collects, the
    // winner survives
    Restore.gcUnreferenced(spark, wh, graceMs = -60000L)
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vdirs = fs.listStatus(new org.apache.hadoop.fs.Path(wh))
      .filter(e => e.isDirectory && e.getPath.getName.contains("__v"))
      .map(_.getPath.getName).toSet
    assert(vdirs == Set(p.get.getName))
    assert(Restore.resolveVersioned(spark, wh, "DBT") == p)
  }
}
