package graft

import graft.pipeline.Upgrade
import org.apache.spark.sql.functions._

class UpgradeSpec extends SparkSpec {
  import spark.implicits._

  test("installPlan orders by natural version and skips installed checksums") {
    val patches = Seq(
      ("uf10.0.patch.zip", "s10"),
      ("uf2.1-2p3.patch.zip", "s213"),
      ("uf2.1.patch.zip", "s21"),
      ("uf2.2.patch.zip", "sINSTALLED")
    ).toDF("file", "sum")
    val installed = Seq("sINSTALLED").toDF("sum")
    val plan = Upgrade.installPlan(patches, installed)
      .select("file").as[String].collect().toSeq
    // natural order: 2.1 < 2.1-2p3 < 10.0 ; 2.2 skipped (already installed)
    assert(plan == Seq("uf2.1.patch.zip", "uf2.1-2p3.patch.zip", "uf10.0.patch.zip"))
  }

  test("installPlan is idempotent when everything is installed") {
    val patches = Seq(("uf1.0.patch.zip", "a")).toDF("file", "sum")
    val installed = Seq("a").toDF("sum")
    assert(Upgrade.installPlan(patches, installed).count() == 0)
  }

  test("revision gate matches the reference's sync-error message shape") {
    val gated = "prefix junk\nCannot check for updates: " +
      "There is/are 3 revision(s) available."
    val got = Seq(gated, "other error", "revision deadbeef42")
      .toDF("msg")
      .select(Upgrade.updateAvailable(col("msg")).as("gate"),
        Upgrade.revisionsAvailable(col("msg")).as("n"))
      .as[(Boolean, String)].collect().toSeq
    assert(got == Seq((true, "3"), (false, ""), (false, "")))
  }

  test("installPlan orders mixed-case patch names naturally (re.I parity)") {
    val patches = Seq(("UF10.0.patch.zip", "a"), ("uf2.1.patch.zip", "b"),
      ("UF2.1-2P3.patch.zip", "c")).toDF("file", "sum")
    val installed = Seq.empty[String].toDF("sum")
    val plan = Upgrade.installPlan(patches, installed)
      .select("file").as[String].collect().toSeq
    assert(plan == Seq("uf2.1.patch.zip", "UF2.1-2P3.patch.zip",
      "UF10.0.patch.zip"))
  }

  test("userRightsPlan: mixed-case UR names, natural order, last = install target") {
    // reference-shaped vectors (main.py:718 searches with re.I; real
    // artifacts mix case freely)
    val files = Seq(
      "USER RIGHTS V10.0.zip",
      "user rights v2.1-10p2.zip",
      "User Rights v2.1-2p3.zip",
      "not-a-user-rights-file.zip").toDF("file")
    val plan = Upgrade.userRightsPlan(files)
      .select("rank", "file", "is_install_target")
      .as[(Long, String, Boolean)].collect().sortBy(_._1).toSeq
    assert(plan.map(_._2) == Seq("User Rights v2.1-2p3.zip",
      "user rights v2.1-10p2.zip", "USER RIGHTS V10.0.zip"))
    // only the highest version is installed (the reference overwrites
    // urfilename per download and installs the final one)
    assert(plan.map(_._3) == Seq(false, false, true))
  }

  test("userRightsInserts: splitext name + base64 zip payload") {
    val got = Upgrade.userRightsInserts(
        Seq(("User Rights v2.1.zip", "PAYLOAD".getBytes("UTF-8")))
          .toDF("file", "content"))
      .as[(String, String)].collect().head
    assert(got._1 == "User Rights v2.1")
    assert(new String(java.util.Base64.getDecoder.decode(got._2),
      "UTF-8") == "PAYLOAD")
  }

  test("userRightsInserts name matches os.path.splitext on path edge cases") {
    // (input, os.path.splitext(input)[0]) vectors: dots in directory
    // components never strip; all-leading-dot basenames keep themselves
    val vectors = Seq(
      "downloads.v2/urfile" -> "downloads.v2/urfile",
      "a/b.zip" -> "a/b",
      "a/.hidden.zip" -> "a/.hidden",
      ".zip" -> ".zip",
      "..zip" -> "..zip",
      "tmp/UR v1.0-2p3.ZIP" -> "tmp/UR v1.0-2p3")
    val got = Upgrade.userRightsInserts(
        vectors.map { case (f, _) => (f, Array[Byte](1)) }.toDF("file", "content"))
      .select("name").as[String].collect().toSeq
    assert(got == vectors.map(_._2))
  }

  test("run: install plan applied in order; revision gate triggers one upgrade") {
    val downloaded = scala.collection.mutable.ListBuffer[String]()
    val installedV = scala.collection.mutable.ListBuffer[String]()
    var upgrades = 0
    var pings = 0
    var syncCalls = 0
    val report = Upgrade.run(
      plan = Seq(("uf2.1.patch.zip", "s1"), ("UF10.0.patch.zip", "s2")),
      download = f => { downloaded += f; f.getBytes("UTF-8") },
      installPatch = (v, _) => { installedV += v; v != "UF10.0" }, // 2nd: server says exists
      instances = Seq("SYNC_SERVER_LOCAL", "OCG_KE1_NBO", "OCA_TD1_ABC"),
      connect = _ => Left("x: OpenERP version doesn't match database version!"),
      manualSync = _ => { syncCalls += 1
        Left("Cannot check for updates: There is/are 2 revision(s) available.") },
      manualUpgrade = () => upgrades += 1,
      ping = () => { pings += 1; pings > 2 }, // restarts on the 3rd probe
      migrate = Some { inst =>
        if (inst == "OCA_TD1_ABC") Right(())
        else Left("ServerUpdate: Server is updating modules ...") },
      sleep = () => ())
    assert(downloaded.toList == List("uf2.1.patch.zip", "UF10.0.patch.zip"))
    assert(installedV.toList == List("uf2.1", "UF10.0")) // main.py version capture
    assert(report.patches.map(_.status) == Seq("installed", "skipped"))
    assert(report.upgradeTriggered && upgrades == 1) // ONE upgrade, loop broken
    assert(syncCalls == 1) // sync server skipped; first instance gated
    assert(report.modulesUpdated == Seq("OCA_TD1_ABC")) // the stuck one timed out
  }

  test("run: auth errors retry up to 10 then raise; fatal raises immediately") {
    var attempts = 0
    val err = intercept[IllegalStateException] {
      Upgrade.run(Seq.empty, _ => Array.empty, (_, _) => true,
        Seq("I1"), connect = _ => Right(()),
        manualSync = _ => { attempts += 1
          Left("Authentification Failed, please contact the support") },
        manualUpgrade = () => fail("no upgrade"), ping = () => true,
        sleep = () => ())
    }
    assert(attempts == 11 && err.getMessage.contains("sync(I1)"))
    intercept[IllegalStateException] {
      Upgrade.run(Seq.empty, _ => Array.empty, (_, _) => true,
        Seq("I1"), connect = _ => Left("some totally unknown explosion"),
        manualSync = _ => Right(()), manualUpgrade = () => (),
        ping = () => true, sleep = () => ())
    }
  }

  test("installUserRights state machine: done, not-done, exists-on-server") {
    import Upgrade.{UrAlreadyExists, UrLoaded}
    var acked = List.empty[Long]
    assert(Upgrade.installUserRights(
      () => 7L, _ => (), _ => ("done", ""), id => acked ::= id) == UrLoaded)
    assert(acked == List(7L))

    val err = intercept[IllegalStateException] {
      Upgrade.installUserRights(
        () => 8L, _ => (), _ => ("error", "boom"), _ => fail("must not ack"))
    }
    assert(err.getMessage == "Unable to load UR: boom")

    // the reference catches RPCError ending 'exists on server' from any
    // step and continues with user_rights_updated = '' (main.py:726-731)
    assert(Upgrade.installUserRights(
      () => 9L,
      _ => throw new RuntimeException(
        "file User Rights v2.1.zip exists on server"),
      _ => fail("unreached"): (String, String),
      _ => ()) == UrAlreadyExists)
  }
}
