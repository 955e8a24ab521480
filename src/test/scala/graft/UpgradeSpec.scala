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
}
