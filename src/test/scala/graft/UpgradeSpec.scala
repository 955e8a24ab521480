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

  test("requiredRevision extracts the revision gate") {
    val got = Seq("update to revision deadbeef42 required", "other error")
      .toDF("msg")
      .select(Upgrade.requiredRevision(col("msg")).as("rev"))
      .as[String].collect().toSeq
    assert(got == Seq("deadbeef42", ""))
  }
}
