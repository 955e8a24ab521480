package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Naming

/** The `ufload upgrade` flow (main.py:522-766): list patch files, order
  * them by natural version (OP-33), skip patches whose checksum is already
  * installed (OP-35 idempotence, db.py:877-896), and produce the ordered
  * install plan. The RPC-driven apply/poll loops are driver-side effects
  * outside the relational surface; the plan computation is the operator.
  */
object Upgrade {

  /** Natural-version sort key column (array<int>, element-wise order). */
  def versionKey(file: Column): Column = Naming.versionKeyCol(file)

  /** Ordered install plan: patches (file, sum) minus already-installed
    * checksums (sync_server_version.sum, db.py:877-878), natural-version
    * ascending. `installed` is small (a version ledger) → broadcast the
    * anti-join so the patch listing never shuffles.
    */
  def installPlan(patches: DataFrame, installed: DataFrame): DataFrame =
    patches
      .join(broadcast(installed.select(col("sum")).dropDuplicates("sum")),
        Seq("sum"), "left_anti")
      .withColumn("vkey", versionKey(col("file")))
      .orderBy(col("vkey").asc, col("file").asc)
      .select("file", "sum", "vkey")

  /** Revision gate (main.py:617-619): a manual-sync error matching
    * `Cannot check for updates: There is/are N revision(s) available.`
    * means patches must be installed before syncing. The reference's check
    * is a DOTALL boolean prefix-match; [[updateAvailable]] mirrors that,
    * and [[revisionsAvailable]] additionally extracts the count N (empty
    * string when the gate doesn't fire).
    */
  /** The one definition of the gate message's regex (with the count as a
    * capture group) — [[Apply.classify]] derives from it too, so the two
    * classifiers cannot drift.
    */
  val RevisionGate: String =
    "Cannot check for updates: There is/are ([0-9]+) revision\\(s\\) available\\."

  def updateAvailable(errorMsg: Column): Column =
    errorMsg.rlike("(?s)^.*" + RevisionGate)

  def revisionsAvailable(errorMsg: Column): Column =
    regexp_extract(errorMsg, RevisionGate, 1)
}
