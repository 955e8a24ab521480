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

  // ---- end-to-end upgrade orchestrator (main.py:522-766) ----------------

  /** One patch's outcome in an [[run]] report. */
  case class PatchStep(file: String, version: String, status: String)

  case class UpgradeReport(patches: Seq[PatchStep], upgradeTriggered: Boolean,
                          modulesUpdated: Seq[String])

  /** The version text the reference derives from a patch filename for the
    * ledger (`re.search('(.+?)\.patch\.zip', filename).group(1)`,
    * main.py:561-563 — the WHOLE prefix, `uf` included).
    */
  def patchVersion(file: String): String =
    "(.+?)\\.patch\\.zip".r.findFirstMatchIn(file).map(_.group(1))
      .getOrElse(file)

  /** The `ufload upgrade` apply loop with every RPC/HTTP effect injected —
    * mirroring [[Restore.run]]'s shape: the plan side is relational
    * ([[installPlan]]: ordered, checksum-skipped), the driver folds over
    * the tiny plan, and the reference's control flow is kept exactly:
    *
    *  - each planned patch: download → `installPatch` ledger insert
    *    (main.py:557-567; a false return = server says already installed,
    *    recorded as "skipped" like the reference's rc != 0 branch);
    *  - per instance: `connect` — a version-mismatch error marks an update
    *    available (main.py:603-608), anything else fatal; then `manualSync`
    *    under [[Apply.classify]]: AuthRetry ≤ 10 one-second retries
    *    (main.py:622-626), the revision gate marks the update available and
    *    stops syncing (main.py:617-621), Fatal raises;
    *  - one `manualUpgrade` + [[Apply.awaitRestart]] when an update became
    *    available — the reference upgrades ONCE and breaks the instance
    *    loop (main.py:635-663); a failed restart raises the reference's
    *    "can not be restarted" error;
    *  - `migrate` set: per-instance [[Apply.updateModulesLoop]]
    *    (main.py:666-699), recording which instances completed.
    */
  def run(plan: Seq[(String, String)], // (file, sum) in installPlan order
          download: String => Array[Byte],
          installPatch: (String, Array[Byte]) => Boolean,
          instances: Seq[String],
          syncServer: String = "SYNC_SERVER_LOCAL",
          connect: String => Either[String, Unit],
          manualSync: String => Either[String, Unit],
          manualUpgrade: () => Unit,
          ping: () => Boolean,
          migrate: Option[String => Either[String, Unit]] = None,
          sleep: () => Unit = () => Thread.sleep(1000),
          show: Boolean = false,
          onAction: Restore.Action => Unit = _ => ()): UpgradeReport = {
    // `-n` in the reference gates its `_run` psql layer ONLY (db.py:13-15):
    // the ledger insert behind installPatch is suppressed (vacuous rc = 0 →
    // "installed", main.py:565-567), while downloads and the RPC
    // connect/sync/upgrade machinery still execute — faithfully kept here.
    val steps = plan.map { case (file, _) =>
      val version = patchVersion(file)
      val payload = download(file)
      val ok =
        if (show) { onAction(Restore.Action("installPatch", version)); true }
        else installPatch(version, payload)
      PatchStep(file, version, if (ok) "installed" else "skipped")
    }
    var updateAvailable = false
    var upgraded = false
    for (instance <- instances if instance != syncServer && !upgraded) {
      connect(instance) match {
        case Right(()) => ()
        case Left(msg) if Apply.classify(msg) == Apply.UpdateAvailable =>
          updateAvailable = true
        case Left(msg) =>
          throw new IllegalStateException(s"connect($instance) failed: $msg")
      }
      var syncing = true
      var authRetries = 0
      while (syncing) {
        manualSync(instance) match {
          case Right(()) => syncing = false
          case Left(msg) => Apply.classify(msg) match {
            case Apply.UpdateAvailable =>
              updateAvailable = true; syncing = false
            case Apply.AuthRetry if authRetries < 10 =>
              authRetries += 1; sleep()
            case _ =>
              throw new IllegalStateException(s"sync($instance) failed: $msg")
          }
        }
      }
      if (updateAvailable) {
        manualUpgrade()
        if (!Apply.awaitRestart(ping, maxAttempts = 300, sleep = sleep))
          throw new IllegalStateException(
            "The UniField server can not be restarted") // main.py:661
        upgraded = true // reference breaks the instance loop after one upgrade
      }
    }
    val updated = migrate match {
      case None => Seq.empty
      case Some(connectRpc) =>
        instances.filter(_ != syncServer).filter { inst =>
          Apply.updateModulesLoop(() => connectRpc(inst), sleep = sleep)
        }
    }
    UpgradeReport(steps, upgraded, updated)
  }

  // ---- user-rights install flow (main.py:700-735, db.py:898-924) --------

  /** User-rights artifact plan (main.py:704-724): keep names matching the
    * `(?i)'User Rights v(.+?).zip'` shape, natural-version ascending. The
    * reference downloads every artifact in sorted order and installs ONLY
    * the last one downloaded (the highest version — `urfilename` is
    * overwritten per iteration, :721-735); `is_install_target` marks it.
    * Rank via [[graft.core.Ops.globalRank]] — no single-partition window —
    * and the max-rank scalar is a broadcast one-row cross join (the same
    * contract-pinned shape as the q20 decile probe).
    */
  def userRightsPlan(files: DataFrame, fileCol: String = "file"): DataFrame = {
    val matched = files.filter(col(fileCol).rlike(Naming.UserRightsPattern))
      .withColumn("vkey",
        Naming.versionKeyCol(col(fileCol), Naming.UserRightsPattern))
    // ties on vkey break by filename (a relation has no listing order to be
    // stable over — DIVERGENCES #16); max(rank) == row count by
    // construction, so the scalar comes from a cheap count aggregate, not a
    // second ranking pass
    graft.core.Ops.globalRank(matched,
        Seq(col("vkey").asc, col(fileCol).asc))
      .crossJoin(broadcast(matched.groupBy().agg(count(lit(1)).as("__max"))))
      .withColumn("is_install_target", col("rank") === col("__max"))
      .drop("__max")
  }

  /** `sync_server.user_rights.add_file` create-rows (db.py:903-915): name =
    * filename minus its extension with `os.path.splitext` semantics — only
    * the last dot-suffix OF THE BASENAME drops, a dot in a directory
    * component is never touched, and a basename that is all leading dots
    * (`.zip`, `..zip`) keeps itself whole. The lookbehind requires a
    * non-dot, non-slash character before the stripped dot, and `[^./]*$`
    * confines the suffix to the basename. zip_file = base64 contents.
    * `files` carries (file, content: binary).
    */
  def userRightsInserts(files: DataFrame): DataFrame =
    files.select(
      regexp_replace(col("file"), "(?<=[^/.])\\.[^./]*$", "").as("name"),
      base64(col("content")).as("zip_file"))

  sealed trait UrInstall
  /** import_zip reached state `done` and was acknowledged (db.py:918-924). */
  case object UrLoaded extends UrInstall
  /** The server already holds this file — the reference catches exactly the
    * RPCError ending `"exists on server"` and continues with
    * `user_rights_updated = ''` (main.py:726-731).
    */
  case object UrAlreadyExists extends UrInstall

  /** The installUserRights ledger state machine (db.py:898-924): create the
    * add_file record, import it, read back (state, message); any state but
    * `done` raises with the server message, `done` is acknowledged via
    * `markDone`. RPC effects are injected (driver-side against a live
    * server); an "exists on server" error from any step maps to
    * [[UrAlreadyExists]], other errors propagate.
    */
  def installUserRights(create: () => Long,
                        importZip: Long => Unit,
                        readState: Long => (String, String),
                        markDone: Long => Unit): UrInstall =
    try {
      val loadId = create()
      importZip(loadId)
      val (state, message) = readState(loadId)
      if (state != "done")
        throw new IllegalStateException(s"Unable to load UR: $message")
      markDone(loadId)
      UrLoaded
    } catch {
      case e: RuntimeException
          if e.getMessage != null && e.getMessage.endsWith("exists on server") =>
        UrAlreadyExists
    }
}
