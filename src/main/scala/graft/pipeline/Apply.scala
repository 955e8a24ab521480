package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The upgrade APPLY side — what happens after [[Upgrade.installPlan]] says
  * which patches to install (main.py:612-699, db.py:863-896). The RPC calls
  * themselves are injected (they are driver-side effects against a live
  * server); the orchestration — error classification, retry/poll state
  * machines, and the patch-ledger insert — is library surface.
  */
object Apply {

  // ---- error classification (main.py:605, 617-626, 685) -----------------

  sealed trait SyncError
  /** Patches must be installed before syncing (revision gate or version
    * mismatch — main.py:605, 617-619).
    */
  case object UpdateAvailable extends SyncError
  /** Transient auth failure — retry up to 10× with a 1 s pause
    * (main.py:621-626).
    */
  case object AuthRetry extends SyncError
  /** The server is mid-module-update — keep polling (main.py:685). */
  case object ServerUpdating extends SyncError
  /** Anything else re-raises (main.py:628, 687). */
  case object Fatal extends SyncError

  // single source of truth for the message shape: Upgrade.RevisionGate
  private val RevisionGate = ("(?s)^.*" + Upgrade.RevisionGate).r

  def classify(errorMsg: String): SyncError =
    if (errorMsg.endsWith("OpenERP version doesn't match database version!"))
      UpdateAvailable
    else if (RevisionGate.pattern.matcher(errorMsg).lookingAt()) UpdateAvailable
    else if (errorMsg.endsWith(
      "Authentification Failed, please contact the support")) AuthRetry
    else if (errorMsg.endsWith("ServerUpdate: Server is updating modules ..."))
      ServerUpdating
    else Fatal

  // ---- patch-ledger insert (db.py:863-896) ------------------------------

  /** Rows to insert into the `sync_server_version` ledger for patches whose
    * checksum is not installed yet — the relational core of installPatch
    * (db.py:877-886): checksum-idempotent (already-installed sums are
    * anti-joined away), contents base64-encoded into the `patch` column,
    * fixed state/importance and the reference's comment text. `patches`
    * carries (version, sum, content: binary); `installed` is the current
    * ledger. Timestamps/uids are the caller's concern (the reference uses
    * NOW() and uid 1 server-side).
    */
  def patchInserts(patches: DataFrame, installed: DataFrame): DataFrame =
    patches
      .join(broadcast(installed.select(col("sum")).dropDuplicates("sum")),
        Seq("sum"), "left_anti")
      .select(
        col("version").as("name"),
        lit("confirmed").as("state"),
        lit("required").as("importance"),
        concat(lit("Version "), col("version"),
          lit(" installed by ufload")).as("comment"),
        col("sum"),
        base64(col("content")).as("patch"))

  // ---- poll loops (main.py:640-661, 666-699) ----------------------------

  /** Await server restart after a manual upgrade (main.py:640-661): ping
    * until the server answers or `maxAttempts` 1 s-spaced probes elapse.
    * `ping()` = the GET-login probe; `sleep` injected for testability.
    * Returns true when the server came back.
    */
  def awaitRestart(ping: () => Boolean, maxAttempts: Int = 300,
                   sleep: () => Unit = () => Thread.sleep(1000)): Boolean = {
    var i = 0
    while (i < maxAttempts) {
      if (ping()) return true
      sleep()
      i += 1
    }
    false
  }

  /** Per-instance module-update poll (main.py:666-699): retry the RPC
    * connect while it fails with ServerUpdating (or a socket error — the
    * reference treats both as "still updating"); AuthRetry gets the same
    * bounded patience; Fatal propagates. Returns true once the connect
    * succeeds, false when attempts are exhausted.
    */
  def updateModulesLoop(connect: () => Either[String, Unit],
                        maxAttempts: Int = 360,
                        sleep: () => Unit = () => Thread.sleep(5000)): Boolean = {
    var i = 0
    while (i < maxAttempts) {
      connect() match {
        case Right(()) => return true
        case Left(msg) => classify(msg) match {
          case ServerUpdating | AuthRetry => sleep(); i += 1
          case UpdateAvailable | Fatal =>
            throw new IllegalStateException(s"module update failed: $msg")
        }
      }
    }
    false
  }
}
