package graft.pipeline

import graft.core.Naming

/** Sync-SERVER-side post-restore rules, the counterpart of the client-side
  * de-live suite: reproduced as diffable rule DATA from
  *  - sync_server_all_admin:            /root/reference/ufload/db.py:713-714
  *  - sync_server_all_sandbox_sync_user: /root/reference/ufload/db.py:716-719
  *  - _syncLink (hwid write-back):      /root/reference/ufload/cli/main.py:449-478
  *
  * Applied with [[Delive.apply]] over a `Map[String, DataFrame]` holding the
  * sync-server tables (`sync_server_entity`, `res_users`, `ir_sequence`) —
  * the same missing-table/missing-column psql tolerance as the client rules.
  *
  * Divergence note (DIVERGENCES.md #19): main.py:468's `if not db:
  * instance = db` guard is dead code — `db` is a non-empty loop element, so
  * the branch never fires (and would assign the falsy value it tests, not a
  * fallback). We derive the instance unconditionally via
  * [[Naming.dbToInstance]] (db.py:623-634), which is what actually executes.
  */
object SyncLink {
  import Delive._

  /** db.py:713-714 — every entity syncs as the superuser. */
  def allAdminRules: Seq[Rule] = Seq(
    SetCols("sync_server_entity", Map("user_id" -> "1")))

  /** db.py:716-719 — point every entity at the sandbox sync user via the
    * scalar-subquery lookup, then (only when a password is supplied) reset
    * that user's password.
    */
  def sandboxSyncUserRules(connectionUser: String,
                           connectionPw: Option[String] = None): Seq[Rule] =
    SetColScalar("sync_server_entity", "user_id",
      "res_users", "id", s"login = ${lit(connectionUser)}") +:
    connectionPw.toSeq.map(pw =>
      SetCols("res_users", Map("password" -> lit(pw)),
        Some(s"login = ${lit(connectionUser)}")))

  /** main.py:449-478 — the full post-restore link step:
    *  1. sandbox sync-user rules (main.py:453);
    *  2. +1000 gap in the sync update sequence (main.py:456);
    *  3. hardware-id write-back (main.py:459-475): with no hwid available,
    *     nothing is written (main.py:460-462); on an EXISTING sync server
    *     (`targeted = args.ss and no --sync/--synclight`, main.py:464) only
    *     the instances restored this run are re-linked — other servers'
    *     entities keep their ids; on a fresh server every entity is claimed.
    *
    * `dbs` are restored DATABASE names; each is reduced to its entity name
    * with the same db→instance derivation the reference calls at
    * main.py:467.
    */
  def syncLinkRules(connectionUser: String,
                    connectionPw: Option[String],
                    hwid: Option[String],
                    dbs: Seq[String],
                    targeted: Boolean,
                    dbPrefix: Option[String] = None): Seq[Rule] = {
    val seqGap = SetCols("ir_sequence",
      Map("number_next" -> "number_next + 1000"),
      Some("code = 'sync.server.update'"))
    val hw = hwid.toSeq.flatMap { h =>
      if (targeted)
        dbs.map(db => SetCols("sync_server_entity",
          Map("hardware_id" -> lit(h)),
          Some(s"name = ${lit(Naming.dbToInstance(db, dbPrefix))}")))
      else
        Seq(SetCols("sync_server_entity", Map("hardware_id" -> lit(h))))
    }
    (sandboxSyncUserRules(connectionUser, connectionPw) :+ seqGap) ++ hw
  }
}
