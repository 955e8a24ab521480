package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The de-live sanitization suite (db.py:342-537) re-expressed as DATA: an
  * ordered list of declarative rewrite rules over named tables, so the rule
  * list can be diffed line-for-line against the reference's SQL (SURVEY.md
  * §7.4) and applied as pure DataFrame transforms.
  *
  * Rule semantics mirror psql tolerance: a rule against a missing table is
  * skipped (the reference ignores non-zero rc for optional tables); a SET on
  * a missing column is skipped likewise.
  */
object Delive {

  sealed trait Rule { def table: String }

  /** UPDATE table SET col=sqlExpr, … [WHERE whereSql] (OP-17). */
  case class SetCols(table: String, sets: Map[String, String],
                     where: Option[String] = None) extends Rule

  /** DELETE FROM table WHERE whereSql (OP-18). */
  case class DeleteWhere(table: String, where: String) extends Rule

  /** TRUNCATE table (OP-19). */
  case class Truncate(table: String) extends Rule

  /** ALTER TABLE … ADD COLUMN IF NOT EXISTS col (copied from fromCol)
    * (OP-20).
    */
  case class AddColumnIfAbsent(table: String, column: String,
                               fromSql: String) extends Rule

  /** UPDATE table SET column = (SELECT selectSql FROM fromTable WHERE
    * whereSql) — the uncorrelated scalar-subquery UPDATE (db.py:717, the
    * OP-22 family). Postgres scalar-subquery semantics are mirrored
    * exactly: zero matching rows assign NULL, more than one is an error.
    */
  case class SetColScalar(table: String, column: String, fromTable: String,
                          selectSql: String, where: String) extends Rule

  /** Pipeline config mirroring the reference's CLI args (main.py). */
  case class Config(
      adminUser: String = "admin",
      dbPrefix: Option[String] = None,
      syncServer: String = "SYNC_SERVER_LOCAL",
      xmlrpcPort: Int = 8069,
      autosync: Boolean = false,
      silentUpgrade: Boolean = false,
      hideGroups: Seq[String] = Nil,
      logoB64: Option[String] = None,
      banner: Option[String] = None,
      usersPw: Option[String] = None,
      pwList: Seq[(String, String)] = Nil,
      adminPw: Option[String] = None,
      inactiveUsers: Boolean = false,
      backupDir: String = "/tmp",
      live: Boolean = false,
      noPwReset: Boolean = false)

  private[pipeline] def lit(s: String): String =
    "'" + s.replace("'", "''") + "'"

  /** The ordered rule list — reproduces db.py:349-537 statement-for-
    * statement (conditional blocks follow the same flags).
    */
  def rules(cfg: Config): Seq[Rule] = {
    if (cfg.live) return Nil // db.py:350-354: live → no sanitization
    val adminuser = cfg.adminUser.toLowerCase
    val pfx = cfg.dbPrefix.fold("")(_ + "_")
    val ss = cfg.syncServer

    val sync = Seq(
      // db.py:370-372: ADD COLUMN IF NOT EXISTS, then the snapshot copy runs
      // UNCONDITIONALLY on every de-live (re-running overwrites the previous
      // snapshot — reference behavior, not keep-first)
      AddColumnIfAbsent("sync_client_sync_server_connection",
        "ufload_automatic_patching_prod_value", "automatic_patching"),
      SetCols("sync_client_sync_server_connection", Map(
        "ufload_automatic_patching_prod_value" -> "automatic_patching")),
      SetCols("sync_client_sync_server_connection", Map(
        "automatic_patching" -> "false",
        "protocol" -> "'xmlrpc'",
        "login" -> lit(adminuser),
        "database" -> lit(pfx + ss),
        "host" -> "'127.0.0.1'",
        "port" -> cfg.xmlrpcPort.toString)))

    // db.py:377-395 — disable cron jobs per model
    val crons = Seq("backup.config", "unidata.sync", "msf.instance.cloud",
      "sync.client.entity", "stock.mission.report", "automated.import",
      "automated.export").map(m =>
      SetCols("ir_cron", Map("active" -> "false"),
        Some(s"model = ${lit(m)}")))

    // db.py:397-404 — blank automated import/export settings
    val blank = Map("report_path" -> "''", "ftp_url" -> "''",
      "dest_path" -> "''", "ftp_ok" -> "false", "ftp_port" -> "''",
      "dest_path_failure" -> "''", "ftp_login" -> "''",
      "ftp_password" -> "''", "ftp_protocol" -> "''")
    val autoIO = Seq(
      SetCols("automated_import", blank + ("src_path" -> "''")),
      SetCols("automated_export", blank))

    // db.py:407-416 (the reference calls activate_autosync db.py:539-550
    // and then repeats the same two idempotent statements inline; one
    // application is semantically identical)
    val autosync = if (!cfg.autosync) Nil else Seq(
      SetCols("ir_cron", Map("active" -> "true",
        "interval_type" -> "'hours'", "interval_number" -> "2",
        "nextcall" -> "TIMESTAMP '2024-01-01 01:00:00'"), // literal, not now()
        Some("model = 'sync.client.entity' AND function = 'sync_threaded'")),
      SetCols("sync_client_sync_server_connection",
        Map("host" -> "'127.0.0.1'", "database" -> lit(ss))))

    val silent = if (!cfg.silentUpgrade) Nil else Seq(
      SetCols("sync_client_sync_server_connection",
        Map("automatic_patching" -> "true"))) // db.py:422

    // db.py:420-423
    val hide = if (cfg.hideGroups.isEmpty) Nil else
      Truncate("ir_ui_view_sc") +: cfg.hideGroups.flatMap(g => Seq(
        SetCols("res_groups", Map("visible_res_groups" -> "false"),
          Some(s"lower(name) = lower(${lit(g)})")),
        DeleteWhere("res_groups_users_rel",
          "gid IN (SELECT id FROM res_groups WHERE visible_res_groups = false)")))

    val branding =
      cfg.logoB64.map(l => SetCols("res_company", Map("logo" -> lit(l)))).toSeq ++
      cfg.banner.map(b => SetCols("communication_config",
        Map("message" -> lit(b)))).toSeq // db.py:426-429

    // db.py:437
    val backup = Seq(SetCols("backup_config", Map(
      "beforemanualsync" -> "false", "beforepatching" -> "false",
      "aftermanualsync" -> "false", "beforeautomaticsync" -> "false",
      "afterautomaticsync" -> "false", "scheduledbackup" -> "false",
      "name" -> lit(cfg.backupDir))))

    // db.py:441-451 — password stomping
    val passwords =
      cfg.usersPw.map(pw => SetCols("res_users",
        Map("password" -> lit(pw)), Some("id <> 1"))).toSeq ++
      cfg.pwList.map { case (user, pw) => SetCols("res_users",
        Map("password" -> lit(pw)), Some(s"login = ${lit(user)}")) } ++
      cfg.adminPw.map(pw => SetCols("res_users",
        Map("password" -> lit(pw)), Some("id = 1"))).toSeq

    // db.py:523-533 — admin rename + inactive users (skipped on nopwreset)
    val finale = if (cfg.noPwReset) Nil else
      SetCols("res_users", Map("login" -> lit(adminuser)),
        Some("id = 1")) +:
      (if (!cfg.inactiveUsers) Nil else Seq(
        SetCols("res_users", Map("active" -> "false"),
          Some(s"login NOT IN ('synch', ${lit(adminuser)})"))))

    sync ++ crons ++ autoIO ++ autosync ++ silent ++ hide ++ branding ++
      backup ++ passwords ++ finale
  }

  /** The one cross-table rule shape in the suite: db.py:423's membership
    * delete references res_groups from res_groups_users_rel. Matched
    * textually so the rule list stays plain data.
    */
  private val HideGroupsDelete =
    "gid IN (SELECT id FROM res_groups WHERE visible_res_groups = false)"

  /** Apply rules functionally: each table's DataFrame is rewritten in rule
    * order; the result map carries the sanitized frames. Cross-table rules
    * (the hidegroups membership delete) resolve their referenced table from
    * the current map state.
    */
  def apply(tables: Map[String, DataFrame], rules: Seq[Rule]): Map[String, DataFrame] =
    rules.foldLeft(tables) { (acc, rule) =>
      acc.get(rule.table) match {
        case None => acc // missing table tolerated, like ignored psql rc
        case Some(df) => acc + (rule.table -> applyOne(df, rule, acc))
      }
    }

  /** True when every plain column reference in `condSql` resolves against
    * `df` (case-insensitive, like Spark's resolver). The psql-tolerance
    * contract (ignored statement rc, db.py passim) covers a WHERE naming a
    * column an old backup's schema lacks — such a rule must SKIP, not
    * abort the whole sanitization with an AnalysisException.
    */
  private def condResolves(df: DataFrame, condSql: String): Boolean = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    val cols = df.columns.map(_.toLowerCase).toSet
    // parse directly (not via expr(): the Column wrapper defers parsing, so
    // its tree is not traversable for references)
    df.sparkSession.sessionState.sqlParser.parseExpression(condSql).collect {
      case ua: UnresolvedAttribute => ua.name.toLowerCase
    }.forall(cols.contains)
  }

  private def applyOne(df: DataFrame, rule: Rule,
                       tables: Map[String, DataFrame]): DataFrame = rule match {
    case SetCols(_, sets, where) =>
      if (!where.forall(condResolves(df, _))) df // unresolvable cond: skip rule
      else {
        val cond = where.map(expr).getOrElse(org.apache.spark.sql.functions.lit(true))
        sets.foldLeft(df) { case (d, (c, v)) =>
          // target column AND value-expression references must resolve —
          // a value naming a column the backup lacks is the same
          // ignored-rc class as a bad WHERE
          if (!d.columns.contains(c) || !condResolves(d, v)) d
          else d.withColumn(c, when(cond, expr(v).cast(d.schema(c).dataType))
            .otherwise(col(c)))
        }
      }
    case DeleteWhere(_, HideGroupsDelete) =>
      tables.get("res_groups")
        .filter(_.columns.map(_.toLowerCase).contains("visible_res_groups"))
        .fold(df)(g => applyHideGroups(df, g))
    case DeleteWhere(_, where) =>
      if (!condResolves(df, where)) df // unresolvable cond: skip rule
      else df.filter(!coalesce(expr(where), org.apache.spark.sql.functions.lit(false)))
    case SetColScalar(_, c, fromTable, sel, where) =>
      tables.get(fromTable) match {
        case None => df // missing source table: skip, like ignored psql rc
        case Some(src) =>
          if (!df.columns.contains(c) || !condResolves(src, where) ||
              !condResolves(src, sel)) df
          else {
            // Postgres semantics: 0 rows → NULL, >1 rows → runtime error
            // ("more than one row returned by a subquery"). limit(2) bounds
            // the driver read to two rows — same bounded-collect class as
            // the Bloom build, never corpus-sized.
            val rows = src.filter(expr(where)).select(expr(sel)).limit(2).collect()
            if (rows.length > 1) throw new IllegalStateException(
              s"scalar subquery over '$fromTable' WHERE $where returned " +
                "more than one row")
            val v = if (rows.isEmpty) null else rows(0).get(0)
            df.withColumn(c, org.apache.spark.sql.functions.lit(v)
              .cast(df.schema(c).dataType))
          }
      }
    case Truncate(_) => df.limit(0)
    case AddColumnIfAbsent(_, c, from) =>
      if (df.columns.contains(c)) df
      else if (!df.columns.contains(from)) df
      else df.withColumn(c, col(from))
  }

  /** The hidegroups membership delete (db.py:423) as a real anti-join:
    * drop rel rows whose gid belongs to a hidden group (OP-18 IN-subquery
    * shape).
    */
  def applyHideGroups(rels: DataFrame, groups: DataFrame): DataFrame =
    rels.join(
      broadcast(groups.filter(col("visible_res_groups") === false)
        .select(col("id").as("gid"))),
      Seq("gid"), "left_anti")
      .select(rels.columns.map(col).toSeq: _*) // keep original column order

  /** createusers (db.py:475-515): explode the `u:p:g1,g2;…` spec into user
    * rows and membership rows. Ids are generated as maxExisting + dense
    * 1-based index (the analog of `RETURNING id`, with the +1000 headroom
    * idea applied by callers via `idBase`). The spec is a driver-side
    * string, so the ids are assigned in plain Scala — no global-window
    * single-partition sort ever enters the plan.
    */
  def createUsers(spark: SparkSession, spec: String, existingUsers: DataFrame,
                  resGroups: DataFrame, defaultPw: String,
                  idBase: Option[Long] = None): (DataFrame, DataFrame) = {
    import spark.implicits._
    val parsedRows = spec.split(";").toSeq.map { entry =>
      val p = entry.split(":")
      p.length match {
        case 6 => (p(0), p(1), p(4), p(5)) // user, name, pass, groups
        case 3 => (p(0), p(0), p(1), p(2))
        case n if n >= 2 => (p(0), p(0), defaultPw, p(1)) // reference else-branch
        case _ =>
          // the reference's else-branch reads index 1 unguarded and
          // IndexErrors on a colon-less entry (db.py:493-495); fail with
          // the offending entry named instead (DIVERGENCES #17)
          throw new IllegalArgumentException(
            s"createusers entry '$entry' has no ':group' part " +
              "(expected user:groups, user:pass:groups, or the 6-field form)")
      }
    }
    val base: Long = idBase.getOrElse {
      val m = existingUsers.agg(max(col("id"))).head().get(0)
      if (m == null) 0L else m.toString.toLong
    }
    val newUsers = parsedRows.sortBy(_._1).zipWithIndex
      .map { case ((login, name, pw, groups), i) =>
        (login, name, pw, groups, base + i + 1)
      }
      .toDF("login", "name", "password", "groups", "id")
      .withColumn("login", lower(col("login")))
      .withColumn("active", org.apache.spark.sql.functions.lit(true))
      .withColumn("context_lang", org.apache.spark.sql.functions.lit("en_MF"))
      .withColumn("company_id", org.apache.spark.sql.functions.lit(1))
    val rels = newUsers
      .select(col("id").as("uid"), explode(split(col("groups"), ",")).as("gname"))
      .join(broadcast(resGroups.select(col("id").as("gid"), col("name").as("gname"))),
        Seq("gname"))
      .select("uid", "gid")
    (newUsers.drop("groups"), rels)
  }

  /** The `[pos+add]` derived-password template (db.py:459-473, OP-44):
    * digits spliced from db-name characters. Pure driver-side string fn —
    * the distributed Column form is probes.Probes.q19's expression.
    */
  def renderPasswordTemplate(template: String, dbName: String): String = {
    val pat = "\\[(\\d+)\\+(\\d+)\\]".r
    pat.replaceAllIn(template, m => {
      val pos = m.group(1).toInt - 1
      val add = m.group(2).toInt
      ((math.max(dbName.charAt(pos).toLower.toInt, 96) - 96) + add).toString
    })
  }
}
