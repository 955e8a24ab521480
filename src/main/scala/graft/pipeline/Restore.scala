package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Naming, Ops}

/** Staging-write + atomic-swap publish and sibling GC — the Spark analog of
  * the reference's restore commit protocol:
  *
  *  - stage under `<db>_staging_<token>` (db.py:101 `db + "_" + pid`)
  *  - publish by atomic rename over the final name (db.py:186-188
  *    `ALTER DATABASE … RENAME`), dropping any previous incarnation first
  *    (db.py:179-184)
  *  - on failure, remove the staging dir (db.py:202-208 cleanup)
  *  - GC: keep only the newest database per instance (db.py:660-677,
  *    193-199 — OP-31)
  *
  * Works through the Hadoop FileSystem API so the same protocol runs on any
  * cluster FS. On object stores without atomic rename, use the
  * commit-marker variant ([[publishVersioned]] / [[resolveVersioned]] /
  * [[gcUnreferenced]]) — only a single-object pointer write needs
  * atomicity there.
  */
object Restore {

  val DbNameRegex = "^[A-Z0-9_]{5,}_[0-9]{8}_[0-9]{4}$" // db.py:639

  /** Write `df` under warehouse/<staging>, then atomically move to
    * warehouse/<db>. Returns the final path.
    *
    * Crash-safety: the old incarnation is moved ASIDE (not deleted) before
    * the swap and only dropped after the new data is in place — a failed
    * rename rolls the old copy back, so no failure mode loses both copies.
    */
  def publish(spark: SparkSession, df: DataFrame, warehouse: String,
              db: String, token: String = "staging"): Path = {
    val fs = new Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(warehouse, s"${db}__${token}")
    val target = new Path(warehouse, db)
    val aside = new Path(warehouse, s"${db}__old__${token}")
    var movedAside = false
    try {
      df.write.mode("overwrite").parquet(staging.toString)
      if (fs.exists(aside) && !fs.exists(target)) {
        // previous run crashed mid-swap: aside holds the ONLY copy of the
        // old incarnation — restore it BEFORE anything is deleted (deleting
        // the "stale" aside here would leave a window where a failed
        // staging rename loses every copy)
        if (!fs.rename(aside, target))
          throw new java.io.IOException(s"recovery rename $aside -> $target failed")
      } else if (fs.exists(aside)) {
        fs.delete(aside, true) // target exists too: aside is truly redundant
      }
      if (fs.exists(target)) {
        if (!fs.rename(target, aside))
          throw new java.io.IOException(s"rename $target -> $aside failed")
        movedAside = true
      }
      if (!fs.rename(staging, target))
        throw new java.io.IOException(s"rename $staging -> $target failed")
      if (movedAside) fs.delete(aside, true) // old copy dropped only now
      target
    } catch {
      case e: Throwable =>
        if (movedAside && !fs.exists(target)) fs.rename(aside, target) // roll back
        if (fs.exists(staging)) fs.delete(staging, true) // crash cleanup
        throw e
    }
  }

  /** Commit-marker publish — the object-store variant of [[publish]] for
    * stores WITHOUT atomic directory rename (S3-style): directory renames
    * there are O(objects) copies and non-atomic, so the swap protocol above
    * would expose readers to half-renamed states. Instead:
    *
    *  - data is written to an immutable VERSIONED dir
    *    `<db>__v<token>` (never renamed, never mutated);
    *  - the pointer `<db>.commit` — a single small object naming the
    *    current version dir — is swapped via write-to-`.commit.tmp` then
    *    single-FILE rename (atomic on HDFS/local; on S3-style stores
    *    configure the committer to PUT the final object directly — only
    *    the POINTER object ever needs atomicity);
    *  - readers [[resolveVersioned]] the pointer and read an immutable
    *    dir — a concurrent publish is invisible until the pointer lands;
    *    if a crash leaves the tmp but no marker, the tmp is honored as
    *    the pointer (its data dir was fully written before the tmp);
    *  - the previous version dir is RETAINED after the pointer swap (its
    *    mtime refreshed to the supersede moment) and collected later by
    *    [[gcUnreferenced]] behind the GRACE PERIOD — so a reader that
    *    resolved the old pointer an instant before the swap can finish a
    *    long scan without FileNotFound mid-job. The same grace protects
    *    an in-flight publish's dir (written, pointer not yet landed)
    *    from being mistaken for residue.
    *
    * This is the Delta/Iceberg pointer-commit shape reduced to ufload's
    * one-current-version-per-db semantics (no history, no manifest —
    * the reference keeps exactly one live db per instance, db.py:660-677).
    */
  def publishVersioned(spark: SparkSession, df: DataFrame, warehouse: String,
                       db: String, token: String): Path =
    publishVersionedDir(spark, warehouse, db, token) { versioned =>
      df.write.mode("overwrite").parquet(versioned.toString)
    }

  /** [[publishVersioned]] for MULTI-FILE artifacts — an index directory
    * with several tables (IVF centroids + assigned, BM25
    * postings/terms/meta): `build` populates the immutable version dir
    * in any layout, then the identical commit-marker swap makes it the
    * current version. The [[graft.pipeline.Maintain]] retrain/compact
    * operators publish through this.
    */
  def publishVersionedDir(spark: SparkSession, warehouse: String,
                          db: String, token: String)(
      build: Path => Unit): Path = {
    val fs = new Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versioned = new Path(warehouse, s"${db}__v$token")
    require(!fs.exists(versioned),
      s"publishVersioned: version dir $versioned already exists — tokens " +
        "must be unique per publish (immutable version dirs)")
    val prev = resolveVersioned(spark, warehouse, db)
    build(versioned)
    val marker = new Path(warehouse, s"$db.commit")
    // PER-PUBLISH tmp (token-unique) + OVERWRITE rename, NOT
    // create(marker, overwrite=true) and NOT delete-then-rename:
    // create-overwrite TRUNCATES the live pointer before writing (a crash
    // mid-write tears it), a shared tmp lets racing publishers consume
    // each other's rename source, and an explicit delete step opens a
    // marker-absence window. FileContext.rename(OVERWRITE) is the one
    // atomic step — last-writer-wins, the marker file always exists once
    // first published. (On S3-style stores swap this for a direct PUT of
    // the final object — the store's own atomic single-object write.)
    //
    // MARKER IO IS CHECKSUM-FREE on local filesystems: LocalFileSystem
    // (a ChecksumFileSystem) emulates overwrite-rename as delete + two
    // renames (data, .crc sidecar) — interleaved publishers corrupt each
    // other (FileAlreadyExists on the dest, or a marker whose data and
    // .crc disagree until the next swap), found by the racing-publisher
    // property. The RAW local filesystem's rename is POSIX rename(2),
    // which atomically replaces an existing destination — true
    // last-writer-wins, no sidecar to tear. HDFS-like stores are not
    // checksum-wrapped and keep FileContext.rename(OVERWRITE), their own
    // atomic swap. [[markerFs]] picks the flavor; readPointer reads
    // through the same one so no .crc is ever consulted for markers.
    val tmp = new Path(warehouse, s"$db.commit.tmp.$token")
    val mfs = markerFs(fs)
    val out = mfs.create(tmp, true)
    try out.write(versioned.getName.getBytes("UTF-8")) finally out.close()
    if (mfs ne fs) {
      if (!mfs.rename(tmp, marker))
        throw new java.io.IOException(s"marker swap failed: $tmp -> $marker")
    } else {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        new Path(warehouse).toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, marker, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    // The superseded dir is NOT deleted here: a reader that resolved the
    // old pointer just before the swap may still be mid-scan. Refresh its
    // mtime so [[gcUnreferenced]]'s grace window restarts from the
    // SUPERSEDE moment (dir mtime is otherwise the original publish time,
    // which is already aged) — readers get a full graceMs of retention and
    // GC does the actual cleanup. (A crash before setTimes leaves the old
    // mtime; that dir falls in the next sweep — same exposure as any
    // crash residue, documented in gcUnreferenced.)
    val now = System.currentTimeMillis()
    prev.filter(p => p.getName != versioned.getName)
      .foreach(p => try fs.setTimes(p, now, now) catch {
        case _: java.io.IOException => () // store without setTimes: dir
          // stays collectible by age alone — no worse than pre-swap state
      })
    versioned
  }

  /** Current version dir of `db` under the commit-marker protocol, or None
    * when never published (or the marker names a vanished dir — a lost
    * pointer is surfaced as absence, not a read of stale data). Only the
    * MARKER is consulted: tmps are unreferenced publish scratch (a tmp
    * fallback could resurrect a crashed publish's half-dead version long
    * after newer publishes superseded it), and since the swap is an
    * overwrite-rename the marker never disappears once first published.
    */
  /** Stage-checkpoint config guard: a resumable funnel's committed
    * stage frames are only valid under the config that produced them,
    * so the store root carries a fingerprint file. A fresh (non-resume)
    * run (re)defines it; a resume run must match it — resuming against
    * a store committed under different thresholds/stages fails loudly
    * instead of silently reading stale frames into wrong funnel counts.
    */
  def guardConfigFingerprint(spark: SparkSession, warehouse: String,
                             fingerprint: String, resume: Boolean): Unit = {
    val p = new Path(warehouse, "_config_fingerprint")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (resume) {
      require(fs.exists(p),
        s"resume=true but no config fingerprint at $p — the store " +
          "predates the fingerprint guard or is not a stage-checkpoint " +
          "store; rerun fresh (resume=false) to define it")
      val in = fs.open(p)
      val stored =
        try new String(org.apache.hadoop.io.IOUtils
          .readFullyToByteArray(in), "UTF-8").trim
        finally in.close()
      require(stored == fingerprint,
        s"resume=true against a stage-checkpoint store committed under " +
          s"a DIFFERENT config (stored $stored, current $fingerprint) — " +
          "resumed stage frames would be stale; rerun fresh into a new " +
          "dir or restore the original config")
    } else {
      val out = fs.create(p, true)
      try out.write((fingerprint + "\n").getBytes("UTF-8"))
      finally out.close()
    }
  }

  def resolveVersioned(spark: SparkSession, warehouse: String,
                       db: String): Option[Path] = {
    val fs = new Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    readPointer(fs, new Path(warehouse, s"$db.commit"), db)
      .map(new Path(warehouse, _)).filter(fs.exists(_))
  }

  /** Defensive pointer read: absent file, a file vanishing between list
    * and open (FileNotFound is a normal race against a publisher, not an
    * error), a torn/empty body, or a name outside `<db>__v*` all read as
    * None — an empty name would otherwise resolve to the WAREHOUSE dir
    * itself (and Path construction rejects empty strings).
    *
    * Marker reads go through [[markerFs]] (raw on local filesystems) so
    * they can never consult a checksum sidecar; EOF mid-read (a racer's
    * swap landing between open and read on a store without atomic
    * replace) also reads as absence-for-this-read — the very next read
    * sees the landed pointer.
    */
  private def readPointer(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                          db: String): Option[String] =
    try {
      val in = markerFs(fs).open(p)
      val name =
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          "UTF-8").trim
        finally in.close()
      Some(name).filter(_.startsWith(s"${db}__v"))
    } catch {
      case _: java.io.FileNotFoundException => None
      case _: org.apache.hadoop.fs.ChecksumException => None
      case _: java.io.EOFException => None
    }

  /** The filesystem flavor used for COMMIT-MARKER files only: the raw
    * (checksum-free) layer of a ChecksumFileSystem, whose local rename is
    * an atomic POSIX replace; any other store is returned as-is. Data
    * files keep their checksummed writes — only the pointer protocol
    * needs single-file atomic replace semantics.
    */
  private def markerFs(fs: org.apache.hadoop.fs.FileSystem)
      : org.apache.hadoop.fs.FileSystem = fs match {
    case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
    case other => other
  }

  /** Collect crash residue of [[publishVersioned]]: version dirs no
    * pointer references (data written, pointer never swapped) and AGED
    * publish tmps (a tmp outliving the grace window belongs to a dead
    * publisher — live ones rename theirs within one publish). `graceMs`
    * guards the race with a LIVE publisher: anything younger than the
    * grace window is never collected, because "written, not yet landed"
    * is indistinguishable from residue by state alone (the Iceberg
    * remove-orphan-files posture — age, not state, separates in-flight
    * from dead). Pointer reads tolerate files vanishing mid-sweep (a
    * publisher renaming its tmp is normal, not an error). Marker-
    * referenced dirs are never touched at any age, so a concurrent
    * reader of the current pointer cannot lose data. Aged tmps protect
    * their named dirs for ONE extra sweep (the dir ages past grace too
    * and falls in the next one) — deliberate: never collect a dir in the
    * same sweep that discovered its pointer.
    */
  def gcUnreferenced(spark: SparkSession, warehouse: String,
                     graceMs: Long = 6L * 3600 * 1000): Seq[String] = {
    val fs = new Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(warehouse))) return Seq.empty
    val entries = fs.listStatus(new Path(warehouse)).toSeq
    def dbOf(n: String) = n.takeWhile(_ != '.') // <db>.commit[.tmp.<token>]
    val referenced = entries.filter { e =>
      e.isFile && e.getPath.getName.contains(".commit")
    }.flatMap(e => readPointer(fs, e.getPath, dbOf(e.getPath.getName))).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    def aged(e: org.apache.hadoop.fs.FileStatus) = e.getModificationTime < cutoff
    val staleTmps = entries
      .filter(e => e.isFile && e.getPath.getName.contains(".commit.tmp.") &&
        aged(e))
      .map(_.getPath.getName)
    val victims = entries
      .filter(e => e.isDirectory && e.getPath.getName.contains("__v") &&
        !referenced.contains(e.getPath.getName) && aged(e))
      .map(_.getPath.getName)
    (victims ++ staleTmps).foreach(v =>
      fs.delete(new Path(warehouse, v), true))
    victims ++ staleTmps
  }

  /** Catalog scan (OP-6): one row per published db dir under warehouse. */
  def catalog(spark: SparkSession, warehouse: String): DataFrame = {
    import spark.implicits._
    val fs = new Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dbs =
      if (!fs.exists(new Path(warehouse))) Seq.empty[String]
      else fs.listStatus(new Path(warehouse)).toSeq
        .filter(_.isDirectory).map(_.getPath.getName)
    dbs.toDF("db")
  }

  /** OP-14 validation: dbs that are NOT valid `INSTANCE_YYYYMMDD_HHMM`
    * names (and not sync-server dbs) — the `clean` command's victims.
    */
  def invalidDbs(cat: DataFrame, prefix: Option[String] = None): DataFrame = {
    val stripped = prefix.fold(col("db"))(p =>
      when(col("db").startsWith(p + "_"),
        col("db").substr(lit(p.length + 2), length(col("db")))).otherwise(col("db")))
    cat.withColumn("bare", stripped)
      .filter(!col("bare").rlike(DbNameRegex) && !col("bare").contains("SYNC"))
      .drop("bare")
  }

  /** OP-31 keep-newest GC: for each instance, victims = every db but the
    * newest (suffix `YYYYMMDD_HHMM` sorts lexicographically = temporally).
    */
  def gcVictims(cat: DataFrame, prefix: Option[String] = None): DataFrame = {
    val withInstance = cat.withColumn("instance",
      Naming.dbToInstanceCol(col("db"), prefix))
    Ops.victimsPerGroup(withInstance, Seq("instance"), Seq(col("db").desc))
  }

  /** Delete victim dirs. Driver-side fold over a tiny catalog frame. */
  def dropDbs(spark: SparkSession, warehouse: String, victims: Seq[String]): Unit = {
    val fs = new Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    victims.foreach(db => fs.delete(new Path(warehouse, db), true))
  }

  /** OP-49 size-based change detection: skip reload when the stored length
    * matches (db.py:695-711 `about` table ↔ content-length).
    */
  def needsReload(storedLength: Option[Long], remoteLength: Long): Boolean =
    !storedLength.contains(remoteLength)

  /** Column form of [[needsReload]] for set-oriented catalog sweeps
    * (q114): NULL stored length (nothing recorded) and a mismatch both
    * need the reload — exactly `!storedLength.contains(remote)`, as the
    * null-safe-equality negation. Parity with the scalar form is
    * spec-pinned.
    */
  def needsReloadCol(stored: org.apache.spark.sql.Column,
                     remote: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    !(stored <=> remote)

  /** Outcome row of one [[run]] candidate attempt. status ∈
    * restored | exists | invalid | badname | failed.
    */
  case class Attempt(instance: String, file: String, db: String, status: String)

  /** One suppressed side effect in show mode (`-n`, main.py:796): what the
    * run WOULD have executed. `plan` carries the physical plan of the frame
    * a `publish` would write (plans are computed without executing — the
    * "explain" half of the reference's "Would run: …" lines, db.py:13-15).
    */
  case class Action(op: String, target: String, plan: String = "")

  /** `db` with the warehouse prefix stripped (for name validation). */
  private def bareDb(db: String, prefix: Option[String]): String =
    prefix.filter(p => db.startsWith(p + "_")).fold(db)(p => db.drop(p.length + 1))

  /** The end-to-end multi-restore orchestrator — the reference's main
    * command loop (main.py:210-397) over the library's own operators:
    *
    * inventory → wildcard include/exclude (OP-12/13) → auto-upload gate
    * (OP-15) → per-instance newest-first candidates (OP-30/32) → for each
    * candidate: peek/validate the payload, derive the db from the INNER
    * dump name (main.py:317-318 — `_file_to_db(str(n))`, not the zip name),
    * validate it (db.py:639 regex), skip the instance if the db already
    * exists (main.py:320-323 `break`), else sanitize + staged publish;
    * first success moves to the next instance (main.py:367 `break`), a
    * corrupt payload falls through to the next-newest candidate
    * (main.py:309-313 `continue`). Afterwards: per-db notify hook
    * (main.py:358-359) and optional keep-newest sibling GC.
    *
    * `fetch(url, file)` is the injected download+unzip connector: returns
    * the inner dump name and its loaded DataFrame, or None for an invalid
    * payload (bad zip / no dump inside). IO stays behind this boundary;
    * the fold itself is driver-side over the tiny listing frame (the
    * inventory is metadata — payload bytes never transit the driver).
    *
    * `show = true` is the reference's `-n` dry-run (main.py:796,
    * db.py:13-15): every DB-side mutation — publish, GC drop, the notify
    * hook — is suppressed and reported through `onAction` instead, with
    * the publish actions carrying the physical plan that WOULD have been
    * written. Control flow is unchanged (a shown publish counts as the
    * reference's vacuous `rc = 0` success, so the instance completes and
    * later candidates are skipped exactly as in a real run). `fetch` still
    * runs — the reference's `-n` gates its `_run` psql layer, not
    * downloads.
    */
  def run(spark: SparkSession, inventory: DataFrame, warehouse: String,
          fetch: (String, String) => Option[(String, DataFrame)],
          include: Seq[String] = Nil, exclude: Seq[String] = Nil,
          prefix: Option[String] = None,
          sanitize: DataFrame => DataFrame = identity,
          gc: Boolean = true,
          onRestored: String => Unit = _ => (),
          show: Boolean = false,
          onAction: Action => Unit = _ => ()): Seq[Attempt] = {
    import spark.implicits._
    import graft.sources.Inventory
    val gated = Inventory.autoUploadGate(
      Inventory.filterInstances(inventory, include, exclude))
    val candidates = Inventory.rankedCandidates(gated)
      .select(col("instance"), col("rank"), col("file"), col("url"))
      .as[(String, Int, String, String)]
      .collect().sortBy(t => (t._1, t._2)).toSeq
    val existing = scala.collection.mutable.Set[String](
      catalog(spark, warehouse).as[String].collect().toIndexedSeq: _*)
    val done = scala.collection.mutable.Set[String]()
    val attempts = scala.collection.mutable.ListBuffer[Attempt]()
    for ((instance, _, file, url) <- candidates if !done(instance)) {
      fetch(url, file) match {
        case None => // corrupt/invalid payload: try the next-newest
          attempts += Attempt(instance, file, "", "invalid")
        case Some((innerDump, df)) =>
          val db = Naming.fileToDb(innerDump, prefix)
          if (!bareDb(db, prefix).matches(DbNameRegex))
            attempts += Attempt(instance, file, db, "badname") // main.py:329
          else if (existing(db)) {
            // reference breaks to the next instance when the db exists
            attempts += Attempt(instance, file, db, "exists")
            done += instance
          } else if (show) {
            // dry-run: report the write (with its plan) instead of doing it;
            // vacuous success, like the reference's rc = 0 (db.py:14-15)
            val frame = sanitize(df)
            onAction(Action("publish", db, frame.queryExecution.explainString(
              org.apache.spark.sql.execution.SimpleMode)))
            onAction(Action("notify", db))
            existing += db
            done += instance
            attempts += Attempt(instance, file, db, "restored")
          } else {
            val ok =
              try { publish(spark, sanitize(df), warehouse, db); true }
              catch { case scala.util.control.NonFatal(_) => false }
            if (ok) {
              existing += db
              done += instance
              attempts += Attempt(instance, file, db, "restored")
              // outside the publish try: a throwing user hook must not
              // relabel a committed restore as failed
              onRestored(db) // main.py:358-359 per-restored-db hook (--notify)
            } else attempts += Attempt(instance, file, db, "failed")
          }
      }
    }
    if (gc) {
      // Per-restored-instance clean, like the reference (db.py:660-677):
      // keep each JUST-restored db, drop its siblings. Instances excluded
      // from (or not restored by) this run are untouched — a warehouse-wide
      // keep-newest-name sweep could delete dbs of uninvolved instances,
      // or even the just-restored db when an earlier restore carried a
      // newer-sorting name.
      val keep = attempts.filter(_.status == "restored").map(_.db).toSet
      val restoredInstances = keep.map(db => Naming.dbToInstance(db, prefix))
      val victims = catalog(spark, warehouse).as[String].collect().toSeq
        .filter(db => !keep.contains(db) &&
          restoredInstances.contains(Naming.dbToInstance(db, prefix)))
      if (show) victims.foreach(db => onAction(Action("drop", db)))
      else dropDbs(spark, warehouse, victims)
    }
    attempts.toList
  }
}
