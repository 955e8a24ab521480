package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Name-derivation operators (SURVEY.md OP-10/11/33, FIXTURES.md §B.2).
  *
  * Semantics re-expressed from the reference's pure functions:
  *  - fileToDb:      /root/reference/ufload/cli/main.py:67-82
  *  - dbToInstance:  /root/reference/ufload/db.py:623-634
  *  - versionKey:    /root/reference/ufload/cli/main.py:554
  *  - matchAnyWildcard: /root/reference/ufload/cloud.py:144-159
  *
  * Each operator exists twice: as a pure Scala function (driver-side use +
  * unit-test vectors) and as a Catalyst `Column` expression built from
  * codegen'd built-ins (the distributed form — no UDFs, so predicate
  * pushdown and whole-stage codegen stay intact).
  *
  * Divergence note (SURVEY.md §7.4): the reference would raise IndexError for
  * 2-token filenames at main.py:74 (`len(x[2])` unguarded); we guard with
  * `size(x) >= 3` and fall through to the basename-minus-5-chars branch.
  */
object Naming {

  // ---- pure forms -------------------------------------------------------

  /** `OCG_MM1_WA-20160831-220427-…dump` -> `OCG_MM1_WA_20160831_2204`. */
  def fileToDb(fn: String, prefix: Option[String] = None,
               nosuffix: Boolean = false): String = {
    val base = fn.substring(fn.lastIndexOf('/') + 1)
    val x = base.split("-", -1)
    val db =
      if (x.nonEmpty && nosuffix) x(0)
      else if (x.length >= 3 && x(2).length == 6)
        Seq(x(0), x(1), x(2).substring(0, 4)).mkString("_")
      else base.dropRight(5)
    prefix.fold(db)(p => s"${p}_$db")
  }

  /** `OCG_KG1_OSH_20161116_0102` -> `OCG_KG1_OSH` (drop last two tokens). */
  def dbToInstance(db: String, prefix: Option[String] = None,
                   syncServer: String = "SYNC_SERVER_LOCAL"): String = {
    // drop = Python's db[len(prefix)+1:] slice (db.py:625): never throws on
    // short names (yields ""), same mangling of non-prefixed names — exact
    // reference parity; substring would StringIndexOutOfBounds on a stray
    // short catalog entry and abort the GC pass
    val stripped = prefix.fold(db)(p => db.drop(p.length + 1))
    if (stripped.startsWith(syncServer)) syncServer
    else stripped.split("_", -1).dropRight(2).mkString("_")
  }

  /** Version-capture patterns. The reference applies the same natural-
    * version sort to two artifact families, each with its own capture
    * regex searched case-insensitively: upgrade patches (main.py:554) and
    * user-rights zips (main.py:718 — whose final dot is unescaped there;
    * mirrored verbatim).
    */
  val PatchZipPattern: String = "(?i)uf(.+?)\\.patch\\.zip"
  val UserRightsPattern: String = "(?i)User Rights v(.+?).zip"

  /** `uf2.1-2p3.patch.zip` -> Seq(2,1,2,3); element-wise ordering.
    * Case-insensitive like the reference (main.py:554 applies re.I) — real
    * artifacts carry uppercase `UF2.1` names, and a case-sensitive miss
    * would silently fall back to lexicographic order (UF10 before UF2).
    * `pattern` selects the artifact family (capture group 1 = the version
    * text); defaults to the patch-zip shape.
    */
  def versionKey(file: String,
                 pattern: String = PatchZipPattern): Seq[Int] = {
    val m = pattern.r.findFirstMatchIn(file)
    m.map(_.group(1).split("[.pP-]").filter(_.nonEmpty).toSeq.map(_.toInt))
      .getOrElse(Seq.empty)
  }

  /** True if any comma-separated pattern is a substring; empty matches all.
    * An empty sub-pattern (trailing comma) is a substring of everything —
    * Python split keeps empty tokens, so `split(",", -1)` mirrors the
    * reference exactly.
    */
  def matchAnyWildcard(patterns: Seq[String], x: String): Boolean =
    patterns.isEmpty ||
      patterns.exists(_.split(",", -1).exists(p => x.contains(p)))

  // ---- Column forms (pure built-ins, codegen-friendly) ------------------

  def fileToDbCol(fn: Column, prefix: Option[String] = None,
                  nosuffix: Boolean = false): Column = {
    val base = element_at(split(fn, "/"), -1)
    val x = split(base, "-")
    val joined = concat_ws("_",
      element_at(x, 1), element_at(x, 2),
      substring(element_at(x, 3), 1, 4))
    val db =
      if (nosuffix) element_at(x, 1)
      else when(size(x) >= 3 && length(element_at(x, 3)) === 6, joined)
        .otherwise(base.substr(lit(1), length(base) - 5))
    prefix.fold(db)(p => concat(lit(p + "_"), db))
  }

  def dbToInstanceCol(db: Column, prefix: Option[String] = None,
                      syncServer: String = "SYNC_SERVER_LOCAL"): Column = {
    val stripped = prefix.fold(db)(p => db.substr(lit(p.length + 2), length(db)))
    val toks = split(stripped, "_")
    when(stripped.startsWith(syncServer), lit(syncServer))
      .otherwise(array_join(
        slice(toks, lit(1), greatest(size(toks) - 2, lit(0))), "_"))
  }

  /** array<int> natural-version sort key from an artifact filename. Empty
    * tokens are dropped (matching the pure form): a non-matching filename
    * yields an EMPTY array, not `[null]`. Case-insensitive (re.I parity
    * with main.py:554/:718); `pattern` selects the artifact family.
    */
  def versionKeyCol(file: Column,
                    pattern: String = PatchZipPattern): Column =
    transform(
      filter(split(regexp_extract(file, pattern, 1), "[.pP-]"),
        t => t =!= ""),
      x => x.cast("int"))

  /** OR-fold of substring containment over literal patterns (OP-12).
    * Same empty-token semantics as the pure form: an empty sub-pattern
    * (or empty pattern list) matches everything.
    */
  def matchAnyWildcardCol(x: Column, patterns: Seq[String]): Column = {
    val pats = patterns.flatMap(_.split(",", -1))
    if (pats.isEmpty || pats.exists(_.isEmpty)) lit(true)
    else pats.map(p => x.contains(lit(p))).reduce(_ || _)
  }
}
