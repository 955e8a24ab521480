package graft

import org.apache.spark.sql.functions._
import graft.core.Naming

/** Vectors from the reference's own unit tests (the only published ground
  * truth): /root/reference/ufload/test_db.py:11-21,
  * /root/reference/ufload/cli/test_main.py:7-12,
  * /root/reference/ufload/test_cloud.py:3-8.
  *
  * Divergence (SURVEY.md §5): test_main.py expects `_file_to_db(…,
  * "wrong.dump") is None`, but the None-guard is commented out at
  * main.py:70-71 — HEAD returns basename minus 5 chars. We follow HEAD
  * ("derive truth from code, not tests").
  */
class NamingSpec extends SparkSpec {

  test("dbToInstance reference vectors") {
    assert(Naming.dbToInstance("OCG_KG1_OSH_20161116_0102") == "OCG_KG1_OSH")
    assert(Naming.dbToInstance("prod_OCG_KG1_OSH_20161116_0102", Some("prod")) == "OCG_KG1_OSH")
    assert(Naming.dbToInstance("prod_OCBZW160_20161116_0102", Some("prod")) == "OCBZW160")
    assert(Naming.dbToInstance("prod_BD_DHK_OCA_20161116_0102", Some("prod")) == "BD_DHK_OCA")
    assert(Naming.dbToInstance("prod_HQ_OCA_20161116_0102", Some("prod")) == "HQ_OCA")
  }

  test("dbToInstance sync-server passthrough") {
    assert(Naming.dbToInstance("SYNC_SERVER_LOCAL_X_Y") == "SYNC_SERVER_LOCAL")
  }

  test("fileToDb reference vector") {
    assert(Naming.fileToDb("../foo/OCG_MM1_WA-20160831-220427-A-UF2.1-2p3.dump",
      Some("pfx")) == "pfx_OCG_MM1_WA_20160831_2204")
    // HEAD-behavior divergence from the stale reference test (returns a name,
    // not None):
    assert(Naming.fileToDb("wrong.dump", Some("pfx")) == "pfx_wrong")
    assert(Naming.fileToDb("A-B-C.dump", nosuffix = true) == "A")
  }

  test("versionKey natural order") {
    assert(Naming.versionKey("uf2.1-2p3.patch.zip") == Seq(2, 1, 2, 3))
    assert(Naming.versionKey("uf10.0.patch.zip") == Seq(10, 0))
    // re.I parity (main.py:554): real artifacts use uppercase UF names
    assert(Naming.versionKey("UF2.1-2P3.patch.zip") == Seq(2, 1, 2, 3))
    // element-wise: uf2.2 < uf10.0
    val ord = Ordering.Implicits.seqOrdering[Seq, Int]
    assert(ord.lt(Naming.versionKey("uf2.2.patch.zip"),
      Naming.versionKey("uf10.0.patch.zip")))
  }

  test("matchAnyWildcard reference vector") {
    val wild = Seq("SZ1_NHL", "OCG_UG")
    assert(!Naming.matchAnyWildcard(wild, "other"))
    assert(Naming.matchAnyWildcard(wild, "OCG_SZ1_NHL-Wed.zip"))
    assert(Naming.matchAnyWildcard(wild, "OCG_UG2_SUKA-Fri.zip"))
    assert(Naming.matchAnyWildcard(Seq.empty, "anything")) // empty matches all
    // trailing comma → empty sub-pattern → matches everything (Python
    // split keeps empty tokens; reference cloud.py:144-148)
    assert(Naming.matchAnyWildcard(Seq("ZZZ,"), "other"))
  }

  test("versionKey(Col) of a non-patch filename is empty, not [null]") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    assert(Naming.versionKey("readme.txt").isEmpty)
    val got = Seq("readme.txt", "uf2.1.patch.zip").toDF("fn")
      .select(Naming.versionKeyCol(col("fn")).as("k"))
      .as[Seq[Int]].collect().toSeq
    assert(got == Seq(Seq.empty, Seq(2, 1)))
  }

  test("Column forms agree with pure forms") {
    import spark.implicits._
    val files = Seq(
      "../foo/OCG_MM1_WA-20160831-220427-A-UF2.1-2p3.dump",
      "wrong.dump",
      "OCA_ABC_X-20240101-123456-B.dump")
    val got = files.toDF("fn")
      .select(Naming.fileToDbCol(col("fn"), Some("pfx")).as("db"))
      .as[String].collect().toSeq
    assert(got == files.map(f => Naming.fileToDb(f, Some("pfx"))))

    val dbs = Seq("OCG_KG1_OSH_20161116_0102", "SYNC_SERVER_LOCAL_A_B")
    val got2 = dbs.toDF("db")
      .select(Naming.dbToInstanceCol(col("db")).as("i")).as[String].collect().toSeq
    assert(got2 == dbs.map(d => Naming.dbToInstance(d)))

    val pats = Seq("SZ1_NHL,OCG_UG")
    val xs = Seq("other", "OCG_SZ1_NHL-Wed.zip")
    val got3 = xs.toDF("x")
      .select(Naming.matchAnyWildcardCol(col("x"), pats).as("m"))
      .as[Boolean].collect().toSeq
    assert(got3 == Seq(false, true))
  }
}
