package graft.probes

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core.{Naming, Ops}

/** The declared correctness-probe inventory (SURVEY.md §2.11, Q1–Q26).
  *
  * Each probe is a (Spark DataFrame, DuckDB oracle SQL) pair over the driver
  * testdata; the driver hash-compares them at sf0.01. Determinism rules:
  * total ORDER BY on a unique key; every computed real exits as a scaled
  * BIGINT (`floor(x·10ᵏ + 0.5)` of a bit-identical double — fixed point is
  * representation-stable where DECIMAL-from-double is not, and integer sums
  * are exact and order-independent); DuckDB-side BIGINT sums are wrapped in
  * `CAST(… AS BIGINT)` (bare `sum(BIGINT)` types as HUGEINT there);
  * timestamps are ms-truncated TIMESTAMP_NTZ; all cutoffs are literals.
  */
object Probes {
  private type Q = (SparkSession, String) => DataFrame

  // Wildcard pattern lists used by Q2/Q3 (comma-splittable, OP-12 shape).
  private val IncludePats = Seq("tomer#0000001,tomer#000001")

  /** Fixed-point renderings of computed doubles — every real number crosses
    * the oracle-compare boundary as a scaled BIGINT. Both engines hold
    * bit-identical doubles and `floor` is exact on them; DECIMAL-from-double
    * (`round(x, k)`/`CAST(… AS DECIMAL)`) proved oracle-version-sensitive
    * (13 round-1 hash mismatches).
    */
  private def cents(c: Column): Column = Ops.fixedPoint(c, 2)
  private def e4(c: Column): Column = Ops.fixedPoint(c, 4)

  // ---- Q1 latest-per-group (OP-29/24/32) --------------------------------
  val q01: Q = (s, d) =>
    Ops.latestPerGroup(Tables.events(s, d), Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc))
      .select("user_id", "event_id", "ts")
      .orderBy("user_id")

  val q01Sql: String =
    """SELECT user_id, event_id, date_trunc('milliseconds', ts) AS ts
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id
      |  ORDER BY date_trunc('milliseconds', ts) DESC, event_id DESC) = 1
      |ORDER BY user_id""".stripMargin

  // ---- Q2 wildcard substring filter (OP-12/41) --------------------------
  val q02: Q = (s, d) =>
    Tables.customer(s, d)
      .filter(Naming.matchAnyWildcardCol(lower(col("c_name")), IncludePats))
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  val q02Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE position('tomer#0000001' IN lower(c_name)) > 0
      |   OR position('tomer#000001' IN lower(c_name)) > 0
      |ORDER BY c_custkey""".stripMargin

  // ---- Q3 exclude / except (OP-13/38) -----------------------------------
  val q03: Q = (s, d) => {
    val base = Tables.customer(s, d).select("c_custkey", "c_name")
    val excluded = base.filter(
      Naming.matchAnyWildcardCol(lower(col("c_name")), IncludePats))
    base.join(excluded.select("c_custkey"), Seq("c_custkey"), "left_anti")
      .orderBy("c_custkey")
  }

  val q03Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT (position('tomer#0000001' IN lower(c_name)) > 0
      |        OR position('tomer#000001' IN lower(c_name)) > 0)
      |ORDER BY c_custkey""".stripMargin

  // ---- Q4 filename->db->instance derivation (OP-10/11/39) ---------------
  val q04: Q = (s, d) => {
    val fn = concat(
      regexp_replace(col("p_name"), " ", "_"), lit("-20240101-"),
      lpad((col("p_partkey") % 1000000).cast("string"), 6, "0"),
      lit("-A-UF2.1-2p3.dump"))
    Tables.part(s, d)
      .withColumn("fn", fn)
      .withColumn("db", Naming.fileToDbCol(col("fn"), prefix = Some("pfx")))
      .withColumn("instance", Naming.dbToInstanceCol(col("db"), prefix = Some("pfx")))
      .select("p_partkey", "fn", "db", "instance")
      .orderBy("p_partkey")
  }

  val q04Sql: String =
    """WITH f AS (
      |  SELECT p_partkey,
      |         replace(p_name, ' ', '_') || '-20240101-' ||
      |         lpad(CAST(p_partkey % 1000000 AS VARCHAR), 6, '0') ||
      |         '-A-UF2.1-2p3.dump' AS fn
      |  FROM part),
      |d AS (
      |  SELECT p_partkey, fn,
      |         'pfx_' || string_split(fn, '-')[1] || '_' ||
      |         string_split(fn, '-')[2] || '_' ||
      |         left(string_split(fn, '-')[3], 4) AS db
      |  FROM f)
      |SELECT p_partkey, fn, db,
      |       array_to_string(list_slice(string_split(db[5:], '_'), 1,
      |         len(string_split(db[5:], '_')) - 2), '_') AS instance
      |FROM d ORDER BY p_partkey""".stripMargin

  // ---- Q5 regex gates (OP-14/15/40) -------------------------------------
  val q05: Q = (s, d) => {
    val days = array(Seq("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun", "x1")
      .map(lit): _*)
    Tables.documents(s, d)
      .withColumn("name", concat(lit("INST_"), upper(col("lang")), lit("-"),
        element_at(days, (col("doc_id") % 8).cast("int") + 1), lit(".zip")))
      .withColumn("dbname", concat(
        when(col("doc_id") % 5 === 0, col("lang")).otherwise(upper(col("lang"))),
        lit("_I"), lpad((col("doc_id") % 100).cast("string"), 2, "0"),
        lit("_20240315_"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .withColumn("gate_ok", col("name").rlike("-[A-Z][a-z]{2}\\.zip$"))
      .withColumn("valid_ok", col("dbname").rlike("^[A-Z0-9_]{5,}_[0-9]{8}_[0-9]{4}$"))
      .groupBy("gate_ok", "valid_ok").agg(count(lit(1)).as("cnt"))
      .orderBy("gate_ok", "valid_ok")
  }

  val q05Sql: String =
    """WITH g AS (
      |  SELECT 'INST_' || upper(lang) || '-' ||
      |         (['Mon','Tue','Wed','Thu','Fri','Sat','Sun','x1'])[CAST(doc_id % 8 AS INT) + 1] ||
      |         '.zip' AS name,
      |         (CASE WHEN doc_id % 5 = 0 THEN lang ELSE upper(lang) END) ||
      |         '_I' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
      |         '_20240315_' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS dbname
      |  FROM documents)
      |SELECT regexp_matches(name, '-[A-Z][a-z]{2}\.zip$') AS gate_ok,
      |       regexp_matches(dbname, '^[A-Z0-9_]{5,}_[0-9]{8}_[0-9]{4}$') AS valid_ok,
      |       count(*) AS cnt
      |FROM g GROUP BY 1, 2 ORDER BY gate_ok, valid_ok""".stripMargin

  // ---- Q6 GC victims (OP-31) --------------------------------------------
  val q06: Q = (s, d) =>
    Ops.victimsPerGroup(Tables.events(s, d), Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc))
      .select("user_id", "event_id")
      .orderBy("event_id")

  val q06Sql: String =
    """SELECT user_id, event_id FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id
      |  ORDER BY date_trunc('milliseconds', ts) DESC, event_id DESC) > 1
      |ORDER BY event_id""".stripMargin

  // ---- Q7 incremental merge (OP-21/35/50/51) ----------------------------
  val q07: Q = (s, d) => {
    val all = Tables.orders(s, d)
    val local = all.filter(col("o_orderkey") % 10 < 8).withColumn("src", lit("local"))
    val remote = all.withColumn("src", lit("remote"))
    Ops.antiJoinAppend(local, remote, Seq("o_orderkey"))
      .withColumn("checksum",
        md5(concat(col("o_orderkey").cast("string"), lit("|"), col("o_orderstatus"))))
      .select("o_orderkey", "src", "checksum")
      .orderBy("o_orderkey")
  }

  val q07Sql: String =
    """WITH local AS (SELECT * FROM orders WHERE o_orderkey % 10 < 8),
      |merged AS (
      |  SELECT o_orderkey, o_orderstatus, 'local' AS src FROM local
      |  UNION ALL
      |  SELECT r.o_orderkey, r.o_orderstatus, 'remote' FROM orders r
      |  WHERE NOT EXISTS (SELECT 1 FROM local l WHERE l.o_orderkey = r.o_orderkey))
      |SELECT o_orderkey, src,
      |       md5(CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus) AS checksum
      |FROM merged ORDER BY o_orderkey""".stripMargin

  // ---- Q8 conditional overwrite + backfilled column (OP-17/20) ----------
  // Money exits as integer cents (floor(x·100 + 0.5) — exact on the
  // bit-identical doubles both engines hold); CAST(double AS DECIMAL) was
  // oracle-version-sensitive (round-1 hash fail).
  val q08: Q = (s, d) => {
    val base = Tables.customer(s, d)
    val withOrig = Ops.addColumnIfAbsent(base, "acctbal_orig_c",
      cents(col("c_acctbal")))
    Ops.conditionalOverwrite(
        withOrig.withColumn("acctbal_fixed", col("c_acctbal")),
        "acctbal_fixed", col("c_acctbal") < 0, lit(0.0))
      .withColumn("acctbal_fixed_c", cents(col("acctbal_fixed")))
      .select("c_custkey", "acctbal_fixed_c", "acctbal_orig_c")
      .orderBy("c_custkey")
  }

  val q08Sql: String =
    """SELECT c_custkey,
      |       CAST(floor((CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END) * 100 + 0.5) AS BIGINT) AS acctbal_fixed_c,
      |       CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_orig_c
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ---- Q9 predicate delete (OP-18) --------------------------------------
  val q09: Q = (s, d) =>
    Ops.predicateDelete(Tables.orders(s, d), col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderstatus")
      .orderBy("o_orderkey")

  val q09Sql: String =
    """SELECT o_orderkey, o_orderstatus FROM orders
      |WHERE NOT (o_orderstatus = 'F') ORDER BY o_orderkey""".stripMargin

  // ---- Q11 spec parse + explode + join (OP-22/23/39) --------------------
  val q11: Q = (s, d) => {
    val spec = Tables.nation(s, d).withColumn("spec",
      concat(col("n_name"), lit(":pw:g"), col("n_regionkey"), lit(",g9")))
    val parsed = spec
      .withColumn("usr", element_at(split(col("spec"), ":"), 1))
      .withColumn("g", explode(split(element_at(split(col("spec"), ":"), 3), ",")))
      .withColumn("gkey", substring(col("g"), 2, 100).cast("int"))
    parsed.join(broadcast(Tables.region(s, d)),
        parsed("gkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("usr"),
        col("r_regionkey").as("gid"), col("r_name"))
      .orderBy("n_nationkey", "gid")
  }

  val q11Sql: String =
    """WITH spec AS (
      |  SELECT n_nationkey, n_name || ':pw:g' || n_regionkey || ',g9' AS s FROM nation),
      |parsed AS (
      |  SELECT n_nationkey, string_split(s, ':')[1] AS usr,
      |         unnest(string_split(string_split(s, ':')[3], ',')) AS g
      |  FROM spec)
      |SELECT p.n_nationkey, p.usr, r.r_regionkey AS gid, r.r_name
      |FROM parsed p JOIN region r ON r.r_regionkey = CAST(substr(p.g, 2) AS INT)
      |ORDER BY n_nationkey, gid""".stripMargin

  // ---- Q12 natural version sort (OP-33/40) ------------------------------
  val q12: Q = (s, d) => {
    val fn = concat(lit("uf"), col("p_size").cast("string"), lit("."),
      (col("p_partkey") % 10).cast("string"), lit("-"),
      (col("p_partkey") % 5 + 1).cast("string"), lit("p"),
      (col("p_partkey") % 7).cast("string"), lit(".patch.zip"))
    // global rank WITHOUT the single-partition window pathology: ranked in
    // parallel range partitions + per-range offsets (Ops.globalRank)
    Ops.globalRank(
        Tables.part(s, d)
          .withColumn("fn", fn)
          .withColumn("vkey", Naming.versionKeyCol(col("fn"))),
        Seq(col("vkey").asc, col("p_partkey").asc))
      .select("rank", "p_partkey", "fn")
      .orderBy("rank")
  }

  val q12Sql: String =
    """WITH f AS (
      |  SELECT p_partkey,
      |         'uf' || p_size || '.' || (p_partkey % 10) || '-' ||
      |         (p_partkey % 5 + 1) || 'p' || (p_partkey % 7) || '.patch.zip' AS fn
      |  FROM part),
      |k AS (
      |  SELECT p_partkey, fn,
      |         list_transform(string_split_regex(
      |           regexp_extract(fn, '(?i)uf(.+?)\.patch\.zip', 1), '[.pP-]'),
      |           x -> CAST(x AS INTEGER)) AS vkey
      |  FROM f)
      |SELECT row_number() OVER (ORDER BY vkey ASC, p_partkey ASC) AS rank,
      |       p_partkey, fn
      |FROM k ORDER BY rank""".stripMargin

  // ---- Q13 checksum (OP-26/43) ------------------------------------------
  val q13: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .orderBy("doc_id")

  val q13Sql: String =
    "SELECT doc_id, md5(text) AS h FROM documents ORDER BY doc_id"

  // ---- Q14 ordered-concat hash aggregate (OP-25/34) ---------------------
  val q14: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(md5(array_join(sort_array(collect_list(md5(col("text")))), ""))
        .as("sig"))
      .orderBy("lang")

  val q14Sql: String =
    """SELECT lang, md5(string_agg(md5(text), '' ORDER BY md5(text))) AS sig
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ---- Q15 ts parse + late-file guard (OP-2/42/48) ----------------------
  val q15: Q = (s, d) =>
    Tables.events(s, d)
      .filter(col("ts") <
        expr("TIMESTAMP_NTZ '2024-01-20 12:00:00'") - expr("INTERVAL 15 MINUTES"))
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .orderBy("event_type")

  val q15Sql: String =
    """SELECT event_type, count(*) AS cnt FROM events
      |WHERE date_trunc('milliseconds', ts) <
      |      TIMESTAMP '2024-01-20 12:00:00' - INTERVAL 15 MINUTES
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- Q16 kv/DSN parse (OP-46) -----------------------------------------
  val q16: Q = (s, d) =>
    Tables.nation(s, d)
      .withColumn("s", concat(lit("dbname="), col("n_name"),
        lit(" user=u"), col("n_nationkey")))
      .withColumn("m", expr("str_to_map(s, ' ', '=')"))
      .select(col("n_nationkey"), col("m")("dbname").as("dbname"),
        col("m")("user").as("usr"))
      .orderBy("n_nationkey")

  val q16Sql: String =
    """WITH f AS (
      |  SELECT n_nationkey,
      |         'dbname=' || n_name || ' user=u' || n_nationkey AS s
      |  FROM nation)
      |SELECT n_nationkey,
      |       regexp_extract(s, 'dbname=([^ ]+)', 1) AS dbname,
      |       regexp_extract(s, 'user=([^ ]+)', 1) AS usr
      |FROM f ORDER BY n_nationkey""".stripMargin

  // ---- Q17 union + last-wins (OP-30/37) ---------------------------------
  val q17: Q = (s, d) => {
    val ev = Tables.events(s, d)
    Ops.lastWins(
        Seq((ev.filter(col("event_id") % 3 === 0), 1),
            (ev.filter(col("event_id") % 2 === 0), 2)),
        Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))
      .withColumn("src",
        when(col("event_id") % 2 === 0, 2).otherwise(1))
      .select("user_id", "event_id", "src")
      .orderBy("user_id")
  }

  val q17Sql: String =
    """WITH u AS (
      |  SELECT user_id, event_id, date_trunc('milliseconds', ts) AS ts, 1 AS src
      |  FROM events WHERE event_id % 3 = 0
      |  UNION ALL
      |  SELECT user_id, event_id, date_trunc('milliseconds', ts), 2
      |  FROM events WHERE event_id % 2 = 0)
      |SELECT user_id, event_id, src FROM u
      |QUALIFY row_number() OVER (PARTITION BY user_id
      |  ORDER BY src DESC, ts DESC, event_id DESC) = 1
      |ORDER BY user_id""".stripMargin

  // ---- Q18 lookup mapping (OP-47) ---------------------------------------
  private def dirMapping(c: Column): Column =
    when(lower(c) === "africa", "OCA_Backups")
      .when(lower(c) === "america", "OCB_Backups")
      .when(lower(c) === "asia", "OCG_Backups")
      .when(lower(c) === "europe", "OCP_Backups")
      .otherwise("UF_Backups")

  val q18: Q = (s, d) =>
    Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"),
        dirMapping(col("r_name")).as("dir"))
      .orderBy("n_nationkey")

  val q18Sql: String =
    """SELECT n_nationkey, n_name,
      |  CASE lower(r_name)
      |    WHEN 'africa' THEN 'OCA_Backups'
      |    WHEN 'america' THEN 'OCB_Backups'
      |    WHEN 'asia' THEN 'OCG_Backups'
      |    WHEN 'europe' THEN 'OCP_Backups'
      |    ELSE 'UF_Backups' END AS dir
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |ORDER BY n_nationkey""".stripMargin

  // ---- Q19 derived-password template (OP-44) ----------------------------
  private def pwDigit(name: Column, pos: Int, add: Int): Column =
    greatest(ascii(lower(substring(name, pos, 1))), lit(96)) - 96 + add

  val q19: Q = (s, d) =>
    Tables.nation(s, d)
      .select(col("n_nationkey"),
        concat(lit("pw"), pwDigit(col("n_name"), 2, 5).cast("string")).as("pw1"),
        concat(lit("k"), pwDigit(col("n_name"), 7, 2).cast("string"), lit("z"))
          .as("pw2"))
      .orderBy("n_nationkey")

  val q19Sql: String =
    """SELECT n_nationkey,
      |  'pw' || (greatest(ascii(lower(substring(n_name, 2, 1))), 96) - 96 + 5) AS pw1,
      |  'k' || (greatest(ascii(lower(substring(n_name, 7, 1))), 96) - 96 + 2) || 'z' AS pw2
      |FROM nation ORDER BY n_nationkey""".stripMargin

  // ---- Q20 decile bucketing (OP-27/28/45) -------------------------------
  // The scalar max is ONE aggregate row broadcast back — not a global
  // window (which would funnel the whole table through one partition).
  val q20: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val mx = ev.agg(max(col("value")).as("maxv"))
    ev.crossJoin(broadcast(mx))
      .withColumn("bucket",
        floor(col("value") * 100 / col("maxv") / 10).cast("long") * 10)
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")
  }

  val q20Sql: String =
    """WITH b AS (
      |  SELECT CAST(floor(value * 100 / (max(value) OVER ()) / 10) AS BIGINT) * 10
      |         AS bucket
      |  FROM events)
      |SELECT bucket, count(*) AS cnt FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---- Q21 exact dedup (OP-36, north star) ------------------------------
  val q21: Q = (s, d) =>
    Ops.latestPerGroup(
        Tables.documents(s, d).withColumn("h", md5(col("text"))),
        Seq("h"), Seq(col("doc_id").asc))
      .select("doc_id", "h")
      .orderBy("doc_id")

  val q21Sql: String =
    """SELECT doc_id, md5(text) AS h FROM documents
      |QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
      |ORDER BY doc_id""".stripMargin

  // ---- Q22 normalized near-dup clusters ---------------------------------
  val q22: Q = (s, d) => {
    val norm = Tables.documents(s, d).withColumn("norm",
      trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")))
    val sizes = norm.groupBy("norm").agg(count(lit(1)).as("csize"))
    norm.join(sizes, "norm")
      .select(md5(col("norm")).as("cluster"), col("doc_id"), col("csize"))
      .orderBy("doc_id")
  }

  val q22Sql: String =
    """WITH n AS (
      |  SELECT doc_id,
      |         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
      |  FROM documents),
      |s AS (SELECT norm, count(*) AS csize FROM n GROUP BY norm)
      |SELECT md5(n.norm) AS cluster, n.doc_id, s.csize
      |FROM n JOIN s ON n.norm = s.norm ORDER BY doc_id""".stripMargin

  // ---- Q23 top-k cosine similarity (north star) -------------------------
  // The brute-force baseline operator itself (native codegen'd CosineSim,
  // bit-identical to the HOF fold and to DuckDB's list_dot_product
  // composition); scores exit as scale-4 fixed point.
  val q23: Q = (s, d) => {
    val e = Tables.embeddings(s, d).filter(col("vec_id") < 100)
      .select(col("vec_id").as("id"),
        graft.operators.Similarity.toDoubleVec(col("embedding")).as("v"))
    graft.operators.Similarity.bruteForceTopK(e, e, 3)
      .orderBy("vec_id", "rank")
  }

  val q23Sql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings WHERE vec_id < 100),
      |p AS (
      |  SELECT a.vec_id, b.vec_id AS other_id,
      |         CAST(floor(list_dot_product(a.v, b.v) /
      |           (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
      |           * 10000 + 0.5) AS BIGINT) AS score_e4
      |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
      |r AS (
      |  SELECT vec_id, other_id, score_e4,
      |         CAST(row_number() OVER (PARTITION BY vec_id
      |           ORDER BY score_e4 DESC, other_id ASC) AS BIGINT) AS rank
      |  FROM p)
      |SELECT vec_id, other_id, score_e4, rank
      |FROM r WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin

  // ---- Q24 text stats (north star) --------------------------------------
  val q24: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(count(lit(1)).as("cnt"),
        cents(sum(col("n_chars")).cast("double") / count(lit(1)))
          .as("avg_chars_c"),
        max(length(col("text"))).cast("long").as("max_len"))
      .orderBy("lang")

  val q24Sql: String =
    """SELECT lang, count(*) AS cnt,
      |  CAST(floor(CAST(sum(n_chars) AS DOUBLE) / count(*) * 100 + 0.5) AS BIGINT) AS avg_chars_c,
      |  CAST(max(length(text)) AS BIGINT) AS max_len
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ---- Q25 star-join revenue (TPC-H Q5 shape) ---------------------------
  val q25: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val c = Tables.customer(s, d)
    val n = broadcast(Tables.nation(s, d))
    val r = broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      // fixed-point multiply: price and discount are 2-decimal values, so
      // their cent renderings are exact integers; the e4-scale BIGINT sum is
      // exact and order-independent — no fp rounding, no DECIMAL casts.
      .agg(sum(cents(col("l_extendedprice")) *
          (lit(100L) - cents(col("l_discount"))))
        .as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("n_name"))
  }

  val q25Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
      |           (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
      |       AS BIGINT) AS revenue_e4
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue_e4 DESC, n_name""".stripMargin

  // ---- Q26 aggregation breadth (TPC-H Q1 shape) -------------------------
  // All sums in exact integer cents; the average exits as e6 fixed point
  // computed from one double division both engines do identically.
  val q26: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(cents(col("l_quantity"))).as("sum_qty_c"),
        sum(cents(col("l_extendedprice"))).as("sum_price_c"),
        floor(sum(e4(col("l_discount"))) * lit(1.0) / count(lit(1)) * lit(100d) +
          lit(0.5)).cast("long").as("avg_disc_e6"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  val q26Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_c,
      |  CAST(floor(CAST(sum(CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
      |       / count(*) * 100 + 0.5) AS BIGINT) AS avg_disc_e6,
      |  count(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---- q42 outer-join enrichment (left outer breadth) -------------------
  val q42: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")

  val q42Sql: String =
    """SELECT c_custkey, count(o_orderkey) AS n_orders
      |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  // ---- q43 semi-join (EXISTS breadth) -----------------------------------
  val q43: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  val q43Sql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  // ---- q44 analytic breadth: lag + dense_rank over integers -------------
  val q44: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("prev_event", coalesce(lag(col("event_id"), 1).over(w), lit(-1L)))
      .withColumn("seq", row_number().over(w).cast("long"))
      .filter(col("seq") <= 5)
      .select("user_id", "seq", "event_id", "prev_event")
      .orderBy("user_id", "seq")
  }

  val q44Sql: String =
    """SELECT user_id, seq, event_id, prev_event FROM (
      |  SELECT user_id, event_id,
      |    coalesce(lag(event_id, 1) OVER w, -1) AS prev_event,
      |    CAST(row_number() OVER w AS BIGINT) AS seq
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id
      |    ORDER BY date_trunc('milliseconds', ts) ASC, event_id ASC))
      |WHERE seq <= 5 ORDER BY user_id, seq""".stripMargin

  // ---- q45 rollup (subtotal hierarchy) ----------------------------------
  val q45: Q = (s, d) =>
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        sum(cents(col("l_quantity"))).as("sum_qty_c"))
      .select(
        coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
        coalesce(col("l_linestatus"), lit("<all>")).as("ls"),
        col("cnt"), col("sum_qty_c"))
      .orderBy("rf", "ls")

  val q45Sql: String =
    """SELECT coalesce(l_returnflag, '<all>') AS rf,
      |       coalesce(l_linestatus, '<all>') AS ls,
      |       count(*) AS cnt,
      |       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  // ---- q46 cube (all grouping combinations) -----------------------------
  val q46: Q = (s, d) =>
    Tables.orders(s, d)
      .withColumn("yr", year(col("o_orderdate")).cast("int"))
      .cube("o_orderstatus", "yr")
      .agg(count(lit(1)).as("cnt"))
      .select(
        coalesce(col("o_orderstatus"), lit("<all>")).as("st"),
        coalesce(col("yr"), lit(-1)).as("yr"),
        col("cnt"))
      .orderBy("st", "yr")

  val q46Sql: String =
    """WITH o AS (
      |  SELECT o_orderstatus, CAST(year(o_orderdate) AS INT) AS yr FROM orders)
      |SELECT coalesce(o_orderstatus, '<all>') AS st,
      |       coalesce(yr, -1) AS yr, count(*) AS cnt
      |FROM o GROUP BY CUBE (o_orderstatus, yr)
      |ORDER BY st, yr""".stripMargin

  // ---- q49 sessionization (gap-based sessions via cumulative window) ----
  val q49: Q = (s, d) => {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val cum = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        // exact integer micros on both engines (unix_micros ↔ epoch_us);
        // second-truncating casts can disagree at exact gap boundaries
        when(col("prev_ts").isNull ||
          expr("unix_micros(cast(ts as timestamp))") -
            expr("unix_micros(cast(prev_ts as timestamp))") > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("sess", sum(col("new_sess")).over(cum).cast("long"))
      .groupBy("user_id")
      .agg(max(col("sess")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  val q49Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, date_trunc('milliseconds', ts) AS ts FROM events),
      |g AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts, 1) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      |s AS (
      |  SELECT user_id,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess
      |  FROM g)
      |SELECT user_id, max(sess) AS n_sessions, count(*) AS n_events
      |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- q50 tumbling event-time windows ----------------------------------
  // Spark's window() operator (epoch-aligned 1-hour tumbling buckets);
  // oracle = date_trunc hour (identical alignment for whole-hour widths).
  val q50: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"))
      .orderBy("ws", "event_type")

  val q50Sql: String =
    """SELECT date_trunc('hour', date_trunc('milliseconds', ts)) AS ws,
      |       event_type, count(*) AS cnt
      |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin

  // ---- q64 pivot (wide reshape: lang × source) --------------------------
  // Spark's pivot with an explicit value list keeps the plan a single
  // hash aggregate (no per-value scans); the oracle is the manual
  // CASE-sum encoding. Absent (lang, source) cells stay NULL in both.
  private val q64Sources = Seq("src0", "src1", "src2", "src3", "src4")

  val q64: Q = (s, d) =>
    Tables.documents(s, d)
      .filter(col("source").isin(q64Sources: _*))
      .groupBy("lang")
      .pivot("source", q64Sources)
      .agg(sum(col("n_chars")))
      .orderBy("lang")

  val q64Sql: String = {
    val cols = q64Sources.map(src =>
      s"CAST(sum(CASE WHEN source = '$src' THEN n_chars END) AS BIGINT) AS $src")
      .mkString(",\n       ")
    s"""SELECT lang,
       |       $cols
       |FROM documents
       |WHERE source IN (${q64Sources.map(s => s"'$s'").mkString(", ")})
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---- q65 grouping sets (explicit multi-grouping aggregate) ------------
  // Dataset.groupingSets (Spark 4): one aggregate producing the per-flag,
  // per-status, and grand-total rows in a single pass — the generalization
  // rollup/cube (q45/q46) specialize. NULL group cells are coalesced to
  // sentinels so the total ORDER BY needs no cross-engine null ordering.
  val q65: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(cents(col("l_quantity"))).as("sum_qty_c"))
      .select(
        coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
        coalesce(col("l_linestatus"), lit("<all>")).as("ls"),
        col("cnt"), col("sum_qty_c"))
      .orderBy("rf", "ls")

  val q65Sql: String =
    """SELECT coalesce(l_returnflag, '<all>') AS rf,
      |       coalesce(l_linestatus, '<all>') AS ls,
      |       count(*) AS cnt,
      |       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY rf, ls""".stripMargin

  // ---- q66 exact interpolated percentiles per group ---------------------
  // Spark `percentile` and DuckDB `quantile_cont` both implement the R-7
  // linear interpolation (pos = p·(n-1)); the arithmetic is the same IEEE
  // formula on the same doubles, so the fixed-point exits match exactly.
  // BOUNDED-GROUP CONTRACT (same class as q14's collect_list, SURVEY §4):
  // `percentile` buffers every value of a group in ONE aggregation buffer —
  // ~n/G doubles in a single task, an OOM at 100×, not a slowdown. Use it
  // only when each group is known executor-memory-bounded; the unbounded
  // scale path is Ops.exactPercentiles (q68), which keeps groups spread
  // across range partitions and returns bit-identical values.
  val q66: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        Ops.fixedPoint(expr("percentile(l_quantity, 0.25)"), 4).as("p25_e4"),
        Ops.fixedPoint(expr("percentile(l_quantity, 0.5)"), 4).as("p50_e4"),
        Ops.fixedPoint(expr("percentile(l_quantity, 0.75)"), 4).as("p75_e4"),
        Ops.fixedPoint(expr("percentile(l_extendedprice, 0.9)"), 2).as("p90_price_c"))
      .orderBy("l_returnflag")

  val q66Sql: String =
    """SELECT l_returnflag,
      |  CAST(floor(quantile_cont(l_quantity, 0.25) * 10000 + 0.5) AS BIGINT) AS p25_e4,
      |  CAST(floor(quantile_cont(l_quantity, 0.5) * 10000 + 0.5) AS BIGINT) AS p50_e4,
      |  CAST(floor(quantile_cont(l_quantity, 0.75) * 10000 + 0.5) AS BIGINT) AS p75_e4,
      |  CAST(floor(quantile_cont(l_extendedprice, 0.9) * 100 + 0.5) AS BIGINT) AS p90_price_c
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- q68 distributed exact percentiles (no per-group buffer) ----------
  // Same values as q66 — the oracle is the SAME quantile_cont — but the
  // engine side is Ops.exactPercentiles: rank-selection over range
  // partitions, so no task ever holds a whole group. Long-form output
  // (group, p, value); the oracle zips parallel unnests to match.
  val q68: Q = (s, d) =>
    Ops.exactPercentiles(Tables.lineitem(s, d), Seq("l_returnflag"),
        "l_quantity", Seq(0.25, 0.5, 0.75, 0.9))
      .select(col("l_returnflag"), col("p"),
        Ops.fixedPoint(col("value"), 4).as("v_e4"))
      .orderBy("l_returnflag", "p")

  val q68Sql: String =
    """WITH a AS (
      |  SELECT l_returnflag,
      |         quantile_cont(l_quantity, 0.25) AS q25,
      |         quantile_cont(l_quantity, 0.5)  AS q50,
      |         quantile_cont(l_quantity, 0.75) AS q75,
      |         quantile_cont(l_quantity, 0.9)  AS q90
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag,
      |       CAST(unnest([0.25, 0.5, 0.75, 0.9]) AS DOUBLE) AS p,
      |       CAST(floor(unnest([q25, q50, q75, q90]) * 10000 + 0.5) AS BIGINT)
      |         AS v_e4
      |FROM a ORDER BY l_returnflag, p""".stripMargin

  // ---- q67 sync-server link (scalar-subquery update + targeted hwid) ----
  // Exercises the REAL rule machinery (Delive.apply over SyncLink.
  // syncLinkRules, db.py:713-719 + main.py:449-478): the scalar-subquery
  // user lookup, the password reset, the +1000 sequence gap, and the
  // per-instance hardware-id write-back. The three result tables exit as
  // one tagged frame so the oracle can hash-compare all of them at once.
  val q67: Q = (s, d) => {
    import graft.pipeline.{Delive, SyncLink}
    val users = Tables.customer(s, d).select(
      col("c_custkey").as("id"), lower(col("c_name")).as("login"),
      lit("old").as("password"))
    val entities = Tables.nation(s, d).select(
      col("n_name").as("name"), lit(0L).as("user_id"),
      lit("none").as("hardware_id"))
    val seqs = Tables.region(s, d).select(
      when(col("r_regionkey") === 0, lit("sync.server.update"))
        .otherwise(col("r_name")).as("code"),
      (col("r_regionkey") * 100 + 100).as("number_next"))
    val out = Delive(
      Map("sync_server_entity" -> entities, "res_users" -> users,
        "ir_sequence" -> seqs),
      SyncLink.syncLinkRules(
        connectionUser = "customer#000000001", connectionPw = Some("npw"),
        hwid = Some("HW42"),
        dbs = Seq("NATION_0_20240101_0101", "NATION_3_20240101_0101"),
        targeted = true))
    out("sync_server_entity")
      .select(lit("entity").as("tbl"), col("name").as("k"),
        col("user_id").cast("string").as("v1"), col("hardware_id").as("v2"))
      .unionAll(out("res_users").select(lit("user"), col("login"),
        col("password"), lit("")))
      .unionAll(out("ir_sequence").select(lit("seq"), col("code"),
        col("number_next").cast("string"), lit("")))
      .orderBy("tbl", "k")
  }

  val q67Sql: String =
    """WITH users AS (
      |  SELECT c_custkey AS id, lower(c_name) AS login, 'old' AS password
      |  FROM customer),
      |entities AS (
      |  SELECT n_name AS name, 'none' AS hardware_id FROM nation),
      |seqs AS (
      |  SELECT CASE WHEN r_regionkey = 0 THEN 'sync.server.update'
      |              ELSE r_name END AS code,
      |         r_regionkey * 100 + 100 AS number_next
      |  FROM region)
      |SELECT 'entity' AS tbl, name AS k,
      |       CAST((SELECT id FROM users
      |             WHERE login = 'customer#000000001') AS VARCHAR) AS v1,
      |       CASE WHEN name IN ('NATION_0', 'NATION_3') THEN 'HW42'
      |            ELSE 'none' END AS v2
      |FROM entities
      |UNION ALL
      |SELECT 'user', login,
      |       CASE WHEN login = 'customer#000000001' THEN 'npw'
      |            ELSE 'old' END, ''
      |FROM users
      |UNION ALL
      |SELECT 'seq', code,
      |       CAST(CASE WHEN code = 'sync.server.update'
      |                 THEN number_next + 1000
      |                 ELSE number_next END AS VARCHAR), ''
      |FROM seqs
      |ORDER BY tbl, k""".stripMargin

  // ---- registry ---------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q01_latest_per_group" -> q01,
    "q02_wildcard_filter" -> q02,
    "q03_exclude_filter" -> q03,
    "q04_name_derivation" -> q04,
    "q05_regex_gate" -> q05,
    "q06_gc_victims" -> q06,
    "q07_incremental_merge" -> q07,
    "q08_conditional_overwrite" -> q08,
    "q09_predicate_delete" -> q09,
    "q11_spec_explode_join" -> q11,
    "q12_version_sort" -> q12,
    "q13_checksum" -> q13,
    "q14_ordered_hash_agg" -> q14,
    "q15_late_guard" -> q15,
    "q16_kv_parse" -> q16,
    "q17_last_wins_union" -> q17,
    "q18_lookup_mapping" -> q18,
    "q19_derived_password" -> q19,
    "q20_decile_bucketing" -> q20,
    "q21_exact_dedup" -> q21,
    "q22_norm_neardup" -> q22,
    "q23_cosine_topk" -> q23,
    "q24_text_stats" -> q24,
    "q25_star_join_revenue" -> q25,
    "q26_agg_breadth" -> q26,
    "q42_outer_join" -> q42,
    "q43_semi_join" -> q43,
    "q44_analytics" -> q44,
    "q45_rollup" -> q45,
    "q46_cube" -> q46,
    "q49_sessionize" -> q49,
    "q50_tumbling_window" -> q50,
    "q64_pivot" -> q64,
    "q65_grouping_sets" -> q65,
    "q66_percentiles" -> q66,
    "q67_sync_server_link" -> q67,
    "q68_percentiles_dist" -> q68,
  )

  val oracleSql: Map[String, String] = Map(
    "q01_latest_per_group" -> q01Sql,
    "q02_wildcard_filter" -> q02Sql,
    "q03_exclude_filter" -> q03Sql,
    "q04_name_derivation" -> q04Sql,
    "q05_regex_gate" -> q05Sql,
    "q06_gc_victims" -> q06Sql,
    "q07_incremental_merge" -> q07Sql,
    "q08_conditional_overwrite" -> q08Sql,
    "q09_predicate_delete" -> q09Sql,
    "q11_spec_explode_join" -> q11Sql,
    "q12_version_sort" -> q12Sql,
    "q13_checksum" -> q13Sql,
    "q14_ordered_hash_agg" -> q14Sql,
    "q15_late_guard" -> q15Sql,
    "q16_kv_parse" -> q16Sql,
    "q17_last_wins_union" -> q17Sql,
    "q18_lookup_mapping" -> q18Sql,
    "q19_derived_password" -> q19Sql,
    "q20_decile_bucketing" -> q20Sql,
    "q21_exact_dedup" -> q21Sql,
    "q22_norm_neardup" -> q22Sql,
    "q23_cosine_topk" -> q23Sql,
    "q24_text_stats" -> q24Sql,
    "q25_star_join_revenue" -> q25Sql,
    "q26_agg_breadth" -> q26Sql,
    "q42_outer_join" -> q42Sql,
    "q43_semi_join" -> q43Sql,
    "q44_analytics" -> q44Sql,
    "q45_rollup" -> q45Sql,
    "q46_cube" -> q46Sql,
    "q49_sessionize" -> q49Sql,
    "q50_tumbling_window" -> q50Sql,
    "q64_pivot" -> q64Sql,
    "q65_grouping_sets" -> q65Sql,
    "q66_percentiles" -> q66Sql,
    "q67_sync_server_link" -> q67Sql,
    "q68_percentiles_dist" -> q68Sql,
  )
}
