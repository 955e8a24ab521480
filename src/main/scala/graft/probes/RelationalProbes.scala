package graft.probes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curation, Dedup, Multimodal, Similarity, TextStats}
import ProbeShared._

/** Relational-breadth probe family: temporal joins (as-of, range),
  * window breadth, fuzzy/semi joins, set ops, Z-order, sampling, shard
  * planning, approximate aggregates, PageRank, user-rights sort.
  *
  * Split from the former monolithic ExtProbes (3.1 kLoC); aggregated and
  * re-exported by [[ExtProbes]] — registry keys, probe bodies, and oracle
  * SQL unchanged.
  */
object RelationalProbes {
  // ---- q37 deterministic stratified sampling ----------------------------
  // Training-data curation: per-stratum (lang) sampling at a 3/16 rate,
  // deterministic via content hash (reproducible across runs/engines —
  // the requirement that rules out rand()-based sampleBy).
  val q37: Q = (s, d) =>
    Curation.stratifiedSampleReport(Tables.documents(s, d), "lang",
        col("text"), Seq("0", "1", "2"))
      .orderBy("lang")

  val q37Sql: String =
    """SELECT lang, count(*) AS n_total,
      |  count(*) FILTER (WHERE substr(md5(text), 1, 1) IN ('0','1','2')) AS n_sampled,
      |  CAST(floor(count(*) FILTER (WHERE substr(md5(text), 1, 1) IN ('0','1','2'))
      |    * 1.0 / count(*) * 10000 + 0.5) AS BIGINT) AS ratio_e4
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ---- q39 shard assignment (training-shard writer planning) ------------
  // Deterministic 16-way content-hash sharding; the write path would
  // `.repartition(shard).write.partitionBy(shard)` — the probe verifies the
  // assignment and balance.
  val q39: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("shard", Curation.shardAssign(col("text")))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("shard")

  val q39Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         CAST(strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS INT) AS shard
      |  FROM documents)
      |SELECT shard, count(*) AS n_docs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM t GROUP BY shard ORDER BY shard""".stripMargin

  // ---- q56 user-rights natural-version sort (OP-33 UR variant) ----------
  // The q12 shape on the second artifact family: mixed-case
  // 'User Rights v<ver>.zip' names (re.I parity with main.py:718), ranked
  // by natural version via the same range-partitioned globalRank.
  val q56: Q = (s, d) => {
    val ver = concat(col("p_size").cast("string"), lit("."),
      (col("p_partkey") % 10).cast("string"), lit("-"),
      (col("p_partkey") % 5 + 1).cast("string"), lit("p"),
      (col("p_partkey") % 7).cast("string"))
    val fn = concat(
      when(col("p_partkey") % 3 === 0, lit("USER RIGHTS V"))
        .when(col("p_partkey") % 3 === 1, lit("user rights v"))
        .otherwise(lit("User Rights v")),
      ver, lit(".zip"))
    graft.core.Ops.globalRank(
        Tables.part(s, d)
          .withColumn("fn", fn)
          .withColumn("vkey",
            graft.core.Naming.versionKeyCol(col("fn"),
              graft.core.Naming.UserRightsPattern)),
        Seq(col("vkey").asc, col("p_partkey").asc))
      .select("rank", "p_partkey", "fn")
      .orderBy("rank")
  }

  val q56Sql: String =
    """WITH f AS (
      |  SELECT p_partkey,
      |         (CASE WHEN p_partkey % 3 = 0 THEN 'USER RIGHTS V'
      |               WHEN p_partkey % 3 = 1 THEN 'user rights v'
      |               ELSE 'User Rights v' END) ||
      |         p_size || '.' || (p_partkey % 10) || '-' ||
      |         (p_partkey % 5 + 1) || 'p' || (p_partkey % 7) || '.zip' AS fn
      |  FROM part),
      |k AS (
      |  SELECT p_partkey, fn,
      |         list_transform(list_filter(string_split_regex(
      |           regexp_extract(fn, '(?i)User Rights v(.+?).zip', 1), '[.pP-]'),
      |           x -> x <> ''),
      |           x -> CAST(x AS INTEGER)) AS vkey
      |  FROM f)
      |SELECT row_number() OVER (ORDER BY vkey ASC, p_partkey ASC) AS rank,
      |       p_partkey, fn
      |FROM k ORDER BY rank""".stripMargin

  // ---- q47 approximate aggregates (bounded-error oracle) ----------------
  // Sketch VALUES are implementation-specific (DuckDB's HLL would never
  // hash-match Spark's), so the raw estimates cannot cross the compare
  // boundary. What CAN is the accuracy contract: Spark computes both the
  // sketch and the exact answer and emits `within-ε` BOOLEANS; the oracle
  // emits the exact side and literal TRUE. A sketch drifting outside its
  // error bound turns a boolean FALSE and fails the strict hash compare —
  // the sketches are now checked, not just run. (Deterministic: Spark's
  // HLL/KLL are hash-based, no RNG, so the outcome is stable per dataset.)
  // At 100 TB these sketches are how a pipeline sizes dedup work without
  // an exact distinct shuffle; the exact columns here are affordable at
  // probe scale and are exactly what the sketch replaces at scale.
  val q47: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        expr("approx_percentile(value, array(0.5, 0.95), 1000)").as("p"),
        countDistinct(col("user_id")).as("exact_users"),
        // rank-tolerance envelope: accuracy=1000 bounds rank error at
        // 0.1%; ±2% exact-percentile bounds are a generous, stable check
        expr("percentile(value, array(0.48, 0.52, 0.93, 0.97))").as("pe"))
      .select(col("event_type"), col("exact_users"),
        // HLL default rsd = 5%; 3σ = 15% relative error bound
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * lit(0.15)).as("hll_ok"),
        element_at(col("p"), 1).between(
          element_at(col("pe"), 1), element_at(col("pe"), 2)).as("p50_ok"),
        element_at(col("p"), 2).between(
          element_at(col("pe"), 3), element_at(col("pe"), 4)).as("p95_ok"))
      .orderBy("event_type")

  val q47Sql: String =
    """SELECT event_type,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS hll_ok, TRUE AS p50_ok, TRUE AS p95_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- q61 as-of join (latest purchase at-or-before each click) ---------
  // Engine = Temporal.asofJoin (union + one keyed shuffle + windowed
  // carry-forward — no join operator in the plan). Oracle = the INDEPENDENT
  // encoding: inequality left join + row_number top-1, so the probe checks
  // the semantics, not the implementation.
  val q61: Q = (s, d) => {
    val e = Tables.events(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"),
        graft.core.Ops.fixedPoint(col("value"), 4).as("purchase_value_e4"))
    graft.operators.Temporal.asofJoin(
        clicks, "user_id", "ts", purchases, "user_id", "ts",
        payload = Seq("purchase_id", "purchase_value_e4"),
        tieBreak = "purchase_id")
      .orderBy("event_id")
  }

  val q61Sql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, date_trunc('milliseconds', ts) AS ts,
      |         event_type, value
      |  FROM events),
      |c AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click'),
      |p AS (SELECT event_id AS purchase_id, user_id, ts,
      |        CAST(floor(value * 10000 + 0.5) AS BIGINT) AS purchase_value_e4
      |      FROM e WHERE event_type = 'purchase'),
      |j AS (SELECT c.event_id, c.user_id, c.ts,
      |        p.purchase_id, p.purchase_value_e4,
      |        row_number() OVER (PARTITION BY c.event_id
      |          ORDER BY p.ts DESC, p.purchase_id DESC) AS rn
      |      FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.ts <= c.ts)
      |SELECT event_id, user_id, ts, purchase_id, purchase_value_e4
      |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin

  // ---- q69 hot-key as-of join (bucketed) ---------------------------------
  // Same semantics and SAME independent oracle as q61, but the engine is
  // Temporal.asofJoinBucketed: within-bucket as-of + per-bucket summaries +
  // cross-bucket carry, so no task ever sorts a key's full history. A
  // 1-hour bucket over the ~30-day event range forces the carry path to do
  // real work (most clicks' latest purchase is in an earlier bucket).
  val q69: Q = (s, d) => {
    val e = Tables.events(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"),
        graft.core.Ops.fixedPoint(col("value"), 4).as("purchase_value_e4"))
    graft.operators.Temporal.asofJoinBucketed(
        clicks, "user_id", "ts", purchases, "user_id", "ts",
        payload = Seq("purchase_id", "purchase_value_e4"),
        tieBreak = "purchase_id", bucketSec = 3600L)
      .orderBy("event_id")
  }

  val q69Sql: String = q61Sql

  // ---- q71 native as-of join (custom plan node) --------------------------
  // Same semantics and SAME independent oracle as q61, but the engine is
  // the whole-operator extension rung: Temporal.asofJoinNative →
  // plans.AsOfJoinNode → AsOfJoinStrategy → AsOfJoinExec (merge-scan over
  // hash-clustered, per-side-sorted children). The oracle stays the
  // inequality-join + top-1 encoding, so the custom exec's semantics are
  // checked against an implementation-independent formulation.
  val q71: Q = (s, d) => {
    val e = Tables.events(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"),
        graft.core.Ops.fixedPoint(col("value"), 4).as("purchase_value_e4"))
    graft.operators.Temporal.asofJoinNative(
        clicks, "user_id", "ts", purchases, "user_id", "ts",
        payload = Seq("purchase_id", "purchase_value_e4"),
        tieBreak = "purchase_id")
      .orderBy("event_id")
  }

  val q71Sql: String = q61Sql

  // ---- q72 session_window sessionization ---------------------------------
  // Spark's built-in session_window (the streaming sessionizer's engine,
  // SessionizeStream) run in batch mode, against q49's independent
  // cumulative-window oracle — valid because Spark merges TOUCHING session
  // windows, which is exactly the `diff > gap` starts-new rule
  // (SessionizeStreamSpec pins the boundary).
  val q72: Q = (s, d) =>
    graft.streaming.SessionizeStream.sessionCounts(
        Tables.events(s, d), "user_id", "ts", "30 minutes")
      .orderBy("user_id")

  val q72Sql: String = Probes.q49Sql

  // ---- q73 window-function breadth (ntile / percent_rank / cume_dist) ---
  // The ranking-family completion over q44's lag/row_number: quartile
  // bucketing, relative rank, cumulative distribution, running first —
  // all on the unique (ts, event_id) order so both engines' tie rules
  // never engage. percent_rank/cume_dist are (rank-1)/(n-1) and
  // rows≤current/n on the same operands in both engines → bit-identical
  // doubles → fixed-point e6 is exact.
  val q73: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d).select(
      col("user_id"), col("event_id"),
      ntile(4).over(w).cast("long").as("quartile"),
      graft.core.Ops.fixedPoint(percent_rank().over(w), 6).as("prank_e6"),
      graft.core.Ops.fixedPoint(cume_dist().over(w), 6).as("cdist_e6"),
      first(col("event_id")).over(w).as("first_event"))
      .orderBy("event_id")
  }

  val q73Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, date_trunc('milliseconds', ts) AS ts FROM events)
      |SELECT user_id, event_id,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  CAST(floor(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT) AS prank_e6,
      |  CAST(floor(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT) AS cdist_e6,
      |  first_value(event_id) OVER w AS first_event
      |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |ORDER BY event_id""".stripMargin

  // ---- q74 fuzzy match join (Levenshtein, length-blocked) ----------------
  // Edit-distance join as a SCALE shape: levenshtein(a,b) <= T implies
  // |len(a)-len(b)| <= T, so length buckets of width T+1 with the left
  // side exploded to its <=3 candidate buckets cover every qualifying
  // pair via an EQUI join (the rangeJoin bucketing idea applied to string
  // length); exact levenshtein refines. The right side has ONE bucket per
  // row, so no pair meets twice. Oracle = the direct inequality join, an
  // independent encoding.
  val q74: Q = (s, d) => {
    val t = 1
    val w = t + 1
    val n = Tables.supplier(s, d).select(col("s_suppkey").as("k"),
      lower(col("s_name")).as("nm"), length(col("s_name")).as("ln"))
    val a = n.withColumn("b", explode(array_distinct(array(
        floor((col("ln") - t) / w), floor(col("ln") / w),
        floor((col("ln") + t) / w)))))
      .select(col("k").as("ka"), col("nm").as("na"), col("b"))
    val bb = n.withColumn("b", floor(col("ln") / w))
      .select(col("k").as("kb"), col("nm").as("nb"), col("b"))
    // bounded form: O(threshold·len) with early exit, −1 beyond the
    // threshold — for qualifying pairs it returns the exact distance, so
    // the oracle's full-eval compare is unchanged. The unbounded form
    // cost len² per pair (~3.2 s at sf0.1's 1M same-length candidate
    // pairs; bounded ≈ 0.5 s).
    a.join(bb, Seq("b"))
      .filter(col("kb") > col("ka"))
      .select(col("ka"), col("kb"),
        levenshtein(col("na"), col("nb"), t).cast("long").as("lev"))
      .filter(col("lev") >= 0)
      .orderBy("ka", "kb")
  }

  val q74Sql: String =
    """WITH n AS (
      |  SELECT s_suppkey AS k, lower(s_name) AS nm FROM supplier)
      |SELECT a.k AS ka, b.k AS kb,
      |  CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS lev
      |FROM n a JOIN n b ON b.k > a.k AND levenshtein(a.nm, b.nm) <= 1
      |ORDER BY ka, kb""".stripMargin

  // ---- q81 PageRank (integer-exact link-graph quality weighting) ---------
  // operators/Graph.pageRank, 3 rounds over a deterministic 50-node graph
  // synthesized from customer keys. All arithmetic is scaled-BIGINT with
  // integer division, so in-edge sums are order-independent and the
  // oracle — the SAME three iterations unrolled as SQL CTEs — matches
  // exactly (float PageRank would hash-diverge on summation order).
  val q81: Q = (s, d) => {
    val edges = Tables.customer(s, d).select(
        (col("c_custkey") % 50).as("src"),
        ((col("c_custkey") * 7 + 3) % 50).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    graft.operators.Graph.pageRank(edges, "src", "dst", iters = 3)
      .orderBy("node")
  }

  val q81Sql: String = {
    val iterations = (1 to 3).map { i =>
      s"""c$i AS (SELECT e.dst AS node,
         |  CAST(sum(r${i - 1}.rank_e9 // deg.deg) AS BIGINT) AS inflow
         |  FROM e JOIN r${i - 1} ON r${i - 1}.node = e.src
         |  JOIN deg ON deg.src = e.src GROUP BY e.dst),
         |r$i AS (SELECT n.node,
         |  (15 * b.base) // 100 + (85 * coalesce(c$i.inflow, 0)) // 100
         |    AS rank_e9
         |  FROM n CROSS JOIN b LEFT JOIN c$i ON c$i.node = n.node)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT c_custkey % 50 AS src, (c_custkey * 7 + 3) % 50 AS dst
       |  FROM customer WHERE c_custkey % 50 <> (c_custkey * 7 + 3) % 50),
       |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
       |b AS (SELECT 1000000000 // count(*) AS base FROM n),
       |r0 AS (SELECT n.node, b.base AS rank_e9 FROM n CROSS JOIN b),
       |$iterations
       |SELECT node, CAST(rank_e9 AS BIGINT) AS rank_e9 FROM r3
       |ORDER BY node""".stripMargin
  }

  // ---- q77 set-operation breadth (INTERSECT / EXCEPT, ALL and DISTINCT) --
  // The multiset forms matter: intersectAll/exceptAll preserve duplicate
  // counts (Spark plans them as count-compare aggregates, not row dedup),
  // and the reference surface only ever exercised EXCEPT-shaped anti
  // logic (OP-38). Nation keys of two customer segments, tagged and
  // unioned; ORDER BY makes the multiset deterministic.
  val q77: Q = (s, d) => {
    val c = Tables.customer(s, d)
    def seg(m: String) =
      c.filter(col("c_mktsegment") === m)
        .select(col("c_nationkey").cast("long").as("nk"))
    val a = seg("AUTOMOBILE")
    val b = seg("BUILDING")
    a.intersect(b).select(lit("int_d").as("op"), col("nk"))
      .unionByName(a.intersectAll(b).select(lit("int_a").as("op"), col("nk")))
      .unionByName(a.except(b).select(lit("exc_d").as("op"), col("nk")))
      .unionByName(a.exceptAll(b).select(lit("exc_a").as("op"), col("nk")))
      .groupBy("op", "nk").agg(count(lit(1)).as("cnt"))
      .orderBy("op", "nk")
  }

  val q77Sql: String =
    """WITH a AS (SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
      |           WHERE c_mktsegment = 'AUTOMOBILE'),
      |b AS (SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
      |      WHERE c_mktsegment = 'BUILDING'),
      |u AS (
      |  SELECT 'int_d' AS op, nk FROM (SELECT nk FROM a INTERSECT SELECT nk FROM b)
      |  UNION ALL
      |  SELECT 'int_a' AS op, nk FROM (SELECT nk FROM a INTERSECT ALL SELECT nk FROM b)
      |  UNION ALL
      |  SELECT 'exc_d' AS op, nk FROM (SELECT nk FROM a EXCEPT SELECT nk FROM b)
      |  UNION ALL
      |  SELECT 'exc_a' AS op, nk FROM (SELECT nk FROM a EXCEPT ALL SELECT nk FROM b))
      |SELECT op, nk, count(*) AS cnt FROM u GROUP BY op, nk
      |ORDER BY op, nk""".stripMargin

  // ---- q75 Z-order value (data-layout clustering) ------------------------
  // The Morton interleave behind Layout.zorderByRange (file/row-group
  // skipping on multi-dimension predicates — LayoutSpec measures the
  // skipping ratio; SCALE.md records it). Pure shift/mask/or arithmetic,
  // mirrored term-for-term in the oracle.
  val q75: Q = (s, d) =>
    Tables.orders(s, d).select(col("o_orderkey"),
      graft.operators.Layout.zValue(
        Seq(col("o_custkey") % 1024, col("o_orderkey") % 1024),
        bits = 10).as("z"))
      .orderBy("o_orderkey")

  val q75Sql: String = {
    val terms = for {
      (c, j) <- Seq("(o_custkey % 1024)", "(o_orderkey % 1024)").zipWithIndex
      i <- 0 until 10
    } yield s"((($c >> $i) & 1) << ${i * 2 + j})"
    s"""SELECT o_orderkey, ${terms.mkString(" + ")} AS z
       |FROM orders ORDER BY o_orderkey""".stripMargin
  }

  // ---- q62 bounded range join (views in the hour before each click) -----
  // Engine = Temporal.rangeJoin (bucketed EQUI join + exact refine; the
  // plan has no nested-loop stage — pinned in PlanContractSpec). Oracle =
  // the direct inequality join. Zero-view clicks survive via the left join
  // back onto the click set.
  val q62: Q = (s, d) => {
    val e = Tables.events(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"),
        col("event_id").as("view_id"),
        graft.core.Ops.fixedPoint(col("value"), 4).as("v_e4"))
    val agg = graft.operators.Temporal.rangeJoin(
        clicks, "user_id", "ts", views, "user_id", "ts",
        lowerSec = -3600L, upperSec = 0L, payload = Seq("view_id", "v_e4"))
      .groupBy("event_id", "user_id")
      .agg(count(lit(1)).as("n"), sum("v_e4").as("sv"))
    clicks.join(agg, Seq("event_id", "user_id"), "left_outer")
      .select(col("event_id"), col("user_id"),
        coalesce(col("n"), lit(0L)).as("n_views"),
        coalesce(col("sv"), lit(0L)).as("sum_v_e4"))
      .orderBy("event_id")
  }

  val q62Sql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, date_trunc('milliseconds', ts) AS ts,
      |         event_type, value
      |  FROM events),
      |c AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click'),
      |v AS (SELECT event_id AS view_id, user_id, ts,
      |        CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v_e4
      |      FROM e WHERE event_type = 'view')
      |SELECT c.event_id, c.user_id,
      |  CAST(count(v.view_id) AS BIGINT) AS n_views,
      |  CAST(coalesce(sum(v.v_e4), 0) AS BIGINT) AS sum_v_e4
      |FROM c LEFT JOIN v ON v.user_id = c.user_id
      |  AND epoch_us(v.ts) BETWEEN epoch_us(c.ts) - 3600000000 AND epoch_us(c.ts)
      |GROUP BY c.event_id, c.user_id
      |ORDER BY c.event_id""".stripMargin

  // ---- q63 Bloom-prefiltered semi join ----------------------------------
  // Engine = Bloom.bloomSemiJoin: fact rows failing the literal-array bit
  // test never reach the join shuffle; the exact semi join then removes
  // the Bloom's false positives, so the result is EXACT and the oracle is
  // the plain EXISTS — independent of the Bloom entirely.
  val q63: Q = (s, d) => {
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    graft.core.Bloom.bloomSemiJoin(
        Tables.lineitem(s, d), "l_orderkey", urgent, "o_orderkey")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(graft.core.Ops.fixedPoint(col("l_quantity"), 2)).as("sum_qty_e2"))
      .orderBy("l_returnflag")
  }

  val q63Sql: String =
    """SELECT l.l_returnflag,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS sum_qty_e2
      |FROM lineitem l
      |WHERE EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_orderkey = l.l_orderkey AND o.o_orderpriority = '1-URGENT')
      |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin

  // ---- q120 Hilbert-curve index (data-layout clustering) -----------------
  // The no-long-jump space-filling curve behind Layout.hilbertByRange
  // (LayoutSpec measures Hilbert ≤ Z-order partitions touched on the same
  // box-predicate grid). The per-bit xy2d rotation recurrence unrolls into
  // 10 chained projections of CASE/shift/mask arithmetic, mirrored
  // term-for-term by Layout.hilbertDuckCtes.
  val q120: Q = (s, d) =>
    graft.operators.Layout.withHilbert(
        Tables.orders(s, d).select(col("o_orderkey"),
          (col("o_custkey") % 1024).as("hx0"),
          (col("o_orderkey") % 1024).as("hy0")),
        "hx0", "hy0", "h", bits = 10)
      .select("o_orderkey", "h")
      .orderBy("o_orderkey")

  val q120Sql: String = {
    val ctes = graft.operators.Layout.hilbertDuckCtes(
      "hbase", "hstep", bits = 10, carryCols = Seq("o_orderkey"))
    s"""WITH hbase AS (SELECT o_orderkey,
       |    (o_custkey % 1024) AS hx, (o_orderkey % 1024) AS hy,
       |    CAST(0 AS BIGINT) AS hd
       |  FROM orders),
       |$ctes
       |SELECT o_orderkey, hd AS h FROM hstep_0 ORDER BY o_orderkey""".stripMargin
  }

  // ---- q126 3-D Hilbert index (Skilling transpose) -----------------------
  // Layout.withHilbertN — the d-dimensional generalization (bijectivity
  // + adjacency property-tested in LayoutSpec); the oracle runs the same
  // unrolled step chain emitted by hilbertNDuckCtes.
  val q126: Q = (s, d) =>
    graft.operators.Layout.withHilbertN(
        Tables.orders(s, d).select(col("o_orderkey"),
          (col("o_custkey") % 256).as("hx"),
          (col("o_orderkey") % 256).as("hy"),
          ((col("o_orderkey") / 7).cast("long") % 256).as("hz")),
        Seq("hx", "hy", "hz"), "h", bits = 8)
      .select("o_orderkey", "h")
      .orderBy("o_orderkey")

  val q126Sql: String = {
    val ctes = graft.operators.Layout.hilbertNDuckCtes(
      "hbase", "hn", bits = 8, d = 3, carryCols = Seq("o_orderkey"))
    s"""WITH hbase AS (SELECT o_orderkey,
       |    (o_custkey % 256) AS x0, (o_orderkey % 256) AS x1,
       |    (CAST(floor(o_orderkey / 7.0) AS BIGINT) % 256) AS x2
       |  FROM orders),
       |$ctes
       |SELECT o_orderkey, hd AS h FROM hn_out ORDER BY o_orderkey""".stripMargin
  }

  // ---- q124 ordered funnel steps -----------------------------------------
  // Journeys.funnelSteps: view → click → purchase with STRICT ordering
  // (each step's window opens at the previous step's matched time). The
  // oracle is the identical chain of filtered min-aggregates as CTEs —
  // the funnel definition, not the implementation.
  val q124: Q = (s, d) =>
    graft.operators.Journeys.funnelSteps(
        Tables.events(s, d), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("user_id")

  val q124Sql: String =
    """WITH e AS (SELECT user_id, date_trunc('milliseconds', ts) AS ts,
      |    event_type FROM events),
      |s0 AS (SELECT user_id, min(ts) AS t0 FROM e
      |  WHERE event_type = 'view' GROUP BY 1),
      |s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM e JOIN s0 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > s0.t0 GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > s1.t1 GROUP BY 1)
      |SELECT s0.user_id, s0.t0, s1.t1, s2.t2,
      |  CAST(1 + CASE WHEN s1.t1 IS NULL THEN 0 ELSE 1 END
      |    + CASE WHEN s2.t2 IS NULL THEN 0 ELSE 1 END AS BIGINT)
      |    AS steps_reached
      |FROM s0 LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
      |ORDER BY user_id""".stripMargin

  // ---- q125 weekly cohort retention --------------------------------------
  // Journeys.cohortRetention: cohort = week of first event (integer day
  // arithmetic from the Monday epoch — no engine week-start semantics),
  // retention = distinct active members per weeks-since-first.
  val q125: Q = (s, d) =>
    graft.operators.Journeys.cohortRetention(
        Tables.events(s, d), "user_id", "ts")
      .orderBy("cohort_wk", "period_wk")

  val q125Sql: String =
    """WITH e AS (SELECT user_id, date_trunc('milliseconds', ts) AS ts
      |  FROM events),
      |f AS (SELECT user_id, CAST(floor(date_diff('day', DATE '1970-01-05',
      |    CAST(min(ts) AS DATE)) / 7) AS BIGINT) AS cohort_wk
      |  FROM e GROUP BY 1),
      |a AS (SELECT e.user_id, f.cohort_wk,
      |    CAST(floor(date_diff('day', DATE '1970-01-05',
      |      CAST(e.ts AS DATE)) / 7) AS BIGINT) - f.cohort_wk AS period_wk
      |  FROM e JOIN f USING (user_id)),
      |g AS (SELECT cohort_wk, period_wk,
      |    CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
      |  FROM a GROUP BY 1, 2),
      |sz AS (SELECT cohort_wk,
      |    CAST(count(DISTINCT user_id) AS BIGINT) AS cohort_size
      |  FROM f GROUP BY 1)
      |SELECT g.cohort_wk, g.period_wk, g.active_users, sz.cohort_size,
      |  CAST(floor(g.active_users * 1.0 / sz.cohort_size * 10000 + 0.5)
      |    AS BIGINT) AS retention_e4
      |FROM g JOIN sz USING (cohort_wk)
      |ORDER BY cohort_wk, period_wk""".stripMargin

  // ---- family registry --------------------------------------------------

  private[probes] val queries: Map[String, Q] = Map(
    "q37_stratified_sample" -> q37,
    "q39_shard_assignment" -> q39,
    "q47_approx_aggs" -> q47,
    "q56_user_rights_sort" -> q56,
    "q61_asof_join" -> q61,
    "q62_range_join" -> q62,
    "q63_bloom_semi_join" -> q63,
    "q69_asof_bucketed" -> q69,
    "q71_asof_native" -> q71,
    "q72_session_window" -> q72,
    "q73_window_breadth" -> q73,
    "q74_fuzzy_match" -> q74,
    "q75_zorder" -> q75,
    "q77_set_ops" -> q77,
    "q81_pagerank" -> q81,
    "q120_hilbert" -> q120,
    "q124_funnel_steps" -> q124,
    "q125_cohort_retention" -> q125,
    "q126_hilbert3d" -> q126)

  private[probes] val oracleSql: Map[String, String] = Map(
    "q37_stratified_sample" -> q37Sql,
    "q39_shard_assignment" -> q39Sql,
    "q47_approx_aggs" -> q47Sql,
    "q56_user_rights_sort" -> q56Sql,
    "q61_asof_join" -> q61Sql,
    "q62_range_join" -> q62Sql,
    "q63_bloom_semi_join" -> q63Sql,
    "q69_asof_bucketed" -> q69Sql,
    "q71_asof_native" -> q71Sql,
    "q72_session_window" -> q72Sql,
    "q73_window_breadth" -> q73Sql,
    "q74_fuzzy_match" -> q74Sql,
    "q75_zorder" -> q75Sql,
    "q77_set_ops" -> q77Sql,
    "q81_pagerank" -> q81Sql,
    "q120_hilbert" -> q120Sql,
    "q124_funnel_steps" -> q124Sql,
    "q125_cohort_retention" -> q125Sql,
    "q126_hilbert3d" -> q126Sql)
}
