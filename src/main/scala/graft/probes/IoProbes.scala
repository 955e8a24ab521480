package graft.probes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curation, Dedup, Multimodal, Similarity, TextStats}
import ProbeShared._

/** IO/composed-pipeline probe family: sketches (CMS, HLL), WARC parse,
  * HTML extraction, zip introspection, size-change detection, inventory
  * parse, composed crawl ingest.
  *
  * Split from the former monolithic ExtProbes (3.1 kLoC); aggregated and
  * re-exported by [[ExtProbes]] — registry keys, probe bodies, and oracle
  * SQL unchanged.
  */
object IoProbes {
  // ---- q106 count-min heavy hitters --------------------------------------
  // 4×64 count-min over the term vocabulary (counters built from the
  // pre-aggregated counts — identical to sketching raw occurrences,
  // without the ×depth corpus explode); candidates = global top-20 terms
  // via TakeOrderedAndProject (no single-partition window). est ≥ exact
  // always (CMS one-sided error) — the oracle recomputes the identical
  // sketch, so the check is exact equality, not the inequality.
  val q106: Q = (s, d) => {
    val cnt = graft.core.Ops.widen(Tables.documents(s, d))
      .select(explode(Dedup.normalizeWords(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("exact"))
    val counters = graft.operators.Sketches.cmsCounters(cnt, "term", "exact")
    val cand = cnt.orderBy(col("exact").desc, col("term").asc).limit(20)
    cand.join(
        graft.operators.Sketches.cmsEstimates(cand.select("term"), "term",
          counters),
        Seq("term"))
      .select(col("term"), col("exact"), col("est"))
      .orderBy("term")
  }

  val q106Sql: String =
    s"""WITH ws AS (SELECT unnest($duckWords) AS term FROM documents),
       |cnt AS (SELECT term, CAST(count(*) AS BIGINT) AS exact
       |  FROM ws GROUP BY term),
       |cand AS (SELECT term, exact FROM (
       |  SELECT term, exact, row_number() OVER (
       |    ORDER BY exact DESC, term) AS rn FROM cnt) WHERE rn <= 20),
       |cb AS (SELECT term, exact, t.j,
       |    ('0x' || substr(md5(term || ':' || t.j), 1, 8))::BIGINT % 64
       |      AS bucket
       |  FROM cnt, range(4) t(j)),
       |ctr AS (SELECT j, bucket, CAST(sum(exact) AS BIGINT) AS c
       |  FROM cb GROUP BY j, bucket),
       |qb AS (SELECT cand.term, cand.exact, t.j,
       |    ('0x' || substr(md5(cand.term || ':' || t.j), 1, 8))::BIGINT % 64
       |      AS bucket
       |  FROM cand, range(4) t(j)),
       |est AS (SELECT qb.term, qb.exact, CAST(min(ctr.c) AS BIGINT) AS est
       |  FROM qb JOIN ctr ON ctr.j = qb.j AND ctr.bucket = qb.bucket
       |  GROUP BY qb.term, qb.exact)
       |SELECT term, exact, est FROM est ORDER BY term""".stripMargin

  // ---- q107 HyperLogLog distinct count -----------------------------------
  // m = 64 registers from a 60-bit md5 hash; the register sum is kept
  // integral (s55 = Σ 2^(55−M_b), order-free) so the only float op is
  // the final alpha·m²/s55 division — identical expression tree both
  // sides. Output pins the integer core (s55, zeros) AND the rounded
  // estimate, plus the exact distinct for reference.
  val q107: Q = (s, d) => {
    val terms = graft.core.Ops.widen(Tables.documents(s, d))
      .select(explode(Dedup.normalizeWords(col("text"))).as("term"))
    val est = graft.operators.Sketches.hllEstimate(
      graft.operators.Sketches.hllRegisters(terms, "term"))
    val exact = terms.agg(count_distinct(col("term")).as("exact"))
    exact.crossJoin(broadcast(est))
      .select(col("exact"), col("zeros"), col("s55"), col("est_e6"))
  }

  val q107Sql: String =
    s"""WITH ws AS (SELECT unnest($duckWords) AS term FROM documents),
       |k AS (SELECT DISTINCT term FROM ws),
       |v AS (SELECT ('0x' || substr(md5(term), 1, 15))::BIGINT AS v FROM k),
       |r AS (SELECT v % 64 AS bucket,
       |    CASE WHEN v // 64 = 0 THEN 55
       |         ELSE 55 - length(bin(v // 64)) END AS rho FROM v),
       |reg AS (SELECT bucket, max(rho) AS mrho FROM r GROUP BY bucket),
       |s AS (SELECT
       |    CAST(sum(CAST(1 AS BIGINT) << CAST(55 - mrho AS INTEGER))
       |      + (64 - count(*)) * (CAST(1 AS BIGINT) << 55) AS BIGINT)
       |      AS s55,
       |    CAST(64 - count(*) AS BIGINT) AS zeros FROM reg),
       |e AS (SELECT s55, zeros,
       |    0.709e0 * 4096e0 * 36028797018963968e0 / s55 AS eraw FROM s)
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM k) AS exact,
       |  zeros, s55,
       |  CAST(floor(CASE WHEN eraw <= 160e0 AND zeros > 0
       |      THEN 64e0 * ln(64e0 / zeros) ELSE eraw END * 1e6 + 0.5)
       |    AS BIGINT) AS est_e6
       |FROM e""".stripMargin

  // ---- q108 WARC record parse --------------------------------------------
  // Documents grouped 10-per-file into spec-shaped WARC payloads (one
  // warcinfo + one response record per doc, HTTP layer included), then
  // parsed BACK by the byte-offset scanner. The oracle recomputes every
  // field from the synthesis arithmetic: clen = 45-byte HTTP prefix +
  // UTF-8 octet length, rec_index = gap-proof row_number within the
  // file (warcinfo holds slot 0). Probe checks the full response set.
  val q108: Q = (s, d) => {
    import s.implicits._
    val docs = graft.core.Ops.widen(Tables.documents(s, d))
      .select(col("doc_id"), col("text"),
        expr("doc_id div 10").cast("long").as("fid"))
      .as[(Long, String, Long)]
    val files = docs.groupByKey(_._3).mapGroups { (fid, it) =>
      graft.sources.Warc.buildFile(fid,
        it.toSeq.sortBy(_._1).map(t => (t._1, t._2)))
    }
    graft.sources.Warc.parseRecords(files).toDF()
      .filter(col("warc_type") === "response")
      .select(
        regexp_extract(col("uri"), "([0-9]+)$", 1).cast("long").as("doc_id"),
        col("uri"), col("rec_index"), col("http_status").as("status"),
        col("content_length").as("clen"), col("body"))
      .orderBy("doc_id")
  }

  val q108Sql: String =
    """SELECT doc_id,
      |  'https://example.org/doc/' || doc_id AS uri,
      |  CAST(row_number() OVER (PARTITION BY doc_id // 10
      |    ORDER BY doc_id) AS INTEGER) AS rec_index,
      |  CAST(200 AS INTEGER) AS status,
      |  CAST(45 + octet_length(encode(text)) AS BIGINT) AS clen,
      |  text AS body
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- q109 HTML → text extraction ---------------------------------------
  // Doc text wrapped in a synthesized page (title, script with entities,
  // style, nav, footer) — the extractor must drop the script/style
  // SUBTREES, keep nav/footer TEXT (boilerplate removal is q59's job,
  // not the parser's), single-unescape entities (&amp; last), and
  // collapse whitespace. Oracle applies the identical chain to the
  // identical synthesis — the probe pins Java-regex ≡ RE2 semantics on
  // the shared subset.
  private val q109Page: (String, String) = (
    "<html><head><title>d",
    """</title><script type="text/javascript">if (1 &lt; 2) { x = "&amp;"; }
      |</script><style>p { color: red; }</style></head><body>
      |<nav>home &gt; docs</nav><p>""".stripMargin)
  private val q109Tail =
    "</p><footer>&copy; 2026 Example &amp; Sons</footer></body></html>"

  val q109: Q = (s, d) => {
    val html = concat(lit(q109Page._1), col("doc_id").cast("string"),
      lit(q109Page._2), col("text"), lit(q109Tail))
    graft.core.Ops.widen(Tables.documents(s, d))
      .select(col("doc_id"), Curation.htmlToText(html).as("clean"))
      .orderBy("doc_id")
  }

  val q109Sql: String = {
    val htmlExpr = s"'${q109Page._1}' || doc_id || " +
      s"'${q109Page._2.replace("'", "''")}' || text || " +
      s"'${q109Tail.replace("'", "''")}'"
    s"""SELECT doc_id, ${Curation.htmlToTextDuckSql(htmlExpr)} AS clean
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---- q113 zip introspection round-trip (OP-4) --------------------------
  // Per doc, a REAL zip is built in-plan (java.util.zip, fixed entry
  // timestamps) and pushed through Payloads.validZips — the reference's
  // one-member payload gate (cloud.py zip handling; Payloads.scala:37).
  // Planting: doc_id%5==0 gets a second member (violates the one-member
  // rule), doc_id%7==3 loses its last 40 bytes (EOCD gone — the
  // half-uploaded archive validZips must treat as invalid, not throw on).
  // The oracle never builds zips: it PREDICTS the survivors and their
  // member names from the same id arithmetic — the q82/q94 synthesis
  // pattern applied to archives.
  def q113Zip(id: Long, text: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    val e = new java.util.zip.ZipEntry(s"dump_$id.sql")
    e.setTime(0L)
    z.putNextEntry(e)
    z.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    z.closeEntry()
    if (id % 5 == 0) {
      val e2 = new java.util.zip.ZipEntry("extra.txt")
      e2.setTime(0L)
      z.putNextEntry(e2)
      z.write("x".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      z.closeEntry()
    }
    z.close()
    val b = bos.toByteArray
    if (id % 7 == 3) b.dropRight(40) else b
  }

  val q113: Q = (s, d) => {
    import s.implicits._
    val payloads = graft.core.Ops.widen(Tables.documents(s, d))
      .select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) => (s"pay_$id.zip", q113Zip(id, text)) }
      .toDF("path", "content")
    graft.sources.Payloads.validZips(payloads).orderBy("path")
  }

  val q113Sql: String =
    """SELECT 'pay_' || CAST(doc_id AS VARCHAR) || '.zip' AS path,
      |  'dump_' || CAST(doc_id AS VARCHAR) || '.sql' AS member
      |FROM documents
      |WHERE doc_id % 5 <> 0 AND doc_id % 7 <> 3
      |ORDER BY path""".stripMargin

  // ---- q114 size-based change detection (OP-49) --------------------------
  // Stored catalog = docs with doc_id%3<>0 (every third doc has no
  // recorded length); remote listing shifts doc_id%4==0 lengths by +10.
  // needsReloadCol (the set form of Restore.needsReload, db.py:695-711)
  // must flag BOTH the missing and the changed rows.
  val q114: Q = (s, d) => {
    val docs = graft.core.Ops.widen(Tables.documents(s, d))
    val stored = docs.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), col("n_chars").as("stored_len"))
    val remote = docs.select(col("doc_id"),
      (col("n_chars") + when(col("doc_id") % 4 === 0, lit(10L))
        .otherwise(lit(0L))).as("remote_len"))
    remote.join(stored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("stored_len"), col("remote_len"),
        graft.pipeline.Restore.needsReloadCol(
          col("stored_len"), col("remote_len")).as("needs_reload"))
      .orderBy("doc_id")
  }

  val q114Sql: String =
    """WITH stored AS (SELECT doc_id, n_chars AS stored_len
      |  FROM documents WHERE doc_id % 3 <> 0),
      |r AS (SELECT doc_id, n_chars +
      |    CASE WHEN doc_id % 4 = 0 THEN 10 ELSE 0 END AS remote_len
      |  FROM documents)
      |SELECT r.doc_id, stored.stored_len, r.remote_len,
      |  (stored.stored_len IS DISTINCT FROM r.remote_len) AS needs_reload
      |FROM r LEFT JOIN stored ON r.doc_id = stored.doc_id
      |ORDER BY r.doc_id""".stripMargin

  // ---- q115 cloud inventory listing parse (OP-1/OP-2) --------------------
  // A full synthetic WebDAV listing derived from the documents table:
  // non-zip rows (%11), dash-less zips (%13) and the ±15-minute in-flight
  // window around a literal asOf all filtered by Inventory.parse
  // (cloud.py:110-141, the 900 s guard at :132 — the EXACT-900 s boundary
  // is kept on both sides, which the minute grid exercises); instance =
  // filename minus its last '-'-token (cloud.py:177). Oracle mirrors the
  // whole parse columnar.
  val q115: Q = (s, d) => {
    val asOf = java.sql.Timestamp.valueOf("2016-03-02 00:00:00")
    val dow = element_at(
      array(Seq("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
        .map(lit): _*),
      (col("doc_id") % 7).cast("int") + 1)
    val file = when(col("doc_id") % 11 === 0,
        concat(lit("notes_"), col("doc_id"), lit(".txt")))
      .when(col("doc_id") % 13 === 0,
        concat(lit("NODASH"), col("doc_id"), lit(".zip")))
      .otherwise(concat(lit("OCG_"), upper(col("lang")), lit("_"),
        col("doc_id"), lit("-"), dow, lit(".zip")))
    val m = expr("timestamp'2016-03-01 00:00:00' + " +
      "make_interval(0, 0, 0, 0, 0, CAST(doc_id % 7000 AS INT), 0)")
    val listing = graft.core.Ops.widen(Tables.documents(s, d))
      .select(file.as("file"),
        concat(lit("/dav/"), file).as("url"),
        concat(date_format(m, "yyyy-MM-dd'T'HH:mm:ss"), lit("Z"))
          .as("modified_raw"))
    graft.sources.Inventory.parse(listing, lit(asOf))
      .withColumn("modified", col("modified").cast("timestamp_ntz"))
      .select("file", "url", "modified", "instance")
      .orderBy("file")
  }

  val q115Sql: String =
    """WITH l AS (SELECT
      |    CASE WHEN doc_id % 11 = 0 THEN 'notes_' || doc_id || '.txt'
      |         WHEN doc_id % 13 = 0 THEN 'NODASH' || doc_id || '.zip'
      |         ELSE 'OCG_' || upper(lang) || '_' || doc_id || '-' ||
      |           ['Mon','Tue','Wed','Thu','Fri','Sat','Sun']
      |             [CAST(doc_id % 7 AS INT) + 1] || '.zip' END AS file,
      |    TIMESTAMP '2016-03-01 00:00:00' +
      |      to_minutes(CAST(doc_id % 7000 AS BIGINT)) AS m
      |  FROM documents),
      |f AS (SELECT file, '/dav/' || file AS url, m AS modified FROM l
      |  WHERE file LIKE '%.zip' AND contains(file, '-')
      |    AND abs(epoch(m) -
      |      epoch(TIMESTAMP '2016-03-02 00:00:00')) >= 900)
      |SELECT file, url, modified,
      |  array_to_string(list_slice(string_split(file, '-'), 1,
      |    greatest(len(string_split(file, '-')) - 1, 1)), '-') AS instance
      |FROM f ORDER BY file""".stripMargin

  // ---- q116 composed crawl ingest (WARC → keep-filter → HTML→text) -------
  // The batch surface of streaming/WarcIngestStream.docs (one definition,
  // both engines — the spec pins stream parity, THIS pins the values):
  // documents grouped 10-per-file into WARC payloads whose responses
  // carry an HTML-wrapped page, pushed through the composed parse +
  // response/200 filter + htmlToText. The oracle rebuilds the ids from
  // the grouping arithmetic (fid·2^20 + rec_index, responses from slot 1)
  // and mirrors the extraction chain via htmlToTextDuckSql.
  val q116: Q = (s, d) => {
    import s.implicits._
    val docs = graft.core.Ops.widen(Tables.documents(s, d))
      .select(col("doc_id"),
        concat(lit("<html><head><script>var x = 1 &lt; 2;</script></head>"
            + "<body><nav>home &gt; docs</nav><p>"),
          col("text"), lit("</p></body></html>")).as("page"),
        expr("doc_id div 10").cast("long").as("fid"))
      .as[(Long, String, Long)]
    val files = docs.groupByKey(_._3).mapGroups { (fid, it) =>
      graft.sources.Warc.buildFile(fid,
        it.toSeq.sortBy(_._1).map(t => (t._1, t._2)))
    }
    graft.streaming.WarcIngestStream.docs(files).orderBy("id")
  }

  val q116Sql: String = {
    val page = "'<html><head><script>var x = 1 &lt; 2;</script></head>" +
      "<body><nav>home &gt; docs</nav><p>' || text || '</p></body></html>'"
    s"""WITH f AS (SELECT doc_id, text, doc_id // 10 AS fid,
       |    CAST(row_number() OVER (PARTITION BY doc_id // 10
       |      ORDER BY doc_id) AS BIGINT) AS rec_index
       |  FROM documents),
       |x AS (SELECT fid * 1048576 + rec_index AS id,
       |    ${graft.operators.Curation.htmlToTextDuckSql(page)} AS text
       |  FROM f)
       |SELECT id, text FROM x WHERE length(text) > 0 ORDER BY id""".stripMargin
    // the WHERE mirrors WarcIngestStream.docs's length(text) > 0 keep-filter
    // STRUCTURALLY — without it, parity held only because the synthetic page
    // always contains non-empty nav text (ADVICE r8)
  }

  // ---- q132 gzipped WARC parse (.warc.gz member + whole-file layouts) ----
  // The q108 corpus re-synthesized COMPRESSED: even-numbered files in
  // Common Crawl's one-gzip-member-per-record layout, odd files as one
  // whole-file member — the two real-world `.warc.gz` shapes. parseFile
  // sniffs + inflates (JDK GZIPInputStream walks concatenated members)
  // and must recover the byte-identical record stream, so the oracle is
  // the SAME synthesis arithmetic as q108's: any inflate bug (member
  // boundary, trailer handling, sniff miss) breaks the hash.
  val q132: Q = (s, d) => {
    import s.implicits._
    val docs = graft.core.Ops.widen(Tables.documents(s, d))
      .select(col("doc_id"), col("text"),
        expr("doc_id div 10").cast("long").as("fid"))
      .as[(Long, String, Long)]
    val files = docs.groupByKey(_._3).mapGroups { (fid, it) =>
      val payload = it.toSeq.sortBy(_._1).map(t => (t._1, t._2))
      if (fid % 2 == 0) graft.sources.Warc.buildFileGz(fid, payload)
      else graft.sources.Warc.buildFileWholeGz(fid, payload)
    }
    graft.sources.Warc.parseRecords(files).toDF()
      .filter(col("warc_type") === "response")
      .select(
        regexp_extract(col("uri"), "([0-9]+)$", 1).cast("long").as("doc_id"),
        col("uri"), col("rec_index"), col("http_status").as("status"),
        col("content_length").as("clen"), col("body"))
      .orderBy("doc_id")
  }

  val q132Sql: String = q108Sql

  // ---- family registry --------------------------------------------------

  private[probes] val queries: Map[String, Q] = Map(
    "q106_cms_heavy" -> q106,
    "q107_hll_distinct" -> q107,
    "q108_warc_parse" -> q108,
    "q109_html_text" -> q109,
    "q113_zip_introspect" -> q113,
    "q114_size_change" -> q114,
    "q115_inventory_parse" -> q115,
    "q116_crawl_ingest" -> q116,
    "q132_warc_gz" -> q132)

  private[probes] val oracleSql: Map[String, String] = Map(
    "q106_cms_heavy" -> q106Sql,
    "q107_hll_distinct" -> q107Sql,
    "q108_warc_parse" -> q108Sql,
    "q109_html_text" -> q109Sql,
    "q113_zip_introspect" -> q113Sql,
    "q114_size_change" -> q114Sql,
    "q115_inventory_parse" -> q115Sql,
    "q116_crawl_ingest" -> q116Sql,
    "q132_warc_gz" -> q132Sql)
}
