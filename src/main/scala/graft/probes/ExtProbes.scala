package graft.probes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curation, Dedup, Multimodal, Similarity, TextStats}

/** North-star LLM-pipeline extension probes (q27+): dedup family, similarity
  * search, text analysis, multimodal plumbing. The synthetic corpus has no
  * organic near-dups (dedup would trivially return everything), so near-dup
  * probes PLANT mutated copies — identically in engine and oracle — and the
  * probe verifies the operator finds exactly the planted pairs.
  */
object ExtProbes {
  private type Q = (SparkSession, String) => DataFrame

  /** Shared normalize/shingle SQL fragments for the DuckDB side. */
  private val duckWords =
    "list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '')"

  // ---- q27 MinHash + LSH near-dup ---------------------------------------
  private def plantedDocs(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select("doc_id", "text")
    val planted = base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz yy xx")).as("text"))
    base.unionByName(planted)
  }

  val q27: Q = (s, d) =>
    Dedup.minhashNearDupPairs(plantedDocs(s, d), "doc_id", "text")
      .orderBy("idA", "idB")

  val q27Sql: String = {
    // Hash-once algebra, constants shared with Dedup.minhashA/B: one md5
    // per shingle -> 32-bit base value mod p, then affine permutations in
    // BIGINT arithmetic ('0x'||hex)::BIGINT == Spark conv(hex,16,10)).
    val p = graft.operators.Dedup.MinhashP
    val sigs = (0 until 12).map { h =>
      val (a, b) = (graft.operators.Dedup.minhashA(h), graft.operators.Dedup.minhashB(h))
      s"list_min(list_transform(hv, v -> ($a * v + $b) % $p)) AS h$h"
    }.mkString(",\n    ")
    val bandRows = (0 until 4).map { b =>
      val r = (0 until 3).map(i => s"h${b * 3 + i}").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, $r AS bh FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000, text || ' zz yy xx' FROM documents WHERE doc_id % 7 = 0),
       |n AS (SELECT doc_id, $duckWords AS w FROM corpus),
       |shl AS (SELECT doc_id,
       |  CASE WHEN len(w) >= 3 THEN list_transform(generate_series(1, len(w)-2),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) ELSE []::VARCHAR[] END AS sh
       |  FROM n),
       |hvt AS (SELECT doc_id,
       |  list_transform(sh, x -> ('0x' || substring(md5(x), 1, 8))::BIGINT % $p) AS hv
       |  FROM shl WHERE len(sh) > 0),
       |sig AS (SELECT doc_id,
       |    $sigs
       |  FROM hvt),
       |bands AS (
       |  $bandRows),
       |cand AS (SELECT DISTINCT a.doc_id AS idA, b.doc_id AS idB
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |sets AS (SELECT doc_id, list_distinct(sh) AS shd FROM shl WHERE len(sh) > 0)
       |SELECT c.idA, c.idB,
       |  CAST(floor(len(list_intersect(sa.shd, sb.shd)) * 1.0 /
       |    (len(sa.shd) + len(sb.shd) - len(list_intersect(sa.shd, sb.shd)))
       |    * 10000 + 0.5) AS BIGINT) AS jacc_e4
       |FROM cand c
       |JOIN sets sa ON sa.doc_id = c.idA
       |JOIN sets sb ON sb.doc_id = c.idB
       |ORDER BY idA, idB""".stripMargin
  }

  // ---- q28 SimHash -------------------------------------------------------
  val q28: Q = (s, d) =>
    Tables.documents(s, d)
      .transform(graft.core.Ops.widen(_)) // 1-row-group parquet: parallelize the md5 map
      .withColumn("wh", Dedup.tokenHashes(Dedup.normalizeWords(col("text"))))
      .withColumn("simhash", Dedup.simhash16)
      .withColumn("nbits", expr("CAST(bit_count(simhash) AS BIGINT)"))
      .select("doc_id", "simhash", "nbits")
      .orderBy("doc_id")

  val q28Sql: String =
    s"""WITH n AS (SELECT doc_id, $duckWords AS w FROM documents)
       |SELECT doc_id, ${Dedup.simhash16DuckSql} AS simhash,
       |       CAST(bit_count(${Dedup.simhash16DuckSql}) AS BIGINT) AS nbits
       |FROM n ORDER BY doc_id""".stripMargin

  // ---- q29 n-gram Jaccard via explode-join ------------------------------
  // Runs the operator at its DEFAULT hot-gram cap (maxGramDocFreq=1000 —
  // the 100 TB-safe mode); the oracle mirrors the doc-frequency filter, so
  // the capped semantics is what's verified, not just exercised.
  val q29: Q = (s, d) => {
    val base = Tables.documents(s, d).filter(col("doc_id") < 200)
      .select("doc_id", "text")
    val planted = base.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz yy")).as("text"))
    Dedup.ngramJaccardPairs(base.unionByName(planted), "doc_id", "text", 0.3)
      .orderBy("idA", "idB")
  }

  val q29Sql: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < 200
       |  UNION ALL
       |  SELECT doc_id + 100000, text || ' zz yy' FROM documents
       |  WHERE doc_id < 200 AND doc_id % 9 = 0),
       |n AS (SELECT doc_id, $duckWords AS w FROM corpus),
       |g AS (SELECT doc_id, list_distinct(
       |    CASE WHEN len(w) >= 2 THEN list_transform(generate_series(1, len(w)-1),
       |      i -> w[i] || ' ' || w[i+1]) ELSE []::VARCHAR[] END) AS g
       |  FROM n),
       |gnz AS (SELECT doc_id, g, len(g) AS n FROM g WHERE len(g) > 0),
       |ex AS (SELECT doc_id, unnest(g) AS gram FROM gnz),
       |keep AS (SELECT gram FROM ex GROUP BY gram
       |  HAVING count(*) <= ${Dedup.DefaultMaxGramDocFreq}),
       |exc AS (SELECT ex.doc_id, ex.gram FROM ex JOIN keep USING (gram)),
       |inter AS (SELECT x.doc_id AS idA, y.doc_id AS idB, count(*) AS ninter
       |  FROM exc x JOIN exc y ON x.gram = y.gram AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |j AS (SELECT idA, idB, ninter * 1.0 / (a.n + b.n - ninter) AS raw
       |  FROM inter JOIN gnz a ON a.doc_id = idA JOIN gnz b ON b.doc_id = idB)
       |SELECT idA, idB, CAST(floor(raw * 10000 + 0.5) AS BIGINT) AS jacc_e4
       |FROM j WHERE raw >= 0.3 ORDER BY idA, idB""".stripMargin

  // ---- q30 embedding-cosine near-dup ------------------------------------
  val q30: Q = (s, d) => {
    val base = Tables.embeddings(s, d).filter(col("vec_id") < 200)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    val planted = base.filter(col("id") % 13 === 0)
      .select((col("id") + 100000).as("id"),
        expr("transform(v, x -> x * 1.1 + 0.01)").as("v"))
    Similarity.cosineNearDupPairs(base.unionByName(planted), 0.9)
      .orderBy("idA", "idB")
  }

  val q30Sql: String =
    s"""WITH base AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE vec_id < 200),
       |corpus AS (
       |  SELECT id, v FROM base
       |  UNION ALL
       |  SELECT id + 100000, list_transform(v, x -> x * 1.1 + 0.01) FROM base
       |  WHERE id % 13 = 0),
       |p AS (SELECT a.id AS idA, b.id AS idB,
       |    ${Similarity.cosineDuckSql("a.v", "b.v")} AS raw
       |  FROM corpus a JOIN corpus b ON a.id < b.id)
       |SELECT idA, idB, ${Similarity.scoreE4DuckSql("raw")} AS score_e4
       |FROM p WHERE raw >= 0.9 ORDER BY idA, idB""".stripMargin

  // ---- q70 IVF-bucketed cosine near-dup (cluster-then-verify) ------------
  // The SCALE path for q30's all-pairs baseline: candidates meet only
  // within a shared centroid cell (one equi shuffle on cell id; nassign=2
  // multi-homes each vector into its runner-up cell to catch boundary
  // pairs), then the exact cosine verifies. Deterministic given the
  // centroid set, so the oracle reproduces the assignment verbatim and the
  // compare is EXACT — the recall-vs-all-pairs tradeoff is measured
  // separately in tools.Recall.
  val q70: Q = (s, d) => {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    val planted = base.filter(col("id") % 13 === 0)
      .select((col("id") + 100000).as("id"),
        expr("transform(v, x -> x * 1.1 + 0.01)").as("v"))
    val centroids = base.filter(col("id") % 25 === 0)
    Similarity.ivfNearDupPairs(base.unionByName(planted), centroids,
        threshold = 0.9, nassign = 2)
      .orderBy("idA", "idB")
  }

  val q70Sql: String = {
    def cos(a: String, b: String) = Similarity.cosineDuckSql(a, b)
    s"""WITH base AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |corpus AS (
       |  SELECT id, v FROM base
       |  UNION ALL
       |  SELECT id + 100000, list_transform(v, x -> x * 1.1 + 0.01) FROM base
       |  WHERE id % 13 = 0),
       |cent AS (SELECT id AS cid, v AS cv FROM base WHERE id % 25 = 0),
       |assigned AS (
       |  SELECT id, v, cid FROM (
       |    SELECT c0.id, c0.v, c.cid,
       |      row_number() OVER (PARTITION BY c0.id
       |        ORDER BY ${cos("c0.v", "c.cv")} DESC, c.cid ASC) AS rn
       |    FROM corpus c0 CROSS JOIN cent c) t(id, v, cid, rn)
       |  WHERE rn <= 2),
       |p AS (
       |  SELECT DISTINCT a.id AS idA, b.id AS idB,
       |    ${cos("a.v", "b.v")} AS raw
       |  FROM assigned a JOIN assigned b USING (cid) WHERE a.id < b.id)
       |SELECT idA, idB, ${Similarity.scoreE4DuckSql("raw")} AS score_e4
       |FROM p WHERE raw >= 0.9 ORDER BY idA, idB""".stripMargin
  }

  // ---- q31 IVF ANN (coarse-quantizer cells + nprobe search) -------------
  val q31: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    val centroids = e.filter(col("id") % 25 === 0)
    val queries = e.filter(col("id") < 30)
    Similarity.ivfTopK(e, centroids, queries, nprobe = 2, k = 3)
      .orderBy("vec_id", "rank")
  }

  val q31Sql: String = {
    def cos(a: String, b: String) = Similarity.cosineDuckSql(a, b)
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent AS (SELECT id AS cid, v AS cv FROM e WHERE id % 25 = 0),
       |assigned AS (
       |  SELECT id AS other_id, v AS vb, cid FROM (
       |    SELECT e.id, e.v, c.cid,
       |      row_number() OVER (PARTITION BY e.id
       |        ORDER BY ${cos("e.v", "c.cv")} DESC, c.cid ASC) AS rn
       |    FROM e CROSS JOIN cent c) t(id, v, cid, rn) WHERE rn = 1),
       |probed AS (
       |  SELECT id AS vec_id, v AS va, cid FROM (
       |    SELECT q.id, q.v, c.cid,
       |      row_number() OVER (PARTITION BY q.id
       |        ORDER BY ${cos("q.v", "c.cv")} DESC, c.cid ASC) AS rn
       |    FROM e q CROSS JOIN cent c WHERE q.id < 30) t(id, v, cid, rn)
       |  WHERE rn <= 2),
       |cand AS (
       |  SELECT p.vec_id, a.other_id,
       |    ${Similarity.scoreE4DuckSql(cos("p.va", "a.vb"))} AS score_e4
       |  FROM probed p JOIN assigned a USING (cid)
       |  WHERE p.vec_id <> a.other_id),
       |r AS (SELECT vec_id, other_id, score_e4,
       |    CAST(row_number() OVER (PARTITION BY vec_id
       |      ORDER BY score_e4 DESC, other_id ASC) AS BIGINT) AS rank
       |  FROM cand)
       |SELECT vec_id, other_id, score_e4, rank FROM r WHERE rank <= 3
       |ORDER BY vec_id, rank""".stripMargin
  }

  // ---- q32 language ID (marker-profile heuristic) -----------------------
  val q32: Q = (s, d) => {
    var df = graft.core.Ops.widen(Tables.documents(s, d))
      .withColumn("w", Dedup.normalizeWords(col("text")))
    for ((name, markers) <- TextStats.LangProfiles)
      df = df.withColumn(s"s_$name",
        TextStats.profileScore(markers).cast("long"))
    df.withColumn("pred", TextStats.langPredict)
      .select("doc_id", "pred", "s_alpha", "s_beta", "s_gamma")
      .orderBy("doc_id")
  }

  val q32Sql: String = {
    val scores = TextStats.LangProfiles.map { case (name, markers) =>
      val in = markers.map(m => s"'$m'").mkString(", ")
      s"CAST(len(list_filter(w, x -> x IN ($in))) AS BIGINT) AS s_$name"
    }.mkString(",\n    ")
    s"""WITH n AS (SELECT doc_id, $duckWords AS w FROM documents),
       |sc AS (SELECT doc_id,
       |    $scores
       |  FROM n)
       |SELECT doc_id, ${TextStats.langPredictDuckSql} AS pred,
       |       s_alpha, s_beta, s_gamma
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  // ---- q33 quality scoring ----------------------------------------------
  val q33: Q = (s, d) =>
    graft.core.Ops.widen(Tables.documents(s, d))
      .withColumn("w", Dedup.normalizeWords(col("text")))
      .withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("score_e4", TextStats.qualityScore(col("text"), col("w")))
      .select("doc_id", "n_words", "score_e4")
      .orderBy("doc_id")

  val q33Sql: String = {
    val stopIn = TextStats.StopWords.map(w => s"'$w'").mkString(", ")
    s"""WITH n AS (SELECT doc_id, text, $duckWords AS w FROM documents),
       |m AS (SELECT doc_id, len(w) AS n_words,
       |    length(text) AS n_chars,
       |    length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS punct,
       |    len(list_filter(w, x -> x IN ($stopIn))) AS stops
       |  FROM n)
       |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       |  CAST(floor((0.5 * least(1.0, n_words / 50.0) +
       |    0.3 * (1.0 - punct * 1.0 / greatest(n_chars, 1)) +
       |    0.2 * (stops * 1.0 / greatest(n_words, 1))) * 10000 + 0.5) AS BIGINT) AS score_e4
       |FROM m ORDER BY doc_id""".stripMargin
  }

  // ---- q34 token counting -----------------------------------------------
  val q34: Q = (s, d) =>
    graft.core.Ops.widen(Tables.documents(s, d))
      .withColumn("ws_toks", TextStats.wsTokenCount(col("text")).cast("long"))
      .withColumn("bpe_toks", TextStats.bpeTokenCount(col("text")).cast("long"))
      .withColumn("cpt_e2",
        floor(length(col("text")) * lit(1.0) / greatest(col("bpe_toks"), lit(1))
          * lit(100d) + lit(0.5)).cast("long"))
      .select("doc_id", "ws_toks", "bpe_toks", "cpt_e2")
      .orderBy("doc_id")

  val q34Sql: String =
    s"""SELECT doc_id,
       |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |       ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ws_toks,
       |  CAST(len(regexp_extract_all(text, '${TextStats.BpeTokenRegex}', 0)) AS BIGINT) AS bpe_toks,
       |  CAST(floor(length(text) * 1.0 /
       |    greatest(len(regexp_extract_all(text, '${TextStats.BpeTokenRegex}', 0)), 1)
       |    * 100 + 0.5) AS BIGINT) AS cpt_e2
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---- q35 winnowing fingerprint ----------------------------------------
  val q35: Q = (s, d) =>
    graft.core.Ops.widen(Tables.documents(s, d))
      .withColumn("gh", expr(TextStats.winnowGramHashExpr))
      .withColumn("wm", expr(TextStats.winnowFromHashesExpr))
      .select(col("doc_id"),
        size(array_distinct(col("wm"))).cast("long").as("n_fp"),
        array_min(col("wm")).as("fp_min"))
      .orderBy("doc_id")

  val q35Sql: String =
    s"""WITH w AS (SELECT doc_id, ${TextStats.winnowDuckSql} AS wm FROM documents)
       |SELECT doc_id, CAST(len(list_distinct(wm)) AS BIGINT) AS n_fp,
       |       list_min(wm) AS fp_min
       |FROM w ORDER BY doc_id""".stripMargin

  // ---- q36 multimodal plumbing (binary payload + stubbed decode) --------
  val q36: Q = (s, d) =>
    Multimodal.decodeStub(
        Multimodal.documentsAsMedia(s, Tables.documents(s, d)))
      .toDF()
      .orderBy("media_id")

  val q36Sql: String =
    """SELECT doc_id AS media_id,
      |  CAST(strlen(text) AS BIGINT) AS n_bytes,
      |  md5(text) AS digest,
      |  CAST(strpos('0123456789abcdef', substr(md5(text), 1, 1)) AS INT) AS fake_width,
      |  CAST(strpos('0123456789abcdef', substr(md5(text), 2, 1)) AS INT) AS fake_height
      |FROM documents ORDER BY media_id""".stripMargin

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

  // ---- q38 token-length binning (sequence-packing prep) -----------------
  val q38: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("toks", TextStats.wsTokenCount(col("text")).cast("long"))
      .withColumn("bin", Curation.tokenBin(col("toks")))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("sum_toks"))
      .orderBy("bin")

  val q38Sql: String =
    """WITH t AS (
      |  SELECT CAST(CASE WHEN length(trim(text)) = 0 THEN 0
      |    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS toks
      |  FROM documents)
      |SELECT CAST(least(floor(toks / 16) * 16, 64) AS BIGINT) AS bin,
      |       count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS sum_toks
      |FROM t GROUP BY bin ORDER BY bin""".stripMargin

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

  // ---- q40 k-means centroid refinement step (IVF training) --------------
  // Assignment by max cosine, then element-wise mean per cell through
  // scale-8 fixed-point BIGINT sums — exact, order-independent,
  // representation-stable. Long form (cid, pos, m_e8): scalar columns only.
  val q40: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    val cent = e.filter(col("id") % 25 === 0)
    Similarity.kmeansStep(e, cent).orderBy("cid", "pos")
  }

  val q40Sql: String = {
    def cos(a: String, b: String) = Similarity.cosineDuckSql(a, b)
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent AS (SELECT id AS cid, v AS cv FROM e WHERE id % 25 = 0),
       |assigned AS (
       |  SELECT id, v, cid FROM (
       |    SELECT e.id, e.v, c.cid,
       |      row_number() OVER (PARTITION BY e.id
       |        ORDER BY ${cos("e.v", "c.cv")} DESC, c.cid ASC) AS rn
       |    FROM e CROSS JOIN cent c) t(id, v, cid, rn) WHERE rn = 1),
       |ex AS (
       |  SELECT cid, t.pos AS pos,
       |    CAST(floor(v[t.pos] * 100000000 + 0.5) AS BIGINT) AS xe8
       |  FROM assigned, unnest(generate_series(1, len(v))) AS t(pos))
       |SELECT cid, CAST(pos - 1 AS INT) AS pos,
       |  CAST(floor(CAST(sum(xe8) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS m_e8
       |FROM ex GROUP BY cid, pos ORDER BY cid, pos""".stripMargin
  }

  // ---- q41 JSON property extraction -------------------------------------
  // events.props is a JSON object column; extract $.k and aggregate.
  val q41: Q = (s, d) =>
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  val q41Sql: String =
    """SELECT event_type, count(*) AS cnt,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- q48 PII redaction (planted synthetic PII) ------------------------
  val q48: Q = (s, d) =>
    graft.core.Ops.widen(Tables.documents(s, d))
      .withColumn("text", concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com or "),
        lit("http://site"), col("doc_id") % 10, lit(".example.org/x tel +41 22 "),
        lpad((col("doc_id") % 1000).cast("string"), 4, "0"), lit(" end")))
      .withColumn("hits", TextStats.piiHits(col("text")).cast("long"))
      .withColumn("redacted", TextStats.redactPii(col("text")))
      .select(col("doc_id"), col("hits"), md5(col("redacted")).as("rh"))
      .orderBy("doc_id")

  val q48Sql: String = {
    val email = TextStats.EmailRegex
    val url = TextStats.UrlRegex
    val phone = TextStats.PhoneRegex
    s"""WITH t AS (
       |  SELECT doc_id,
       |    text || ' contact user' || doc_id || '@example.com or ' ||
       |    'http://site' || (doc_id % 10) || '.example.org/x tel +41 22 ' ||
       |    lpad(CAST(doc_id % 1000 AS VARCHAR), 4, '0') || ' end' AS text
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$email', 0)) +
       |       len(regexp_extract_all(text, '$url', 0)) +
       |       len(regexp_extract_all(text, '$phone', 0)) AS BIGINT) AS hits,
       |  md5(regexp_replace(regexp_replace(regexp_replace(text,
       |    '$email', '<EMAIL>', 'g'), '$url', '<URL>', 'g'),
       |    '$phone', '<PHONE>', 'g')) AS rh
       |FROM t ORDER BY doc_id""".stripMargin
  }

  // ---- q52 RP-LSH (sign) bucketed near-dup ------------------------------
  // The LSH-bucketed ANN scale path: bucket join on the 8-bit hyperplane
  // sign signature, exact cosine verify within buckets. Planted near-dups
  // (mild positive affine distortion keeps most sign bits) — the probe
  // verifies the operator finds exactly what the mirrored oracle finds.
  // Embeddings are dim-64 at every SF (TESTDATA.md); the oracle embeds the
  // same deterministic hyperplanes as exact double literals.
  private val q52Planes = Similarity.hyperplanes(numPlanes = 8, dim = 64)

  val q52: Q = (s, d) => {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    val planted = base.filter(col("id") % 13 === 0)
      .select((col("id") + 100000).as("id"),
        expr("transform(v, x -> x * 1.05 + 0.001)").as("v"))
    Similarity.rpLshNearDupPairs(base.unionByName(planted), numPlanes = 8,
        threshold = 0.8, dim = Some(64)) // testdata embedding dim; skips the head-probe job
      .orderBy("idA", "idB")
  }

  val q52Sql: String =
    s"""WITH base AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |corpus AS (
       |  SELECT id, v FROM base
       |  UNION ALL
       |  SELECT id + 100000, list_transform(v, x -> x * 1.05 + 0.001) FROM base
       |  WHERE id % 13 = 0),
       |b AS (SELECT id, v, ${Similarity.rpLshBucketDuckSql("v", q52Planes)} AS bk
       |  FROM corpus),
       |p AS (SELECT x.id AS idA, y.id AS idB,
       |    ${Similarity.cosineDuckSql("x.v", "y.v")} AS raw
       |  FROM b x JOIN b y ON x.bk = y.bk AND x.id < y.id)
       |SELECT idA, idB, ${Similarity.scoreE4DuckSql("raw")} AS score_e4
       |FROM p WHERE raw >= 0.8 ORDER BY idA, idB""".stripMargin

  // ---- q53 sequence packing (concat-and-chunk batch layout) -------------
  // Each document's pack id = the 256-token chunk its start offset falls
  // into, laid out in doc_id order within its content-hash shard. The
  // running sum is a shard-PARTITIONED window — parallel at any scale.
  val q53: Q = (s, d) =>
    Curation.packSequences(
        Tables.documents(s, d)
          .withColumn("toks", TextStats.wsTokenCount(col("text")).cast("long")),
        "doc_id", col("toks"), Curation.shardAssign(col("text")), budget = 256)
      .select("doc_id", "shard", "toks", "pack")
      .orderBy("doc_id")

  val q53Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS INT) AS shard,
      |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
      |      ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS toks
      |  FROM documents)
      |SELECT doc_id, shard, toks,
      |  CAST(floor((sum(toks) OVER (PARTITION BY shard ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks) / 256) AS BIGINT) AS pack
      |FROM t ORDER BY doc_id""".stripMargin

  // ---- q54 connected-components dedup clustering ------------------------
  // Near-dup PAIRS become dedup GROUPS via min-label propagation; the
  // oracle computes the same components with a recursive CTE. Edges are
  // planted chains: i—(i+100000) for i%7=0, plus (i+100000)—(i+200000)
  // for i%14=0 — components of size 2 and 3.
  val q54: Q = (s, d) => {
    val ids = Tables.documents(s, d).filter(col("doc_id") < 100)
      .select("doc_id")
    val e1 = ids.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("idA"), (col("doc_id") + 100000).as("idB"))
    val e2 = ids.filter(col("doc_id") % 14 === 0)
      .select((col("doc_id") + 100000).as("idA"),
        (col("doc_id") + 200000).as("idB"))
    Dedup.connectedComponents(e1.unionByName(e2)).orderBy("id")
  }

  val q54Sql: String =
    """WITH RECURSIVE
      |ids AS (SELECT doc_id FROM documents WHERE doc_id < 100),
      |edges AS (
      |  SELECT doc_id AS src, doc_id + 100000 AS dst FROM ids WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 100000, doc_id + 200000 FROM ids WHERE doc_id % 14 = 0),
      |undirected AS (
      |  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
      |nodes AS (SELECT DISTINCT src AS id FROM undirected),
      |reach(id, r) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT u.src, reach.r FROM undirected u JOIN reach ON reach.id = u.dst)
      |SELECT id, CAST(min(r) AS BIGINT) AS label
      |FROM reach GROUP BY id ORDER BY id""".stripMargin

  // ---- q55 int8 scalar quantization (ANN index compression) -------------
  val q55: Q = (s, d) =>
    Similarity.quantizeInt8(
        Tables.embeddings(s, d)
          .select(col("vec_id").as("id"),
            Similarity.toDoubleVec(col("embedding")).as("v")))
      .orderBy("id", "pos")

  val q55Sql: String =
    """WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings),
      |sc AS (SELECT id, v,
      |    CASE WHEN m > 0 THEN m ELSE 1.0 END AS s
      |  FROM (SELECT id, v,
      |          list_max(list_transform(v, x -> abs(x))) / 127 AS m
      |        FROM e)),
      |ex AS (SELECT id,
      |    CAST(floor(s * 100000000 + 0.5) AS BIGINT) AS scale_e8,
      |    t.pos AS pos, v[t.pos] / s AS r
      |  FROM sc, unnest(generate_series(1, len(v))) AS t(pos))
      |SELECT id, scale_e8, CAST(pos - 1 AS INT) AS pos,
      |  greatest(-127, least(127, CAST(floor(r + 0.5) AS BIGINT))) AS qv
      |FROM ex ORDER BY id, pos""".stripMargin

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

  // ---- q57 benchmark decontamination (n-gram overlap) -------------------
  // Planted contamination: the "benchmark" is words 3..10 of every 31st
  // document, so those documents (and any doc organically sharing a
  // 5-gram — the synthetic vocab is small) must flag contaminated.
  val q57: Q = (s, d) => {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 31 === 0)
      .select(concat_ws(" ",
        slice(Dedup.normalizeWords(col("text")), 3, 8)).as("q"))
    graft.operators.Curation.contaminationFlags(
        docs, "doc_id", "text", bench, "q", n = 5)
      .orderBy("doc_id")
  }

  private def duckGrams5(w: String): String =
    s"""CASE WHEN len($w) >= 5 THEN
       |  list_transform(generate_series(1, len($w) - 4),
       |    i -> $w[i] || ' ' || $w[i+1] || ' ' || $w[i+2] || ' ' ||
       |         $w[i+3] || ' ' || $w[i+4])
       |ELSE []::VARCHAR[] END""".stripMargin

  val q57Sql: String =
    s"""WITH nw AS (SELECT doc_id, $duckWords AS w FROM documents),
       |bw AS (SELECT list_filter(string_split_regex(trim(regexp_replace(lower(
       |    array_to_string(w[3:10], ' ')), '[^a-z0-9]+', ' ', 'g')), ' '),
       |    x -> x <> '') AS w
       |  FROM nw WHERE doc_id % 31 = 0),
       |bg AS (SELECT DISTINCT unnest(${duckGrams5("w")}) AS gram FROM bw),
       |dg AS (SELECT doc_id, unnest(list_distinct(${duckGrams5("w")})) AS gram
       |  FROM nw),
       |h AS (SELECT doc_id, count(*) AS n_hits
       |  FROM dg JOIN bg USING (gram) GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
       |       coalesce(h.n_hits, 0) > 0 AS contaminated
       |FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ---- q58 weighted source-mix sampling ---------------------------------
  // Per-stratum keep rates (the corpus-mixing dial) keyed to the corpus's
  // ACTUAL lang values (de/en/es/fr/zh — es/zh exercise the default-rate
  // fallback); the keep decision is a content-hash fraction, mirrored
  // exactly in both engines via the nibble-sum of the first 8 md5 hex
  // chars over 16^8. Rates are non-trivial so a broken fraction (either
  // engine) shifts n_kept and fails the hash compare.
  private val q58Rates = Seq("de" -> 0.125, "en" -> 0.5, "fr" -> 0.25)

  val q58: Q = (s, d) =>
    graft.operators.Curation.keepReport(
        graft.core.Ops.widen(Tables.documents(s, d)), "lang",
        graft.operators.Curation.weightedSampleKeep(
          col("lang"), col("text"), q58Rates.toMap))
      .orderBy("lang")

  val q58Sql: String = {
    val nibbles = (1 to 8).map(j =>
      s"(strpos('0123456789abcdef', substr(md5(text), $j, 1)) - 1) * ${math.pow(16, 8 - j).toLong}")
      .mkString(" + ")
    val rate = q58Rates.foldLeft("1.0") { case (acc, (s, r)) =>
      s"CASE WHEN lang = '$s' THEN $r ELSE $acc END"
    }
    s"""SELECT lang, count(*) AS n_total,
       |  count(*) FILTER (WHERE ($nibbles) / 4294967296.0 < ($rate)) AS n_kept,
       |  CAST(floor(count(*) FILTER (WHERE ($nibbles) / 4294967296.0 < ($rate))
       |    * 1.0 / count(*) * 10000 + 0.5) AS BIGINT) AS ratio_e4
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---- q59 boilerplate removal (line df cap) ----------------------------
  // Planted boilerplate: every document gains a shared banner line (df =
  // |docs|, dropped by the cap) and a unique footer line (df = 1, kept);
  // the original text is its own line. Reassembly must preserve order.
  val q59: Q = (s, d) => {
    val planted = Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"), lit(" | COOKIE BANNER ACCEPT | footer "),
        col("doc_id")).as("text"))
    graft.operators.Curation.removeBoilerplate(
        planted, "doc_id", "text", " | ", maxLineDocFreq = 100L)
      .orderBy("doc_id")
  }

  val q59Sql: String =
    """WITH t AS (SELECT doc_id,
      |    text || ' | COOKIE BANNER ACCEPT | footer ' || doc_id AS text
      |  FROM documents),
      |ls AS (SELECT doc_id, string_split(text, ' | ') AS l FROM t),
      |lines AS (SELECT doc_id, u.i AS pos, l[u.i] AS line
      |  FROM ls, unnest(generate_series(1, len(l))) AS u(i)),
      |hot AS (SELECT line FROM (
      |    SELECT line, count(*) AS df
      |    FROM (SELECT DISTINCT doc_id, line FROM lines) GROUP BY line)
      |  WHERE df > 100),
      |kept AS (SELECT * FROM lines WHERE line NOT IN (SELECT line FROM hot)),
      |rebuilt AS (SELECT doc_id, string_agg(line, ' | ' ORDER BY pos) AS c
      |  FROM kept GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(r.c, '') AS cleaned_text
      |FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // ---- q60 batch SimHash near-dup (banding + hamming verify) ------------
  // The q27-style planting drives signature proximity: a planted doc's
  // text is its source plus 3 words, so signatures differ by few bits and
  // land in a shared 4-bit band (pigeonhole, hamming <= 3). The corpus is
  // subset to every 5th doc: 16-bit signatures over the low-entropy
  // synthetic vocab collide organically, and the probe's job is verifying
  // the band join + bit_count(xor) verify, not stress-testing pair
  // explosion. Oracle mirrors both stages exactly.
  val q60: Q = (s, d) => {
    val base = Tables.documents(s, d).select("doc_id", "text")
      .filter(col("doc_id") % 5 === 0)
    val planted = base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz yy xx")).as("text"))
    Dedup.simhashNearDupPairs(base.unionByName(planted), "doc_id", "text",
        maxHamming = 3)
      .orderBy("idA", "idB")
  }

  val q60Sql: String = {
    val bandRows = (0 until 4).map(b =>
      s"SELECT doc_id, sig, $b AS band, (sig >> ${b * 4}) & 15 AS bits FROM sig")
      .mkString("\n  UNION ALL ")
    s"""WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
       |corpus AS (
       |  SELECT doc_id, text FROM sub
       |  UNION ALL
       |  SELECT doc_id + 100000, text || ' zz yy xx' FROM sub WHERE doc_id % 7 = 0),
       |n AS (SELECT doc_id, $duckWords AS w FROM corpus),
       |sig AS (SELECT doc_id, ${Dedup.simhash16DuckSql} AS sig FROM n),
       |bands AS (
       |  $bandRows)
       |SELECT DISTINCT a.doc_id AS idA, b.doc_id AS idB,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= 3
       |ORDER BY idA, idB""".stripMargin
  }

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

  // ---- q51 repetition ratio (Gopher-style degenerate-text flag) ---------
  // Planted degenerates: every 11th doc's text is replaced by one phrase
  // repeated, driving the ratio toward 1.
  val q51: Q = (s, d) =>
    graft.core.Ops.widen(Tables.documents(s, d))
      .withColumn("text",
        when(col("doc_id") % 11 === 0,
          concat_ws(" ", (0 until 30).map(_ => lit("spam ham")): _*))
          .otherwise(col("text")))
      .withColumn("w", Dedup.normalizeWords(col("text")))
      .withColumn("sh", Dedup.shingles3(col("w")))
      .select(col("doc_id"), TextStats.repetitionRatio(col("sh")).as("rep_e4"))
      .orderBy("doc_id")

  val q51Sql: String = {
    val phrase = (0 until 30).map(_ => "spam ham").mkString(" ")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 11 = 0 THEN '$phrase' ELSE text END AS text
       |  FROM documents),
       |n AS (SELECT doc_id, $duckWords AS w FROM t),
       |shl AS (SELECT doc_id,
       |  CASE WHEN len(w) >= 3 THEN list_transform(generate_series(1, len(w)-2),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) ELSE []::VARCHAR[] END AS sh
       |  FROM n)
       |SELECT doc_id,
       |  CASE WHEN len(sh) = 0 THEN CAST(0 AS BIGINT)
       |       ELSE CAST(floor((1.0 - len(list_distinct(sh)) * 1.0 / len(sh))
       |            * 10000 + 0.5) AS BIGINT) END AS rep_e4
       |FROM shl ORDER BY doc_id""".stripMargin
  }

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

  // ---- q76 BPE pair counts (tokenizer-training step) ---------------------
  // The distributed core of BPE training (operators/Bpe): corpus → word
  // frequency table (the one corpus-sized pass) → adjacent char-pair
  // counts weighted by word freq — the argmax of this table is the merge
  // the trainer learns each round (BpeSpec pins the full loop on the
  // textbook corpus). Oracle mirrors the explode+sum shape directly.
  val q76: Q = (s, d) => {
    val vocab = graft.operators.Bpe.wordFreqs(Tables.documents(s, d), "text")
      .withColumn("syms", graft.operators.Bpe.charSymbols(col("w")))
    graft.operators.Bpe.pairCounts(vocab, "syms", "freq")
      .orderBy("pair")
  }

  val q76Sql: String =
    s"""WITH wx AS (SELECT unnest($duckWords) AS w FROM documents),
       |f AS (SELECT w, count(*) AS freq FROM wx GROUP BY w),
       |p AS (SELECT freq, unnest(list_transform(generate_series(1, length(w) - 1),
       |        i -> substring(w, i, 1) || ' ' || substring(w, i + 1, 1))) AS pair
       |      FROM f WHERE length(w) >= 2)
       |SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
       |FROM p GROUP BY pair ORDER BY pair""".stripMargin

  // ---- q78 token-bounded chunking with overlap ---------------------------
  // Curation.chunkByTokens — the split side of the sequence-length problem
  // (packSequences is the concat side): overlapping maxTokens-word windows
  // at stride maxTokens-overlap, per-row explode, no shuffle. Oracle
  // mirrors the window arithmetic with generate_series + list_slice.
  val q78: Q = (s, d) =>
    Curation.chunkByTokens(Tables.documents(s, d), "doc_id", "text",
        maxTokens = 64, overlap = 16)
      .orderBy("doc_id", "chunk_id")

  val q78Sql: String =
    s"""WITH w AS (SELECT doc_id, $duckWords AS w FROM documents),
       |c AS (SELECT doc_id, unnest(generate_series(1, greatest(len(w) - 16, 1), 48)) AS s, w
       |      FROM w)
       |SELECT doc_id, CAST((s - 1) // 48 AS BIGINT) AS chunk_id,
       |  array_to_string(list_slice(w, s, s + 63), ' ') AS chunk_text,
       |  CAST(len(list_slice(w, s, s + 63)) AS BIGINT) AS n_tokens
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  // ---- q79 URL canonicalization + dedup ---------------------------------
  // Curation.canonicalizeUrl/urlHost over URLs synthesized (identically in
  // both engines) with the decorations crawls actually produce — mixed-case
  // scheme/host, tracking params, fragments, index.html — then the dedup
  // groupBy on the canonical form. Distinct decorations of the same page
  // MUST fold to one group (the probe's sharpness: 4 decoration classes
  // per (source, page) pair collapse to one canonical URL).
  val q79: Q = (s, d) => {
    val url = concat(lit("HTTPS://WWW."), col("source"),
      lit(".Example.com/Page/"), (col("doc_id") % 40).cast("string"),
      when(col("doc_id") % 6 === 0, "?utm_source=feed&utm_campaign=x")
        .when(col("doc_id") % 6 === 1, "?id=7&utm_medium=m")
        .when(col("doc_id") % 6 === 2, "#section2")
        .when(col("doc_id") % 6 === 3, "?xgclid=1") // NOT a tracking param
        .when(col("doc_id") % 6 === 4, "?utm_medium=m&id=7") // leading strip
        .otherwise("/index.html"))
    Tables.documents(s, d)
      .select(col("doc_id"), url.as("u"))
      .select(col("doc_id"), Curation.canonicalizeUrl(col("u")).as("curl"),
        Curation.urlHost(col("u")).as("host"))
      .groupBy("curl", "host")
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
      .orderBy("curl")
  }

  val q79Sql: String =
    """WITH u AS (
      |  SELECT doc_id,
      |    'HTTPS://WWW.' || source || '.Example.com/Page/' ||
      |    CAST(doc_id % 40 AS VARCHAR) ||
      |    CASE doc_id % 6 WHEN 0 THEN '?utm_source=feed&utm_campaign=x'
      |                    WHEN 1 THEN '?id=7&utm_medium=m'
      |                    WHEN 2 THEN '#section2'
      |                    WHEN 3 THEN '?xgclid=1'
      |                    WHEN 4 THEN '?utm_medium=m&id=7'
      |                    ELSE '/index.html' END AS u
      |  FROM documents),
      |low AS (
      |  SELECT doc_id, u,
      |    regexp_replace(
      |      lower(regexp_extract(u, '^([^/?#]*//[^/?#]*)', 1)) ||
      |        regexp_replace(u, '^[^/?#]*//[^/?#]*', ''),
      |      '#.*', '', 'g') AS u2
      |  FROM u),
      |t AS (
      |  SELECT doc_id, u, u2,
      |    CASE WHEN strpos(u2, '?') = 0 THEN u2
      |         ELSE substr(u2, 1, strpos(u2, '?') - 1) ||
      |           CASE WHEN len(kept) > 0
      |                THEN '?' || array_to_string(kept, '&') ELSE '' END
      |    END AS u3
      |  FROM (SELECT doc_id, u, u2,
      |          list_filter(string_split(substr(u2, strpos(u2, '?') + 1), '&'),
      |            p -> NOT regexp_matches(p, '^(utm_[a-z]+|gclid|fbclid)='))
      |            AS kept
      |        FROM low)),
      |c AS (
      |  SELECT doc_id,
      |    regexp_replace(
      |      regexp_replace(u3, '[?&]$', '', 'g'),
      |      '/(index\.html?)?$', '', 'g') AS curl,
      |    regexp_replace(regexp_extract(lower(u), '^[a-z]+://([^/:?#]+)', 1),
      |      '^www\.', '', 'g') AS host
      |  FROM t)
      |SELECT curl, host, count(*) AS n, min(doc_id) AS first_doc
      |FROM c GROUP BY curl, host ORDER BY curl""".stripMargin

  // ---- q80 media header metadata (real container parsing) ----------------
  // Multimodal.extractMeta / parseHeader: 4/5 of the payloads are REAL
  // PNG headers synthesized from (doc_id-derived) dimensions via
  // hex→unhex; 1/5 are raw text bytes (must degrade to 'unknown'). The
  // oracle never parses — it recomputes the expected metadata from the
  // same synthesis arithmetic, so a parser bug (endianness, offset) is a
  // hash mismatch, not a tautology.
  val q80: Q = (s, d) => {
    import s.implicits._
    val media = Tables.documents(s, d).selectExpr(
      "doc_id AS media_id",
      """CASE WHEN doc_id % 5 = 0 THEN CAST(text AS BINARY)
        |ELSE unhex(concat('89504E470D0A1A0A0000000D49484452',
        |  lpad(hex(doc_id % 509 + 1), 8, '0'),
        |  lpad(hex(doc_id % 251 + 1), 8, '0'),
        |  '0806000000')) END AS media""".stripMargin,
      "'application/octet-stream' AS mime")
      .as[graft.operators.Multimodal.MediaRecord]
    graft.operators.Multimodal.extractMeta(media).toDF()
      .orderBy("media_id")
  }

  val q80Sql: String =
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 5 = 0 THEN 'unknown' ELSE 'png' END AS kind,
      |  CAST(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE doc_id % 509 + 1 END
      |    AS INTEGER) AS width,
      |  CAST(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE doc_id % 251 + 1 END
      |    AS INTEGER) AS height,
      |  CAST(0 AS INTEGER) AS channels,
      |  CAST(0 AS INTEGER) AS sample_rate
      |FROM documents ORDER BY media_id""".stripMargin

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

  // ---- q82 decoded-pixel round trip (REAL ImageIO decode) ----------------
  // Multimodal.encodeGrayPng synthesizes true PNGs (uniform gray, dims and
  // gray level doc_id-derived); Multimodal.decodeImages decodes them with
  // javax.imageio and emits width/height/bands plus the band-0 MEAN over
  // the decoded raster. The oracle recomputes all four from the synthesis
  // arithmetic — dims alone could be faked from the header (q80's job);
  // the mean can only match if actual pixels were decoded. 1/5 of the
  // payloads are raw text bytes, pinning the undecodable marker row.
  /** q82's media synthesis — shared with the Scale tool's png_roundtrip
    * row, so scale measurements run the exact payload mix the probe pins
    * (every 5th doc raw text, the rest uniform-gray PNGs with
    * doc_id-derived dims/gray — the same constants the oracle recomputes).
    */
  def q82Media(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        if (id % 5 == 0)
          graft.operators.Multimodal.MediaRecord(
            id, text.getBytes("UTF-8"), "text/plain")
        else
          graft.operators.Multimodal.MediaRecord(
            id,
            graft.operators.Multimodal.encodeGrayPng(
              (id % 31 + 1).toInt, (id % 23 + 1).toInt, (id % 256).toInt),
            "image/png")
      }
  }

  val q82: Q = (s, d) => {
    val media = q82Media(graft.core.Ops.widen(Tables.documents(s, d)))
    graft.operators.Multimodal.decodeImages(media).toDF()
      .orderBy("media_id")
  }

  val q82Sql: String =
    """SELECT doc_id AS media_id,
      |  CAST(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE doc_id % 31 + 1 END
      |    AS INTEGER) AS width,
      |  CAST(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE doc_id % 23 + 1 END
      |    AS INTEGER) AS height,
      |  CAST(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 1 END AS INTEGER) AS bands,
      |  CAST(CASE WHEN doc_id % 5 = 0 THEN -1
      |       ELSE (doc_id % 256) * 10000 END AS BIGINT) AS mean_e4
      |FROM documents ORDER BY media_id""".stripMargin

  // ---- q84 decoded-sample audio round trip (REAL javax.sound decode) -----
  // Multimodal.encodePcm16Wav synthesizes true 16-bit PCM WAVs (rate /
  // channels / frame count / ramp amplitude all doc_id-derived);
  // Multimodal.decodeAudio decodes them with javax.sound.sampled and emits
  // format fields plus the MEAN |sample| and PEAK over the decoded PCM
  // stream. The oracle recomputes everything from the synthesis
  // arithmetic — rate/channels alone could be faked from the fmt header
  // (q80's job); mean and peak only match if actual samples were decoded.
  // Frame values are step·(i % 100), so sum_{i<n}(i%100) has the closed
  // form (n/100)·4950 + r(r−1)/2 with r = n mod 100 — SQL-expressible.
  // 1/5 of payloads are raw text bytes, pinning the undecodable marker.
  def q84Media(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      if (id % 5 == 0)
        graft.operators.Multimodal.MediaRecord(
          id, s"not audio: $id".getBytes("UTF-8"), "text/plain")
      else {
        val rate = (8000 + (id % 3) * 4000).toInt
        val ch = (1 + id % 2).toInt
        val n = (50 + id % 150).toInt
        val step = ((id % 7 + 1) * 40).toInt
        val frames = Array.tabulate[Short](n)(i => (step * (i % 100)).toShort)
        graft.operators.Multimodal.MediaRecord(
          id, graft.operators.Multimodal.encodePcm16Wav(rate, ch, frames),
          "audio/wav")
      }
    }
  }

  val q84: Q = (s, d) => {
    val media = q84Media(graft.core.Ops.widen(Tables.documents(s, d)))
    graft.operators.Multimodal.decodeAudio(media).toDF()
      .orderBy("media_id")
  }

  val q84Sql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN NULL
      |         ELSE 8000 + (doc_id % 3) * 4000 END AS rate,
      |    1 + doc_id % 2 AS ch,
      |    50 + doc_id % 150 AS n,
      |    (doc_id % 7 + 1) * 40 AS step
      |  FROM documents)
      |SELECT doc_id AS media_id,
      |  CAST(CASE WHEN rate IS NULL THEN 0 ELSE ch END AS INTEGER) AS channels,
      |  CAST(coalesce(rate, 0) AS INTEGER) AS sample_rate,
      |  CAST(CASE WHEN rate IS NULL THEN 0 ELSE n END AS BIGINT) AS n_frames,
      |  CAST(CASE WHEN rate IS NULL THEN -1
      |       ELSE floor(n * 10000.0 / rate + 0.5) END AS BIGINT) AS duration_e4,
      |  CAST(CASE WHEN rate IS NULL THEN -1
      |       ELSE floor((ch * step * ((n // 100) * 4950 +
      |              ((n % 100) * ((n % 100) - 1)) // 2)) * 10000.0
      |            / (n * ch) + 0.5) END AS BIGINT) AS mean_abs_e4,
      |  CAST(CASE WHEN rate IS NULL THEN -1
      |       ELSE step * (CASE WHEN n >= 100 THEN 99 ELSE n - 1 END)
      |       END AS INTEGER) AS peak
      |FROM p ORDER BY media_id""".stripMargin

  // ---- q85 MP4 container-walk round trip ---------------------------------
  // Multimodal.encodeMp4 synthesizes structurally-valid ISO-BMFF box trees
  // (track count / timescale / duration / per-track sample counts all
  // doc_id-derived); Multimodal.extractMp4Meta walks moov/trak/mdia/minf/
  // stbl/stsz for the metadata a curation pipeline filters video on. The
  // oracle recomputes from the synthesis arithmetic. 1/4 of payloads are
  // raw text bytes, pinning the non-MP4 marker row.
  def q85Media(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      if (id % 4 == 0)
        graft.operators.Multimodal.MediaRecord(
          id, s"not video: $id".getBytes("UTF-8"), "text/plain")
      else {
        val tracks = (1 + id % 3).toInt
        val tsc = (600 + (id % 5) * 100).toInt
        val dur = (1000 + id % 9000).toInt
        val per = (100 + id % 400).toInt
        // odd ids carry explicit sync tables (kf = 1 + per/4 per track);
        // even ids omit stss — all samples sync, the ISO-BMFF default
        val sync = if (id % 2 == 1) Some(1 + per / 4) else None
        graft.operators.Multimodal.MediaRecord(
          id, graft.operators.Multimodal.encodeMp4(
            tsc, dur, Seq.fill(tracks)(per), Seq.fill(tracks)(sync)),
          "video/mp4")
      }
    }
  }

  val q85: Q = (s, d) => {
    val media = q85Media(graft.core.Ops.widen(Tables.documents(s, d)))
    graft.operators.Multimodal.extractMp4Meta(media).toDF()
      .orderBy("media_id")
  }

  val q85Sql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 4 = 0 THEN NULL ELSE 1 + doc_id % 3 END AS tr,
      |    600 + (doc_id % 5) * 100 AS tsc,
      |    1000 + doc_id % 9000 AS dur,
      |    100 + doc_id % 400 AS per
      |  FROM documents)
      |SELECT doc_id AS media_id,
      |  CAST(coalesce(tr, 0) AS INTEGER) AS n_tracks,
      |  CAST(CASE WHEN tr IS NULL THEN 0 ELSE tsc END AS BIGINT) AS timescale,
      |  CAST(CASE WHEN tr IS NULL THEN -1
      |       ELSE floor(dur * 10000.0 / tsc + 0.5) END AS BIGINT) AS duration_e4,
      |  CAST(CASE WHEN tr IS NULL THEN -1 ELSE tr * per END AS BIGINT)
      |    AS n_samples,
      |  CAST(CASE WHEN tr IS NULL THEN -1
      |       WHEN doc_id % 2 = 1
      |         THEN tr * (1 + CAST(floor(per / 4.0) AS BIGINT))
      |       ELSE tr * per END AS BIGINT) AS n_keyframes
      |FROM p ORDER BY media_id""".stripMargin

  // ---- q83 BPE encode (apply side of the q76-trained tokenizer) ----------
  // The PRODUCTION encoder (Bpe.encodeOne greedy min-rank loop, typed map
  // — the encodeWords path) over a fixed trained-shape merge table
  // (Bpe.DemoMerges); output per doc is the token COUNT plus an md5 over
  // the full token stream — full-fidelity: any mis-merge anywhere in any
  // word changes the digest. The oracle mirrors the EQUIVALENT rank-order
  // fold (applyMerge semantics; BpeSpec pins the two forms' agreement)
  // with DuckDB list_reduce — custom init via list_prepend(''), symbols
  // joined by '|', the "ends-with |a and next is b" fuse — generated from
  // the SAME merge constants so the encodings cannot drift. (An earlier
  // column-fold form of this probe compiled an expression so large that
  // codegen-cache eviction inside the 83-query bench recompiled it every
  // run: 6.9 s in-suite vs 1.3 s isolated. The typed-map form needs no
  // codegen giant and is the form a production pipeline runs anyway.)
  val q83: Q = (s, d) => {
    import s.implicits._
    val table = graft.operators.Bpe.DemoMerges.toVector
    val ranks = table.zipWithIndex.map { case (m, i) => m -> i }.toMap
    graft.core.Ops.widen(Tables.documents(s, d))
      .select(col("doc_id"), Dedup.normalizeWords(col("text")).as("ws"))
      .as[(Long, Seq[String])]
      .map { case (id, ws) =>
        val toks = ws.map(w => graft.operators.Bpe.encodeOne(w, table, ranks))
        (id, toks.map(_.length.toLong).sum,
          toks.map(_.mkString("|")).mkString(" "))
      }
      .toDF("doc_id", "n_tokens", "enc")
      .select(col("doc_id"), col("n_tokens"), md5(col("enc")).as("enc_md5"))
      .orderBy("doc_id")
  }

  val q83Sql: String = {
    def stage(inner: String, a: String, b: String): String =
      s"""list_reduce(list_prepend('', string_split($inner, '|')),
         |      (acc, x) -> CASE
         |        WHEN acc = '$a' AND x = '$b' THEN '${a + b}'
         |        WHEN acc LIKE '%|$a' AND x = '$b'
         |          THEN substr(acc, 1, length(acc) - ${a.length}) || '${a + b}'
         |        WHEN acc = '' THEN x
         |        ELSE acc || '|' || x END)""".stripMargin
    val chained = graft.operators.Bpe.DemoMerges.foldLeft(
      "array_to_string(string_split(w, ''), '|')") {
      case (inner, (a, b)) => stage(inner, a, b)
    }
    s"""WITH n AS (SELECT doc_id, $duckWords AS ws FROM documents),
       |t AS (SELECT doc_id, list_transform(ws, w -> $chained) AS toks FROM n)
       |SELECT doc_id,
       |  CAST(coalesce(list_sum(list_transform(toks,
       |    s -> len(string_split(s, '|')))), 0) AS BIGINT) AS n_tokens,
       |  md5(array_to_string(toks, ' ')) AS enc_md5
       |FROM t ORDER BY doc_id""".stripMargin
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

  // ---- q86/q87 product quantization (IVF-PQ's compression half) ---------
  // q86: encode — every vector becomes m=8 sub-codes (argmin squared-L2
  // against a deterministic seedless codebook whose literals both engines
  // embed exactly, the q52 hyperplane idiom). q87: ADC top-k — per-query
  // (sub, code) partial-distance LUT, integer e4 sums per candidate,
  // WindowGroupLimit rank. Production codebooks come from pqTrain
  // (PQSpec); the probe codebook is fixed so the oracle can mirror it.
  private val q86Cb = Similarity.pqCodebook(m = 8, numCodes = 8, subDim = 8)

  private def pqDistDuck(a: String, b: String): String =
    s"""CAST(floor(list_sum(list_transform(range(1, 9),
       |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) * 10000 + 0.5)
       |    AS BIGINT)""".stripMargin

  private val pqCommonDuck: String =
    s"""e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |cb AS (SELECT * FROM ${Similarity.pqCodebookDuckSql(q86Cb)}
       |       AS t(sub, code, cv)),
       |sp AS (SELECT id, s.sub AS sub,
       |    list_slice(v, s.sub * 8 + 1, s.sub * 8 + 8) AS subv
       |  FROM e, (SELECT unnest(range(0, 8)) AS sub) s),
       |dd AS (SELECT id, sp.sub AS sub, code,
       |    ${pqDistDuck("subv", "cv")} AS d_e4
       |  FROM sp JOIN cb ON cb.sub = sp.sub),
       |codes AS (SELECT id, sub, CAST(min([d_e4, code])[2] AS INT) AS code
       |  FROM dd GROUP BY id, sub)""".stripMargin

  val q86: Q = (s, d) => {
    val vecs = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    Similarity.pqEncode(vecs, Similarity.pqCodebookDf(s, q86Cb),
        m = 8, subDim = 8)
      .orderBy("id", "sub")
  }

  val q86Sql: String =
    s"""WITH $pqCommonDuck
       |SELECT id, CAST(sub AS INT) AS sub, code
       |FROM codes ORDER BY id, sub""".stripMargin

  val q87: Q = (s, d) => {
    val vecs = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    val cb = Similarity.pqCodebookDf(s, q86Cb)
    Similarity.pqAdcTopK(
        Similarity.pqEncode(vecs, cb, m = 8, subDim = 8), cb,
        vecs.filter(col("id") % 50 === 0), m = 8, subDim = 8, k = 5)
      .orderBy("vec_id", "rank")
  }

  val q87Sql: String =
    s"""WITH $pqCommonDuck,
       |lut AS (SELECT sp.id AS vec_id, sp.sub AS sub, cb.code,
       |    ${pqDistDuck("subv", "cv")} AS pd_e4
       |  FROM sp JOIN cb ON cb.sub = sp.sub
       |  WHERE sp.id % 50 = 0),
       |cand AS (SELECT vec_id, c.id AS other_id,
       |    CAST(sum(pd_e4) AS BIGINT) AS dist_e4
       |  FROM codes c JOIN lut ON lut.sub = c.sub AND lut.code = c.code
       |  WHERE lut.vec_id <> c.id
       |  GROUP BY vec_id, c.id),
       |r AS (SELECT vec_id, other_id, dist_e4,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY dist_e4, other_id) AS rank
       |  FROM cand)
       |SELECT vec_id, other_id, dist_e4, rank
       |FROM r WHERE rank <= 5 ORDER BY vec_id, rank""".stripMargin

  // ---- q89 composed IVF-PQ query path -----------------------------------
  // The two halves end-to-end: IVF cell probe (q31's assignment mirror)
  // narrows candidates, ADC over the PQ codes (q86/q87's mirrors) ranks
  // them — candidate embeddings never touched at query time. Fully
  // deterministic given centroids + codebook, so the oracle reproduces
  // both halves and the compare is EXACT.
  val q89: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    Similarity.ivfPqTopK(e, e.filter(col("id") % 25 === 0),
        Similarity.pqCodebookDf(s, q86Cb), e.filter(col("id") % 50 === 0),
        nprobe = 2, m = 8, subDim = 8, k = 3)
      .orderBy("vec_id", "rank")
  }

  val q89Sql: String = {
    def cos(a: String, b: String) = Similarity.cosineDuckSql(a, b)
    s"""WITH $pqCommonDuck,
       |cent AS (SELECT id AS cid, v AS cv FROM e WHERE id % 25 = 0),
       |assigned AS (
       |  SELECT id, cid FROM (
       |    SELECT e.id, c.cid,
       |      row_number() OVER (PARTITION BY e.id
       |        ORDER BY ${cos("e.v", "c.cv")} DESC, c.cid ASC) AS rn
       |    FROM e CROSS JOIN cent c) t(id, cid, rn) WHERE rn = 1),
       |probed AS (
       |  SELECT id AS vec_id, cid FROM (
       |    SELECT q.id, c.cid,
       |      row_number() OVER (PARTITION BY q.id
       |        ORDER BY ${cos("q.v", "c.cv")} DESC, c.cid ASC) AS rn
       |    FROM e q CROSS JOIN cent c WHERE q.id % 50 = 0) t(id, cid, rn)
       |  WHERE rn <= 2),
       |lut AS (SELECT sp.id AS vec_id, sp.sub AS sub, cb.code,
       |    ${pqDistDuck("subv", "cv")} AS pd_e4
       |  FROM sp JOIN cb ON cb.sub = sp.sub
       |  WHERE sp.id % 50 = 0),
       |cand AS (SELECT p.vec_id, c.id AS other_id,
       |    CAST(sum(l.pd_e4) AS BIGINT) AS dist_e4
       |  FROM probed p
       |  JOIN assigned a USING (cid)
       |  JOIN codes c ON c.id = a.id
       |  JOIN lut l ON l.vec_id = p.vec_id AND l.sub = c.sub
       |    AND l.code = c.code
       |  WHERE p.vec_id <> a.id
       |  GROUP BY p.vec_id, c.id),
       |r AS (SELECT vec_id, other_id, dist_e4,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY dist_e4, other_id) AS rank
       |  FROM cand)
       |SELECT vec_id, other_id, dist_e4, rank
       |FROM r WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin
  }

  // ---- q90 Gopher quality-rule bundle -----------------------------------
  // The standard pretraining gate set (word count / mean word length /
  // symbol ratio / bullet + ellipsis line fractions / alphabetic fraction
  // / stopword floor) as one struct; docs get synthesized line structure
  // so every rule has both passing and failing rows. All measures are
  // integer-count fixed-point — the compare is exact.
  val q90: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"),
      concat_ws("\n", col("text"),
        when(col("doc_id") % 4 === 0, lit("- bullet line"))
          .otherwise(lit("plain line")),
        when(col("doc_id") % 5 === 0, lit("trails off..."))
          .otherwise(lit("## hash marks #"))).as("text"))
    val g = graft.operators.TextStats.gopherFlags(col("text"),
      Dedup.normalizeWords(col("text")))
    docs.withColumn("g", g)
      .select(col("doc_id"), col("g.n_words").as("n_words"),
        col("g.mean_len_e4").as("mean_len_e4"),
        col("g.alpha_frac_e4").as("alpha_frac_e4"),
        col("g.symbol_ratio_e4").as("symbol_ratio_e4"),
        col("g.bullet_frac_e4").as("bullet_frac_e4"),
        col("g.ellipsis_frac_e4").as("ellipsis_frac_e4"),
        col("g.stop_hits").as("stop_hits"), col("g.pass").as("pass"))
      .orderBy("doc_id")
  }

  val q90Sql: String = {
    def fracE4(num: String, den: String) =
      s"CASE WHEN $den > 0 THEN CAST(floor(($num) * 1.0 / ($den) * 10000 + 0.5) AS BIGINT) ELSE 0 END"
    s"""WITH docs AS (SELECT doc_id,
       |    text || chr(10)
       |      || (CASE WHEN doc_id % 4 = 0 THEN '- bullet line'
       |          ELSE 'plain line' END) || chr(10)
       |      || (CASE WHEN doc_id % 5 = 0 THEN 'trails off...'
       |          ELSE '## hash marks #' END) AS text
       |  FROM documents),
       |t AS (SELECT doc_id, text,
       |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       |      ELSE string_split_regex(trim(text), '\\s+') END AS toks,
       |    string_split(text, chr(10)) AS lines,
       |    $duckWords AS w
       |  FROM docs),
       |m AS (SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n,
       |    CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
       |      AS BIGINT) AS sumlen,
       |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
       |      AS BIGINT) AS n_alpha,
       |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
       |      + CAST(len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT)
       |      AS n_sym,
       |    CAST(len(lines) AS BIGINT) AS n_lines,
       |    CAST(len(list_filter(lines, l -> starts_with(l, '- ')
       |      OR starts_with(l, '* ') OR starts_with(l, '•'))) AS BIGINT)
       |      AS n_bullet,
       |    CAST(len(list_filter(lines, l -> ends_with(l, '...'))) AS BIGINT)
       |      AS n_ell,
       |    CAST(len(list_filter(w, x -> x IN ('the', 'a'))) AS BIGINT)
       |      AS stop_hits
       |  FROM t),
       |f AS (SELECT doc_id, n AS n_words,
       |    ${fracE4("sumlen", "n")} AS mean_len_e4,
       |    ${fracE4("n_alpha", "n")} AS alpha_frac_e4,
       |    ${fracE4("n_sym", "n")} AS symbol_ratio_e4,
       |    ${fracE4("n_bullet", "n_lines")} AS bullet_frac_e4,
       |    ${fracE4("n_ell", "n_lines")} AS ellipsis_frac_e4,
       |    stop_hits
       |  FROM m)
       |SELECT doc_id, n_words, mean_len_e4, alpha_frac_e4, symbol_ratio_e4,
       |  bullet_frac_e4, ellipsis_frac_e4, stop_hits,
       |  (n_words BETWEEN 50 AND 100000
       |    AND mean_len_e4 BETWEEN 30000 AND 100000
       |    AND symbol_ratio_e4 <= 1000 AND bullet_frac_e4 <= 9000
       |    AND ellipsis_frac_e4 <= 3000 AND alpha_frac_e4 >= 8000
       |    AND stop_hits >= 2) AS pass
       |FROM f ORDER BY doc_id""".stripMargin
  }

  // ---- q91 bigram-LM cross-entropy (perplexity filter) ------------------
  // The CCNet/KenLM-style quality signal: train bigram counts on the
  // corpus itself, score each doc's mean smoothed log-cost
  // (self-perplexity — repetitive/templated docs score low, outliers
  // high). Per-bigram costs round to e6 integers BEFORE the sum, so the
  // compare is exact despite the ln().
  val q91: Q = (s, d) => {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    // self-train shape → the one-explode entry point (the two-call
    // bigramCounts + lmCrossEntropy form explodes the corpus twice)
    graft.operators.TextStats.selfCrossEntropy(docs, "doc_id", "text",
        vocabSize = 1000L)
      .orderBy("doc_id")
  }

  val q91Sql: String =
    s"""WITH n AS (SELECT doc_id, $duckWords AS w FROM documents),
       |bg AS (SELECT doc_id, w[i] || ' ' || w[i + 1] AS gram
       |  FROM n, unnest(generate_series(1, len(w) - 1)) t(i)
       |  WHERE len(w) >= 2),
       |grams AS (SELECT gram, count(*) AS c FROM bg GROUP BY gram),
       |ctx AS (SELECT string_split(gram, ' ')[1] AS w1, sum(c) AS ctx
       |  FROM grams GROUP BY 1),
       |sc AS (SELECT b.doc_id,
       |    CAST(floor(-ln((g.c + 1.0) / (x.ctx + 1000.0)) * 1000000 + 0.5)
       |      AS BIGINT) AS le6
       |  FROM bg b
       |  JOIN grams g USING (gram)
       |  JOIN ctx x ON x.w1 = string_split(b.gram, ' ')[1]),
       |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(floor(sum(le6) / (count(*) * 100.0) + 0.5) AS BIGINT)
       |      AS xent_e4
       |  FROM sc GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
       |  coalesce(a.xent_e4, 0) AS xent_e4
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  // ---- q92 residual-encoded IVF-PQ (FAISS-IVFPQ layout) -----------------
  // q89's composed path with residual codes: corpus codes quantize
  // v − centroid(own cell); the LUT is per-(query, probed cell) on the
  // query's residual. Fully deterministic given centroids + codebook —
  // the oracle mirrors assignment, residual, encode and ADC exactly.
  val q92: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    Similarity.ivfPqTopKResidual(e, e.filter(col("id") % 25 === 0),
        Similarity.pqCodebookDf(s, q86Cb), e.filter(col("id") % 50 === 0),
        nprobe = 2, m = 8, subDim = 8, k = 3)
      .orderBy("vec_id", "rank")
  }

  val q92Sql: String = {
    def cos(a: String, b: String) = Similarity.cosineDuckSql(a, b)
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |cb AS (SELECT * FROM ${Similarity.pqCodebookDuckSql(q86Cb)}
       |       AS t(sub, code, cv)),
       |cent AS (SELECT id AS cid, v AS ccv FROM e WHERE id % 25 = 0),
       |assigned AS (
       |  SELECT id, cid FROM (
       |    SELECT e.id, c.cid,
       |      row_number() OVER (PARTITION BY e.id
       |        ORDER BY ${cos("e.v", "c.ccv")} DESC, c.cid ASC) AS rn
       |    FROM e CROSS JOIN cent c) t(id, cid, rn) WHERE rn = 1),
       |resid AS (
       |  SELECT a.id, a.cid,
       |    list_transform(range(1, 65), i -> e.v[i] - c.ccv[i]) AS rv
       |  FROM assigned a JOIN e ON e.id = a.id JOIN cent c ON c.cid = a.cid),
       |rsub AS (SELECT id, cid, s.sub AS sub,
       |    list_slice(rv, s.sub * 8 + 1, s.sub * 8 + 8) AS subv
       |  FROM resid, (SELECT unnest(range(0, 8)) AS sub) s),
       |rdd AS (SELECT id, rsub.sub AS sub, code,
       |    ${pqDistDuck("subv", "cv")} AS d_e4
       |  FROM rsub JOIN cb ON cb.sub = rsub.sub),
       |rcodes AS (SELECT id, sub, CAST(min([d_e4, code])[2] AS INT) AS code
       |  FROM rdd GROUP BY id, sub),
       |probed AS (
       |  SELECT id AS vec_id, cid FROM (
       |    SELECT q.id, c.cid,
       |      row_number() OVER (PARTITION BY q.id
       |        ORDER BY ${cos("q.v", "c.ccv")} DESC, c.cid ASC) AS rn
       |    FROM e q CROSS JOIN cent c WHERE q.id % 50 = 0) t(id, cid, rn)
       |  WHERE rn <= 2),
       |qres AS (
       |  SELECT p.vec_id, p.cid,
       |    list_transform(range(1, 65), i -> q.v[i] - c.ccv[i]) AS qr
       |  FROM probed p JOIN e q ON q.id = p.vec_id
       |    JOIN cent c ON c.cid = p.cid),
       |lut AS (SELECT vec_id, qres.cid, s.sub AS sub, cb.code,
       |    ${pqDistDuck("list_slice(qr, s.sub * 8 + 1, s.sub * 8 + 8)",
      "cv")} AS pd_e4
       |  FROM qres, (SELECT unnest(range(0, 8)) AS sub) s
       |  JOIN cb ON cb.sub = s.sub),
       |cand AS (SELECT p.vec_id, c.id AS other_id,
       |    CAST(sum(l.pd_e4) AS BIGINT) AS dist_e4
       |  FROM probed p
       |  JOIN assigned a USING (cid)
       |  JOIN rcodes c ON c.id = a.id
       |  JOIN lut l ON l.vec_id = p.vec_id AND l.cid = p.cid
       |    AND l.sub = c.sub AND l.code = c.code
       |  WHERE p.vec_id <> a.id
       |  GROUP BY p.vec_id, c.id),
       |r AS (SELECT vec_id, other_id, dist_e4,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY dist_e4, other_id) AS rank
       |  FROM cand)
       |SELECT vec_id, other_id, dist_e4, rank
       |FROM r WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin
  }

  // ---- q93 feature-hashing text embedding -------------------------------
  // The hashing-trick projection (bucket = md5 mod dim, ±1 sign from the
  // next hash bits, signed counts per bucket) — the vocabulary-free
  // text→embedding link feeding the ANN stack. Integer-exact; dense
  // long-form output (every doc × every position, zeros included).
  val q93: Q = (s, d) =>
    graft.operators.TextStats.hashEmbed(
        Tables.documents(s, d).select("doc_id", "text"),
        "doc_id", "text", dim = 16)
      .orderBy("doc_id", "pos")

  val q93Sql: String =
    s"""WITH n AS (SELECT doc_id, $duckWords AS w FROM documents),
       |t AS (SELECT doc_id, unnest(w) AS word FROM n),
       |h AS (SELECT doc_id,
       |    CAST(('0x' || substr(md5(word), 1, 8))::BIGINT % 16 AS INT)
       |      AS pos,
       |    CASE WHEN (('0x' || substr(md5(word), 1, 8))::BIGINT // 16)
       |        % 2 = 0 THEN 1 ELSE -1 END AS s
       |  FROM t),
       |agg AS (SELECT doc_id, pos, CAST(sum(s) AS BIGINT) AS val
       |  FROM h GROUP BY doc_id, pos),
       |dn AS (SELECT doc_id, p.pos
       |  FROM documents, (SELECT unnest(range(0, 16)) AS pos) p)
       |SELECT dn.doc_id, CAST(dn.pos AS INT) AS pos,
       |  coalesce(a.val, 0) AS val
       |FROM dn LEFT JOIN agg a ON a.doc_id = dn.doc_id AND a.pos = dn.pos
       |ORDER BY dn.doc_id, dn.pos""".stripMargin

  // ---- q94 MJPEG-in-MP4 decoded-keyframe round trip ----------------------
  // Multimodal.encodeMjpegMp4 synthesizes REAL video containers: one JPEG
  // per frame inside mdat, with true stsz/stsc/stco sample tables and
  // (for ids % 3 != 0) an stss keyframe table. decodeMjpegKeyframes walks
  // the tables to each keyframe's byte range and decodes THE PIXELS with
  // javax.imageio; the oracle recomputes keyframe counts and the decoded
  // gray sum from synthesis arithmetic (uniform tiles survive JPEG
  // exactly — spec-pinned). Table counts alone could be faked from the
  // walk (q85's job); gray_sum_e4 only matches if actual frame bytes were
  // located AND decoded. 1/4 of payloads are raw text → the marker row.
  def q94Media(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        if (id % 4 == 0)
          graft.operators.Multimodal.MediaRecord(
            id, text.getBytes("UTF-8"), "text/plain")
        else {
          val n = (3 + id % 5).toInt
          val grays = (0 until n).map(j => ((id * 7 + j * 13) % 256).toInt)
          // ids % 3 == 0: no stss → every sample sync; otherwise keyframes
          // at the odd 1-based sample numbers 1, 3, 5, …
          val sync =
            if (id % 3 == 0) None
            else Some((1 to n by 2).toSeq)
          graft.operators.Multimodal.MediaRecord(
            id, graft.operators.Multimodal.encodeMjpegMp4(
              600, 3000, (id % 13 + 2).toInt, (id % 11 + 2).toInt,
              grays, sync),
            "video/mp4")
        }
      }
  }

  val q94: Q = (s, d) => {
    val media = q94Media(graft.core.Ops.widen(Tables.documents(s, d)))
    graft.operators.Multimodal.decodeMjpegKeyframes(media).toDF()
      .orderBy("media_id")
  }

  val q94Sql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 4 = 0 THEN NULL
      |         ELSE CAST(3 + doc_id % 5 AS INTEGER) END AS n,
      |    CAST(doc_id % 13 + 2 AS INTEGER) AS w,
      |    CAST(doc_id % 11 + 2 AS INTEGER) AS h
      |  FROM documents),
      |k AS (SELECT doc_id, j FROM p, unnest(generate_series(1, n)) t(j)
      |  WHERE doc_id % 3 = 0 OR j % 2 = 1),
      |g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS kf,
      |    CAST(sum((doc_id * 7 + (j - 1) * 13) % 256) * 10000 AS BIGINT)
      |      AS gsum
      |  FROM k GROUP BY doc_id)
      |SELECT p.doc_id AS media_id,
      |  CAST(CASE WHEN n IS NULL THEN -1 ELSE n END AS BIGINT) AS n_samples,
      |  CAST(CASE WHEN n IS NULL THEN -1 ELSE g.kf END AS BIGINT)
      |    AS n_keyframes,
      |  CAST(CASE WHEN n IS NULL THEN -1 ELSE g.kf END AS BIGINT)
      |    AS n_decoded,
      |  CAST(CASE WHEN n IS NULL THEN 0 ELSE w END AS INTEGER) AS width,
      |  CAST(CASE WHEN n IS NULL THEN 0 ELSE h END AS INTEGER) AS height,
      |  CAST(CASE WHEN n IS NULL THEN -1 ELSE g.gsum END AS BIGINT)
      |    AS gray_sum_e4
      |FROM p LEFT JOIN g USING (doc_id) ORDER BY media_id""".stripMargin

  // ---- q95 cross-document duplicate-window (substring) dedup -------------
  // Planting makes the window collisions real: docs %5 repeat their own
  // first 12 tokens at the end (intra-doc duplicate span), docs %7 share
  // a fixed 12-token snippet (cross-doc span; the earliest such doc's
  // occurrence is canonical and stays un-flagged). Both sides apply the
  // SAME text transformation, then compute the full keep-first window
  // algorithm: hash every 8-token window, canonical = min (doc, pos) per
  // content, duplicates = the rest, per-doc merged-interval coverage.
  private val q95Snippet =
    "omega sigma delta kappa theta lambda epsilon zeta eta iota mu nu"

  private def q95Docs(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    graft.core.Ops.widen(Tables.documents(s, d))
      .select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 5 === 0, concat(lit(" "), array_join(
          slice(graft.operators.Dedup.normalizeWords(col("text")), 1, 12),
          " "))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit(" " + q95Snippet))
          .otherwise(lit(""))).as("text"))

  val q95: Q = (s, d) =>
    graft.operators.Curation.duplicateWindows(q95Docs(s, d),
      "doc_id", "text", w = 8).orderBy("doc_id")

  val q95Sql: String =
    s"""WITH base AS (
       |  SELECT doc_id, text, $duckWords AS ws0 FROM documents),
       |p AS (
       |  SELECT doc_id, text
       |    || CASE WHEN doc_id % 5 = 0
       |         THEN ' ' || array_to_string(list_slice(ws0, 1, 12), ' ')
       |         ELSE '' END
       |    || CASE WHEN doc_id % 7 = 0 THEN ' $q95Snippet'
       |         ELSE '' END AS text
       |  FROM base),
       |t AS (SELECT doc_id, $duckWords AS ws FROM p),
       |sized AS (SELECT doc_id, greatest(len(ws) - 7, 0) AS nw, ws FROM t),
       |wins AS (
       |  SELECT doc_id, i AS pos,
       |    md5(array_to_string(list_slice(ws, i, i + 7), ' ')) AS h
       |  FROM sized, unnest(generate_series(1, nw)) u(i)),
       |dup AS (
       |  SELECT doc_id, pos FROM (
       |    SELECT doc_id, pos,
       |      row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
       |    FROM wins) WHERE rn > 1),
       |cov AS (
       |  SELECT doc_id, greatest(0, pos + 8 - greatest(pos,
       |    coalesce(max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))) AS c
       |  FROM dup),
       |st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows,
       |    CAST(sum(c) AS BIGINT) AS dup_tokens
       |  FROM cov GROUP BY doc_id)
       |SELECT s.doc_id, CAST(s.nw AS BIGINT) AS n_windows,
       |  coalesce(st.n_dup_windows, 0) AS n_dup_windows,
       |  coalesce(st.dup_tokens, 0) AS dup_tokens
       |FROM sized s LEFT JOIN st USING (doc_id) ORDER BY doc_id""".stripMargin

  // ---- q96 TF-IDF top terms ----------------------------------------------
  // Smoothed idf rounded to an e6 BIGINT per vocabulary term BEFORE the
  // tf multiply (engine-independent ranking; ln of a small-int ratio is
  // bit-identical across engines), top-3 per doc, ties by term.
  val q96: Q = (s, d) =>
    graft.operators.TextStats.tfidfTopTerms(
      graft.core.Ops.widen(Tables.documents(s, d)).select("doc_id", "text"),
      "doc_id", "text", k = 3).orderBy("doc_id", "rnk")

  val q96Sql: String =
    s"""WITH ws AS (
       |  SELECT doc_id, unnest($duckWords) AS term FROM documents),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM ws GROUP BY doc_id, term),
       |idf AS (SELECT term, CAST(floor(
       |    (ln(((SELECT count(*) FROM documents) + 1.0) / (count(*) + 1.0))
       |      + 1.0) * 1e6 + 0.5) AS BIGINT) AS idf_e6
       |  FROM tf GROUP BY term),
       |s AS (SELECT doc_id, term, tf, tf * idf_e6 AS score_e6,
       |    CAST(row_number() OVER (PARTITION BY doc_id
       |      ORDER BY tf * idf_e6 DESC, term) AS BIGINT) AS rnk
       |  FROM tf JOIN idf USING (term))
       |SELECT doc_id, term, tf, CAST(score_e6 AS BIGINT) AS score_e6, rnk
       |FROM s WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  // ---- q97 DSIR importance resampling ------------------------------------
  // Target-domain LM trained on the lang='en' slice, raw LM on the whole
  // corpus; log importance ratio logw_e4 = n_bigrams · (xr_e4 − xt_e4)
  // from ONE shared bigram explode; deterministic Gumbel-top-k selection
  // (noise from md5(doc_id)-derived uniforms, seed-salted) of the 100
  // most-target-like docs. The oracle mirrors BOTH LM scorings (left
  // joins: cross-model scoring hits the unseen-gram smoothing path q91's
  // self-train shape never exercises), the Gumbel arithmetic, and the
  // top-k — ties broken by doc_id on both sides.
  val q97: Q = (s, d) => {
    val docs = graft.core.Ops.widen(Tables.documents(s, d))
      .select("doc_id", "text", "lang")
    // in-pool target slice → the one-explode entry point (the compose-it-
    // yourself bigramCounts×2 + importanceWeights form explodes the
    // corpus three times); numerics and oracle unchanged
    val w = graft.operators.TextStats.importanceWeightsSlice(
      docs, "doc_id", "text", col("lang") === "en", vocabSize = 1000L)
    graft.operators.TextStats.importanceResample(w, "doc_id", k = 100,
        seed = 7L)
      .orderBy("doc_id")
  }

  val q97Sql: String =
    s"""WITH n AS (SELECT doc_id, lang, $duckWords AS w FROM documents),
       |bg AS (SELECT doc_id, lang, w[i] || ' ' || w[i + 1] AS gram
       |  FROM n, unnest(generate_series(1, len(w) - 1)) t(i)
       |  WHERE len(w) >= 2),
       |tg AS (SELECT gram, count(*) AS c FROM bg WHERE lang = 'en'
       |  GROUP BY gram),
       |tctx AS (SELECT string_split(gram, ' ')[1] AS w1, sum(c) AS ctx
       |  FROM tg GROUP BY 1),
       |rg AS (SELECT gram, count(*) AS c FROM bg GROUP BY gram),
       |rctx AS (SELECT string_split(gram, ' ')[1] AS w1, sum(c) AS ctx
       |  FROM rg GROUP BY 1),
       |sct AS (SELECT b.doc_id, CAST(floor(-ln((coalesce(g.c, 0) + 1.0) /
       |      (coalesce(x.ctx, 0) + 1000.0)) * 1000000 + 0.5) AS BIGINT)
       |    AS le6
       |  FROM bg b
       |  LEFT JOIN tg g USING (gram)
       |  LEFT JOIN tctx x ON x.w1 = string_split(b.gram, ' ')[1]),
       |aggt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(floor(sum(le6) / (count(*) * 100.0) + 0.5) AS BIGINT)
       |      AS xt_e4
       |  FROM sct GROUP BY doc_id),
       |scr AS (SELECT b.doc_id, CAST(floor(-ln((coalesce(g.c, 0) + 1.0) /
       |      (coalesce(x.ctx, 0) + 1000.0)) * 1000000 + 0.5) AS BIGINT)
       |    AS le6
       |  FROM bg b
       |  LEFT JOIN rg g USING (gram)
       |  LEFT JOIN rctx x ON x.w1 = string_split(b.gram, ' ')[1]),
       |aggr AS (SELECT doc_id,
       |    CAST(floor(sum(le6) / (count(*) * 100.0) + 0.5) AS BIGINT)
       |      AS xr_e4
       |  FROM scr GROUP BY doc_id),
       |wt AS (SELECT d.doc_id,
       |    coalesce(aggt.n_bigrams, 0) AS n_bigrams,
       |    coalesce(aggt.xt_e4, 0) AS xt_e4,
       |    coalesce(aggr.xr_e4, 0) AS xr_e4,
       |    coalesce(aggt.n_bigrams, 0) *
       |      (coalesce(aggr.xr_e4, 0) - coalesce(aggt.xt_e4, 0)) AS logw_e4
       |  FROM documents d
       |  LEFT JOIN aggt USING (doc_id) LEFT JOIN aggr USING (doc_id)),
       |gm AS (SELECT *, CAST(floor(-ln(-ln(
       |      (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '/7'), 1, 8))
       |        ::BIGINT + 0.5) / 4294967296.0)) * 10000 + 0.5) AS BIGINT)
       |    AS gumbel_e4 FROM wt),
       |sel AS (SELECT doc_id, n_bigrams, xt_e4, xr_e4, logw_e4, gumbel_e4,
       |    logw_e4 + CAST(floor(gumbel_e4 * 10000 / 10000.0) AS BIGINT)
       |      AS score_e4
       |  FROM gm ORDER BY score_e4 DESC, doc_id LIMIT 100)
       |SELECT * FROM sel ORDER BY doc_id""".stripMargin

  // ---- q98 fastText-style quality classifier -----------------------------
  // Logistic regression over q93's hashing-trick features (dim 8 + bias),
  // trained by 2 full-batch GD steps at lr 0.5 against a deterministic
  // label (length(text) >= 200), then scored over the whole corpus. The
  // oracle UNROLLS both iterations in SQL: iter 1 from zero weights has
  // p = 500000 exactly for every doc, iter 2 recomputes margins under the
  // iter-1 weights; all sums are exact-integer (per-row e6-rounded
  // sigmoid — the q91 discipline), the lr·g/(n·1e6) update is the same
  // floor(x+0.5) on both sides. A hash match proves the whole training
  // trajectory AND the scoring pass, not just one dot product.
  val q98: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"),
      (length(col("text")) >= 200).cast("int").as("y"))
    val model = graft.operators.Classifier.train(
      docs, "doc_id", "text", "y", dim = 8, iters = 2, lrE6 = 500000L)
    graft.operators.Classifier.score(docs, "doc_id", "text", model)
      .join(docs.select(col("doc_id"), col("y").cast("long").as("y")),
        Seq("doc_id"))
      .orderBy("doc_id")
      .select(col("doc_id"), col("p_e6"), col("y"))
  }

  val q98Sql: String =
    s"""WITH base AS (SELECT doc_id, $duckWords AS w,
       |    CASE WHEN length(text) >= 200 THEN 1 ELSE 0 END AS y
       |  FROM documents),
       |tok AS (SELECT doc_id, unnest(w) AS word FROM base),
       |h AS (SELECT doc_id,
       |    CAST(('0x' || substr(md5(word), 1, 8))::BIGINT % 8 AS INT)
       |      AS pos,
       |    CASE WHEN (('0x' || substr(md5(word), 1, 8))::BIGINT // 8)
       |        % 2 = 0 THEN 1 ELSE -1 END AS s
       |  FROM tok),
       |fw AS (SELECT doc_id, pos, CAST(sum(s) AS BIGINT) AS x
       |  FROM h GROUP BY doc_id, pos),
       |f AS (SELECT doc_id, pos, x FROM fw
       |  UNION ALL SELECT doc_id, 8 AS pos, CAST(1 AS BIGINT) AS x
       |    FROM base),
       |lab AS (SELECT doc_id, y FROM base),
       |c AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM lab),
       |g1 AS (SELECT f.pos,
       |    CAST(sum(f.x * (500000 - lab.y * 1000000)) AS BIGINT) AS g
       |  FROM f JOIN lab USING (doc_id) GROUP BY f.pos),
       |w1 AS (SELECT pos,
       |    CAST(-floor(500000.0 * g / (n * 1000000.0) + 0.5) AS BIGINT)
       |      AS w
       |  FROM g1 CROSS JOIN c),
       |m2 AS (SELECT f.doc_id, CAST(sum(f.x * w1.w) AS BIGINT) AS m
       |  FROM f JOIN w1 USING (pos) GROUP BY f.doc_id),
       |p2 AS (SELECT lab.doc_id, lab.y,
       |    CAST(floor(1000000.0 / (1.0 + exp(-(m2.m / 1000000.0))) + 0.5)
       |      AS BIGINT) AS p
       |  FROM lab JOIN m2 USING (doc_id)),
       |g2 AS (SELECT f.pos,
       |    CAST(sum(f.x * (p2.p - p2.y * 1000000)) AS BIGINT) AS g
       |  FROM f JOIN p2 USING (doc_id) GROUP BY f.pos),
       |w2 AS (SELECT w1.pos AS pos,
       |    CAST(w1.w - floor(500000.0 * g2.g / (n * 1000000.0) + 0.5)
       |      AS BIGINT) AS w
       |  FROM w1 JOIN g2 ON w1.pos = g2.pos CROSS JOIN c),
       |mf AS (SELECT f.doc_id, CAST(sum(f.x * w2.w) AS BIGINT) AS m
       |  FROM f JOIN w2 USING (pos) GROUP BY f.doc_id)
       |SELECT lab.doc_id,
       |  CAST(floor(1000000.0 / (1.0 + exp(-(mf.m / 1000000.0))) + 0.5)
       |    AS BIGINT) AS p_e6,
       |  CAST(lab.y AS BIGINT) AS y
       |FROM lab JOIN mf USING (doc_id) ORDER BY lab.doc_id""".stripMargin

  // ---- q99 C4 cleaning rules ---------------------------------------------
  // Planted per-doc: a passing sentence line, a no-terminal-punct line
  // (always dropped), a javascript banner (docs %7), a lorem-ipsum line
  // (docs %11 — page flag), a curly-brace code line (docs %13 — page
  // flag). The second body line ends in '!' but its word count depends on
  // substr(text, 81, 60) — short docs drop it, exercising the
  // min-line-words rule on real data. Both sides apply the identical
  // construction, line filter, sentence count, and page verdict.
  val q99: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"),
      concat(
        substring(col("text"), 1, 80), lit(" alpha beta gamma."),
        lit("\nno terminal punctuation on this line at all"),
        when(col("doc_id") % 7 === 0,
          lit("\nplease enable javascript to continue viewing."))
          .otherwise(lit("")),
        lit("\n"), substring(col("text"), 81, 60),
        lit(" delta epsilon zeta!"),
        when(col("doc_id") % 11 === 0,
          lit("\nlorem ipsum dolor sit amet consectetur."))
          .otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          lit("\nvar config = [ key value ] ok then { x }."))
          .otherwise(lit(""))
      ).as("text"))
    Curation.c4Clean(docs, "doc_id", "text").orderBy("doc_id")
  }

  val q99Sql: String =
    """WITH d AS (SELECT doc_id,
      |    substr(text, 1, 80) || ' alpha beta gamma.' ||
      |    chr(10) || 'no terminal punctuation on this line at all' ||
      |    CASE WHEN doc_id % 7 = 0 THEN chr(10) ||
      |      'please enable javascript to continue viewing.' ELSE '' END ||
      |    chr(10) || substr(text, 81, 60) || ' delta epsilon zeta!' ||
      |    CASE WHEN doc_id % 11 = 0 THEN chr(10) ||
      |      'lorem ipsum dolor sit amet consectetur.' ELSE '' END ||
      |    CASE WHEN doc_id % 13 = 0 THEN chr(10) ||
      |      'var config = [ key value ] ok then { x }.' ELSE '' END
      |    AS text FROM documents),
      |k AS (SELECT doc_id, text,
      |    list_filter(string_split(text, chr(10)), l ->
      |      right(rtrim(l), 1) IN ('.', '!', '?', '"')
      |      AND len(list_filter(string_split_regex(trim(l), ' +'),
      |        w -> w <> '')) >= 5
      |      AND NOT contains(lower(l), 'javascript')) AS kept,
      |    len(string_split(text, chr(10))) AS n_lines
      |  FROM d),
      |c AS (SELECT doc_id, text,
      |    array_to_string(kept, chr(10)) AS cleaned_text,
      |    CAST(len(kept) AS BIGINT) AS n_lines_kept,
      |    CAST(n_lines - len(kept) AS BIGINT) AS n_lines_dropped
      |  FROM k),
      |s AS (SELECT *, CAST(length(cleaned_text) - length(
      |      regexp_replace(cleaned_text, '[.!?]', '', 'g')) AS BIGINT)
      |    AS n_sentences FROM c)
      |SELECT doc_id, cleaned_text, n_lines_kept, n_lines_dropped,
      |  n_sentences,
      |  (n_sentences >= 3 AND NOT contains(lower(text), 'lorem ipsum')
      |    AND NOT contains(text, '{')) AS keep
      |FROM s ORDER BY doc_id""".stripMargin

  // ---- q100 token-budget mixture plan ------------------------------------
  // Domains = the corpus's lang values; weights cover en/de/fr (es/zh
  // exercise the unlisted→0 path), the budget forces the epoch cap on at
  // least the low-resource weighted domains (avail ≪ desired at sf0.01),
  // and deficits are the difference the plan must report. Both engines
  // compute the identical double expressions over exact integer inputs —
  // one floor at the end of each, hash-equal.
  val q100: Q = (s, d) =>
    graft.operators.Curation.mixturePlan(
        Tables.documents(s, d).select(col("lang"), col("text")),
        "lang", graft.operators.TextStats.wsTokenCount(col("text")),
        Map("en" -> 5000L, "de" -> 1250L, "fr" -> 2500L),
        budgetTokens = 1000000L, maxEpochsE4 = 25000L)
      .orderBy("lang")

  val q100Sql: String =
    """WITH t AS (SELECT lang,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(string_split_regex(trim(text), '\s+')) END AS toks
      |  FROM documents),
      |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(toks) AS BIGINT) AS avail_tokens FROM t GROUP BY lang),
      |w AS (SELECT lang, n_docs, avail_tokens,
      |    CASE WHEN lang = 'en' THEN 5000 WHEN lang = 'de' THEN 1250
      |         WHEN lang = 'fr' THEN 2500 ELSE 0 END AS wv
      |  FROM a),
      |p AS (SELECT lang, n_docs, avail_tokens,
      |    CAST(floor(wv * 10000.0 / 8750.0) AS BIGINT) AS weight_e4,
      |    CAST(floor(1000000.0 * wv / 8750.0) AS BIGINT) AS desired_tokens
      |  FROM w),
      |e AS (SELECT *, CASE WHEN avail_tokens <= 0 THEN CAST(0 AS BIGINT)
      |    ELSE least(CAST(25000 AS BIGINT),
      |      CAST(floor(desired_tokens * 10000.0 / avail_tokens) AS BIGINT))
      |    END AS epochs_e4
      |  FROM p)
      |SELECT lang, n_docs, avail_tokens, weight_e4, desired_tokens,
      |  epochs_e4,
      |  CAST(floor(avail_tokens * epochs_e4 / 10000.0) AS BIGINT)
      |    AS planned_tokens,
      |  desired_tokens - CAST(floor(avail_tokens * epochs_e4 / 10000.0)
      |    AS BIGINT) AS deficit
      |FROM e ORDER BY lang""".stripMargin

  // ---- q101 box-average image resize (REAL decode + resample) -----------
  // Multimodal.encodeSplitGrayPng synthesizes two-tone PNGs (dims, split
  // column and both gray levels doc_id-derived — NON-uniform, so wrong box
  // boundaries change the answer); Multimodal.resizeImages decodes and
  // box-averages to a fixed 4x3 grid, summing the per-output-pixel e4
  // means. The oracle regenerates the full 4x3 box grid (floor boundaries,
  // >=1-px clamp) and the identical sum*10000.0/nbox+0.5 floor per pixel —
  // exact integers into identical double expressions, hash-equal. 1/5 of
  // payloads are raw text, pinning the undecodable marker row.
  def q101Media(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      if (id % 5 == 0)
        graft.operators.Multimodal.MediaRecord(
          id, s"not image: $id".getBytes("UTF-8"), "text/plain")
      else {
        val w = (id % 29 + 2).toInt
        val h = (id % 17 + 1).toInt
        graft.operators.Multimodal.MediaRecord(
          id,
          graft.operators.Multimodal.encodeSplitGrayPng(
            w, h, w / 2, (id % 256).toInt, ((id * 7 + 13) % 256).toInt),
          "image/png")
      }
    }
  }

  val q101: Q = (s, d) => {
    val media = q101Media(graft.core.Ops.widen(Tables.documents(s, d)))
    graft.operators.Multimodal.resizeImages(media, 4, 3).toDF()
      .orderBy("media_id")
  }

  val q101Sql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN NULL ELSE doc_id % 29 + 2 END AS w,
      |    doc_id % 17 + 1 AS h,
      |    (doc_id % 29 + 2) // 2 AS split,
      |    doc_id % 256 AS gl,
      |    (doc_id * 7 + 13) % 256 AS gr
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, w, h, split, gl, gr,
      |    (i.i * w) // 4 AS x0,
      |    least(w, greatest(((i.i + 1) * w) // 4, (i.i * w) // 4 + 1)) AS x1,
      |    (j.j * h) // 3 AS y0,
      |    least(h, greatest(((j.j + 1) * h) // 3, (j.j * h) // 3 + 1)) AS y1
      |  FROM p, range(4) i(i), range(3) j(j)
      |  WHERE w IS NOT NULL),
      |m AS (
      |  SELECT doc_id,
      |    CAST(floor((y1 - y0) * (gl * (least(x1, split) - least(x0, split)) +
      |        gr * ((x1 - x0) - (least(x1, split) - least(x0, split)))) * 10000.0
      |      / ((x1 - x0) * (y1 - y0)) + 0.5) AS BIGINT) AS e4
      |  FROM b),
      |a AS (SELECT doc_id, CAST(sum(e4) AS BIGINT) AS out_sum_e4
      |  FROM m GROUP BY doc_id)
      |SELECT p.doc_id AS media_id,
      |  CAST(coalesce(p.w, 0) AS INTEGER) AS width,
      |  CAST(CASE WHEN p.w IS NULL THEN 0 ELSE p.h END AS INTEGER) AS height,
      |  CAST(CASE WHEN p.w IS NULL THEN 0 ELSE 4 END AS INTEGER) AS out_w,
      |  CAST(CASE WHEN p.w IS NULL THEN 0 ELSE 3 END AS INTEGER) AS out_h,
      |  CAST(CASE WHEN p.w IS NULL THEN -1 ELSE a.out_sum_e4 END AS BIGINT)
      |    AS out_sum_e4
      |FROM p LEFT JOIN a ON p.doc_id = a.doc_id
      |ORDER BY media_id""".stripMargin

  // ---- q102 audio energy windows (silence gate over decoded PCM) --------
  // Reuses q84's WAV synthesis verbatim (ramp frames step*(i%100), rate /
  // channels / length doc_id-derived); Multimodal.audioEnergyWindows
  // decodes the PCM stream and scores 25-frame windows. Windows align to
  // 25-frame boundaries, so each window's frame-value sum has the closed
  // form 25*((k*25) % 100) + 300 — SQL-expressible; the oracle feeds it
  // through the identical winSum*10000.0/samplesPerWindow+0.5 floor.
  // Threshold 2000e4 makes window silence depend on BOTH k and step —
  // n_silent varies across docs. Text payloads pin the marker row.
  val q102: Q = (s, d) => {
    val media = q84Media(graft.core.Ops.widen(Tables.documents(s, d)))
    graft.operators.Multimodal
      .audioEnergyWindows(media, windowFrames = 25, silenceE4 = 20000000L)
      .toDF()
      .orderBy("media_id")
  }

  val q102Sql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN NULL ELSE 1 + doc_id % 2 END AS ch,
      |    50 + doc_id % 150 AS n,
      |    (doc_id % 7 + 1) * 40 AS step
      |  FROM documents),
      |w AS (
      |  SELECT doc_id,
      |    CAST(floor((ch * step * (25 * ((k.k * 25) % 100) + 300)) * 10000.0
      |      / (25 * ch) + 0.5) AS BIGINT) AS mean_e4
      |  FROM p, range(7) k(k)
      |  WHERE ch IS NOT NULL AND k.k < n // 25),
      |a AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
      |    CAST(sum(CASE WHEN mean_e4 < 20000000 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_silent,
      |    min(mean_e4) AS min_mean_e4, max(mean_e4) AS max_mean_e4
      |  FROM w GROUP BY doc_id)
      |SELECT p.doc_id AS media_id,
      |  CAST(CASE WHEN p.ch IS NULL THEN 0 ELSE a.n_windows END AS BIGINT)
      |    AS n_windows,
      |  CAST(CASE WHEN p.ch IS NULL THEN -1 ELSE a.n_silent END AS BIGINT)
      |    AS n_silent,
      |  CAST(CASE WHEN p.ch IS NULL THEN -1 ELSE a.min_mean_e4 END AS BIGINT)
      |    AS min_mean_e4,
      |  CAST(CASE WHEN p.ch IS NULL THEN -1 ELSE a.max_mean_e4 END AS BIGINT)
      |    AS max_mean_e4
      |FROM p LEFT JOIN a ON p.doc_id = a.doc_id
      |ORDER BY media_id""".stripMargin

  // ---- q103/q104 perceptual image hash + near-dup pairs ------------------
  // 16x16 PNGs with a per-pixel pseudo-random gray pattern (64 bits of
  // real hash entropy — two-tone tiles would collapse to a handful of
  // patterns and blow the pair join quadratic); docs with id % 7 == 3 are
  // PLANTED near-dups: the previous doc's pattern with one pixel nudged
  // (+9 at (0,0)), so their aHash sits within a few bits of the base's.
  // Each 8x8 aHash cell covers exactly 2x2 pixels, so the oracle's cell
  // mean is the closed form sum4*2500; bits compare cells against the
  // integer average of all 64 cells, packed with bit 63 as the BIGINT
  // sign (DuckDB 1<<63 overflows; the oracle adds Long.MinValue for that
  // bit instead). 1/5 raw-text payloads pin the -1 marker.
  def q103Media(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      if (id % 5 == 0)
        graft.operators.Multimodal.MediaRecord(
          id, s"not image: $id".getBytes("UTF-8"), "text/plain")
      else {
        val variant = id % 7 == 3
        val base = if (variant) id - 1 else id
        val px = Array.tabulate(256) { p =>
          val (x, y) = (p % 16, p / 16)
          val nudge = if (variant && x == 0 && y == 0) 9 else 0
          ((base * 31 + y * 16 + x * 17 + nudge) % 256).toInt
        }
        graft.operators.Multimodal.MediaRecord(
          id, graft.operators.Multimodal.encodeGrayPixelsPng(16, 16, px),
          "image/png")
      }
    }
  }

  /** The shared hash CTE: per-doc aHash recomputed from the synthesis
    * arithmetic (cell k = j*8+i means sum4*2500; integer-average
    * threshold; sign-bit packing).
    */
  private val aHashCte: String =
    """p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN NULL
      |         WHEN doc_id % 7 = 3 THEN doc_id - 1 ELSE doc_id END AS base,
      |    (doc_id % 7 = 3) AS isvar
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, j.j * 8 + i.i AS k,
      |    ((p.base * 31 + (j.j*2) * 16 + (i.i*2) * 17 +
      |        CASE WHEN p.isvar AND i.i = 0 AND j.j = 0 THEN 9 ELSE 0 END)
      |       % 256 +
      |     (p.base * 31 + (j.j*2) * 16 + (i.i*2+1) * 17) % 256 +
      |     (p.base * 31 + (j.j*2+1) * 16 + (i.i*2) * 17) % 256 +
      |     (p.base * 31 + (j.j*2+1) * 16 + (i.i*2+1) * 17) % 256) * 2500
      |      AS e4
      |  FROM p, range(8) i(i), range(8) j(j)
      |  WHERE p.base IS NOT NULL),
      |g2 AS (
      |  SELECT doc_id, k, e4,
      |    CAST(sum(e4) OVER (PARTITION BY doc_id) AS BIGINT) // 64 AS avg
      |  FROM g),
      |h AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN e4 > avg THEN
      |        CASE WHEN k = 63 THEN -9223372036854775808
      |             ELSE CAST(1 AS BIGINT) << CAST(k AS INTEGER) END
      |      ELSE 0 END) AS BIGINT) AS ahash
      |  FROM g2 GROUP BY doc_id)""".stripMargin

  val q103: Q = (s, d) => {
    val media = q103Media(graft.core.Ops.widen(Tables.documents(s, d)))
    graft.operators.Multimodal.imageAHash(media).toDF()
      .orderBy("media_id")
  }

  val q103Sql: String =
    s"""WITH $aHashCte
      |SELECT p.doc_id AS media_id,
      |  CAST(coalesce(h.ahash, -1) AS BIGINT) AS ahash
      |FROM p LEFT JOIN h ON p.doc_id = h.doc_id
      |ORDER BY media_id""".stripMargin

  val q104: Q = (s, d) => {
    val media = q103Media(graft.core.Ops.widen(Tables.documents(s, d)))
    graft.operators.Multimodal.imageNearDupPairs(media, 3)
      .orderBy("idA", "idB")
  }

  val q104Sql: String =
    s"""WITH $aHashCte
      |SELECT a.doc_id AS idA, b.doc_id AS idB,
      |  CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
      |FROM h a JOIN h b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
      |ORDER BY idA, idB""".stripMargin

  // ---- q105 BM25 top-k retrieval -----------------------------------------
  // Queries derived from the corpus itself (every 97th doc contributes its
  // first 3 normalized words as a term set) so the oracle can mirror the
  // derivation; k1 = 1.25 / b = 0.75 are exact binary fractions, each
  // per-term contribution e6-rounded BEFORE the per-doc sum (repo
  // determinism convention), N and avgdl computed once driver-side.
  val q105: Q = (s, d) => {
    val docs = graft.core.Ops.widen(Tables.documents(s, d))
      .select("doc_id", "text")
    val queries = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("qid"),
        explode(slice(Dedup.normalizeWords(col("text")), 1, 3)).as("term"))
    TextStats.bm25TopK(docs, "doc_id", "text", queries, "qid", "term", k = 5)
      .orderBy("qid", "rnk")
  }

  val q105Sql: String =
    s"""WITH w AS (SELECT doc_id, $duckWords AS w FROM documents),
       |stat AS (SELECT count(*) AS n,
       |    CAST(sum(len(w)) AS DOUBLE) / count(*) AS avgdl FROM w),
       |ws AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM w),
       |tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM ws GROUP BY doc_id, dl, term),
       |idf AS (SELECT term, CAST(floor(
       |    ln(((SELECT n FROM stat) - count(*) + 0.5) / (count(*) + 0.5)
       |      + 1.0) * 1e6 + 0.5) AS BIGINT) AS idf_e6
       |  FROM tf GROUP BY term),
       |q AS (SELECT DISTINCT qid, term FROM (
       |  SELECT doc_id AS qid, unnest(w[1:3]) AS term FROM w
       |  WHERE doc_id % 97 = 0)),
       |c AS (SELECT q.qid, tf.doc_id, CAST(floor(
       |    idf_e6 * (tf * 2.25) /
       |      (tf + 1.25 * (0.25 + 0.75 * dl / (SELECT avgdl FROM stat)))
       |    + 0.5) AS BIGINT) AS c_e6
       |  FROM tf JOIN q USING (term) JOIN idf USING (term)),
       |sc AS (SELECT qid, doc_id, CAST(sum(c_e6) AS BIGINT) AS score_e6
       |  FROM c GROUP BY qid, doc_id),
       |r AS (SELECT qid, doc_id, score_e6, CAST(row_number() OVER (
       |    PARTITION BY qid ORDER BY score_e6 DESC, doc_id) AS BIGINT)
       |    AS rnk FROM sc)
       |SELECT qid, doc_id, score_e6, rnk FROM r WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin

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

  // ---- q110 trigram stupid-backoff LM ------------------------------------
  // Model trained on the lang='en' slice, scored over the WHOLE corpus —
  // cross-model on purpose: non-en docs hit the unseen-trigram and
  // unseen-bigram backoff branches (0.4 factors + add-one unigram
  // floor), which a self-train shape never exercises. Oracle mirrors all
  // three model joins, the branch arithmetic (0.4e0 doubles, identical
  // association), and the e6-before-sum rounding; every doc appears
  // (< 3 words ⇒ zeros).
  val q110: Q = (s, d) => {
    val docs = graft.core.Ops.widen(Tables.documents(s, d))
      .select("doc_id", "text", "lang")
    TextStats.stupidBackoffScores(
      docs.select("doc_id", "text"), "doc_id", "text",
      docs.filter(col("lang") === "en").select("text"), "text")
      .orderBy("doc_id")
  }

  val q110Sql: String =
    s"""WITH nt AS (SELECT doc_id, lang, $duckWords AS w FROM documents),
       |n AS (SELECT CAST(sum(len(w)) AS BIGINT) AS n FROM nt
       |  WHERE lang = 'en'),
       |tri AS (SELECT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram,
       |    CAST(count(*) AS BIGINT) AS c3
       |  FROM nt, unnest(generate_series(1, len(w) - 2)) t(i)
       |  WHERE lang = 'en' AND len(w) >= 3 GROUP BY 1),
       |bi AS (SELECT w[i] || ' ' || w[i+1] AS gram,
       |    CAST(count(*) AS BIGINT) AS c2
       |  FROM nt, unnest(generate_series(1, len(w) - 1)) t(i)
       |  WHERE lang = 'en' AND len(w) >= 2 GROUP BY 1),
       |uni AS (SELECT gram, CAST(count(*) AS BIGINT) AS c1 FROM (
       |  SELECT unnest(w) AS gram FROM nt WHERE lang = 'en') GROUP BY 1),
       |st AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3
       |  FROM nt, unnest(generate_series(1, len(w) - 2)) t(i)
       |  WHERE len(w) >= 3),
       |sc AS (SELECT st.doc_id,
       |    CASE WHEN tri.c3 IS NOT NULL THEN tri.c3 / bc.c2
       |         ELSE 0.4e0 * (CASE WHEN bs.c2 IS NOT NULL
       |              THEN bs.c2 / uc.c1
       |              ELSE 0.4e0 * (coalesce(us.c1, 0) + 1e0) /
       |                ((SELECT n FROM n) + 1e0) END)
       |    END AS s
       |  FROM st
       |  LEFT JOIN tri ON tri.gram = st.w1 || ' ' || st.w2 || ' ' || st.w3
       |  LEFT JOIN bi bc ON bc.gram = st.w1 || ' ' || st.w2
       |  LEFT JOIN bi bs ON bs.gram = st.w2 || ' ' || st.w3
       |  LEFT JOIN uni uc ON uc.gram = st.w2
       |  LEFT JOIN uni us ON us.gram = st.w3),
       |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri,
       |    CAST(sum(CAST(floor(-ln(s) * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
       |      AS nats_e6
       |  FROM sc GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(a.n_tri, 0) AS n_tri,
       |  coalesce(a.nats_e6, 0) AS nats_e6
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ---- q111 positional phrase search -------------------------------------
  // Phrases = words 2..4 of every 89th doc (each query guaranteed ≥ 1
  // hit: its own source doc). The oracle is an INDEPENDENT formulation —
  // a direct array scan (w[i], w[i+1], w[i+2]) rather than a mirror of
  // the postings joins — so a join-logic bug can't cancel out.
  val q111: Q = (s, d) => {
    val docs = graft.core.Ops.widen(Tables.documents(s, d))
      .select("doc_id", "text")
    val phrases = docs.filter(col("doc_id") % 89 === 0)
      .select(col("doc_id").as("qid"),
        slice(Dedup.normalizeWords(col("text")), 2, 3).as("ts"))
      .filter(size(col("ts")) === 3)
    TextStats.phraseSearch3(docs, "doc_id", "text", phrases, "qid", "ts")
      .orderBy("qid", "doc_id", "match_pos")
  }

  val q111Sql: String =
    s"""WITH w AS (SELECT doc_id, $duckWords AS w FROM documents),
       |q AS (SELECT doc_id AS qid, w[2] AS t1, w[3] AS t2, w[4] AS t3
       |  FROM w WHERE doc_id % 89 = 0 AND len(w) >= 4),
       |m AS (SELECT q.qid, w.doc_id, CAST(t.i AS BIGINT) AS match_pos
       |  FROM q, w, unnest(generate_series(1, len(w.w) - 2)) t(i)
       |  WHERE len(w.w) >= 3 AND w.w[t.i] = q.t1
       |    AND w.w[t.i + 1] = q.t2 AND w.w[t.i + 2] = q.t3)
       |SELECT qid, doc_id, match_pos FROM m
       |ORDER BY qid, doc_id, match_pos""".stripMargin

  // ---- q112 cluster-balanced sampling ------------------------------------
  // Fixed centroid set (id % 25 — the q31 convention that keeps training
  // out of the oracle's way), md5(id) priority, 5 kept per cell. The
  // oracle mirrors the assignment argmax (cosine + cid tiebreak) and the
  // priority window.
  val q112: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    Similarity.clusterBalancedSample(e, e.filter(col("id") % 25 === 0), 5)
      .orderBy("cid", "rank")
  }

  val q112Sql: String = {
    val cos = Similarity.cosineDuckSql("e.v", "c.cv")
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |cent AS (SELECT id AS cid, v AS cv FROM e WHERE id % 25 = 0),
       |assigned AS (
       |  SELECT id, cid FROM (
       |    SELECT e.id, c.cid,
       |      row_number() OVER (PARTITION BY e.id
       |        ORDER BY $cos DESC, c.cid ASC) AS rn
       |    FROM e CROSS JOIN cent c) WHERE rn = 1),
       |pri AS (SELECT cid, id,
       |    ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT AS pri
       |  FROM assigned),
       |r AS (SELECT cid, id, pri, CAST(row_number() OVER (
       |    PARTITION BY cid ORDER BY pri ASC, id ASC) AS BIGINT) AS rank
       |  FROM pri)
       |SELECT cid, id, pri, rank FROM r WHERE rank <= 5
       |ORDER BY cid, rank""".stripMargin
  }

  // ---- q88 intra-document line dedup ------------------------------------
  // Repeated lines planted per doc (duplicate banner + duplicate body
  // line); Curation.dedupLines keeps first occurrences in original order
  // and counts drops. Oracle mirrors with WITH ORDINALITY + ordered
  // string_agg.
  val q88: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"),
      concat_ws("\n", lit("== HEADER =="), col("text"),
        lit("== HEADER =="), substring(col("text"), 1, 40), col("text"),
        lit("")).as("text"))
    Curation.dedupLines(docs, "doc_id", "text").orderBy("doc_id")
  }

  val q88Sql: String =
    """WITH docs AS (SELECT doc_id,
      |    '== HEADER ==' || chr(10) || text || chr(10) || '== HEADER =='
      |    || chr(10) || substr(text, 1, 40) || chr(10) || text || chr(10)
      |    AS text
      |  FROM documents),
      |l AS (SELECT doc_id, t.pos AS pos, ls[t.pos] AS line
      |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM docs),
      |    unnest(generate_series(1, len(ls))) AS t(pos)),
      |f AS (SELECT doc_id, line, min(pos) AS pos, count(*) AS occ
      |  FROM l GROUP BY doc_id, line)
      |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS cleaned_text,
      |  CAST(sum(occ - 1) AS BIGINT) AS n_removed
      |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin

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
       |  FROM documents)
       |SELECT fid * 1048576 + rec_index AS id,
       |  ${graft.operators.Curation.htmlToTextDuckSql(page)} AS text
       |FROM f ORDER BY id""".stripMargin
  }

  // ---- registry ---------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q27_minhash_lsh_neardup" -> q27,
    "q28_simhash" -> q28,
    "q29_ngram_jaccard" -> q29,
    "q30_cosine_neardup" -> q30,
    "q31_ivf_ann" -> q31,
    "q32_lang_id" -> q32,
    "q33_quality_score" -> q33,
    "q34_token_count" -> q34,
    "q35_winnow_fingerprint" -> q35,
    "q36_multimodal_decode" -> q36,
    "q37_stratified_sample" -> q37,
    "q38_token_binning" -> q38,
    "q39_shard_assignment" -> q39,
    "q40_kmeans_step" -> q40,
    "q41_json_extract" -> q41,
    "q47_approx_aggs" -> q47,
    "q48_pii_redaction" -> q48,
    "q51_repetition_ratio" -> q51,
    "q52_rplsh_neardup" -> q52,
    "q53_sequence_packing" -> q53,
    "q54_dedup_components" -> q54,
    "q55_int8_quantization" -> q55,
    "q56_user_rights_sort" -> q56,
    "q57_decontamination" -> q57,
    "q58_weighted_mix" -> q58,
    "q59_boilerplate" -> q59,
    "q60_simhash_neardup" -> q60,
    "q61_asof_join" -> q61,
    "q62_range_join" -> q62,
    "q63_bloom_semi_join" -> q63,
    "q69_asof_bucketed" -> q69,
    "q70_ivf_neardup" -> q70,
    "q71_asof_native" -> q71,
    "q72_session_window" -> q72,
    "q73_window_breadth" -> q73,
    "q74_fuzzy_match" -> q74,
    "q75_zorder" -> q75,
    "q76_bpe_pairs" -> q76,
    "q77_set_ops" -> q77,
    "q78_chunking" -> q78,
    "q79_url_canon" -> q79,
    "q80_media_meta" -> q80,
    "q81_pagerank" -> q81,
    "q82_image_decode" -> q82,
    "q83_bpe_encode" -> q83,
    "q84_audio_decode" -> q84,
    "q85_mp4_meta" -> q85,
    "q86_pq_encode" -> q86,
    "q87_pq_adc_topk" -> q87,
    "q88_line_dedup" -> q88,
    "q89_ivfpq_topk" -> q89,
    "q90_gopher_rules" -> q90,
    "q91_bigram_lm" -> q91,
    "q92_ivfpq_residual" -> q92,
    "q93_hash_embed" -> q93,
    "q94_mjpeg_decode" -> q94,
    "q95_dup_windows" -> q95,
    "q96_tfidf_terms" -> q96,
    "q97_dsir_resample" -> q97,
    "q98_quality_classifier" -> q98,
    "q99_c4_rules" -> q99,
    "q100_mixture_plan" -> q100,
    "q101_image_resize" -> q101,
    "q102_audio_windows" -> q102,
    "q103_image_ahash" -> q103,
    "q104_image_neardup" -> q104,
    "q105_bm25_topk" -> q105,
    "q106_cms_heavy" -> q106,
    "q107_hll_distinct" -> q107,
    "q108_warc_parse" -> q108,
    "q109_html_text" -> q109,
    "q110_trigram_backoff" -> q110,
    "q111_phrase_search" -> q111,
    "q112_cluster_sample" -> q112,
    "q113_zip_introspect" -> q113,
    "q114_size_change" -> q114,
    "q115_inventory_parse" -> q115,
    "q116_crawl_ingest" -> q116,
  )

  val oracleSql: Map[String, String] = Map(
    "q27_minhash_lsh_neardup" -> q27Sql,
    "q28_simhash" -> q28Sql,
    "q29_ngram_jaccard" -> q29Sql,
    "q30_cosine_neardup" -> q30Sql,
    "q31_ivf_ann" -> q31Sql,
    "q32_lang_id" -> q32Sql,
    "q33_quality_score" -> q33Sql,
    "q34_token_count" -> q34Sql,
    "q35_winnow_fingerprint" -> q35Sql,
    "q36_multimodal_decode" -> q36Sql,
    "q37_stratified_sample" -> q37Sql,
    "q38_token_binning" -> q38Sql,
    "q39_shard_assignment" -> q39Sql,
    "q40_kmeans_step" -> q40Sql,
    "q41_json_extract" -> q41Sql,
    "q47_approx_aggs" -> q47Sql,
    "q48_pii_redaction" -> q48Sql,
    "q51_repetition_ratio" -> q51Sql,
    "q52_rplsh_neardup" -> q52Sql,
    "q53_sequence_packing" -> q53Sql,
    "q54_dedup_components" -> q54Sql,
    "q55_int8_quantization" -> q55Sql,
    "q56_user_rights_sort" -> q56Sql,
    "q57_decontamination" -> q57Sql,
    "q58_weighted_mix" -> q58Sql,
    "q59_boilerplate" -> q59Sql,
    "q60_simhash_neardup" -> q60Sql,
    "q61_asof_join" -> q61Sql,
    "q62_range_join" -> q62Sql,
    "q63_bloom_semi_join" -> q63Sql,
    "q69_asof_bucketed" -> q69Sql,
    "q70_ivf_neardup" -> q70Sql,
    "q71_asof_native" -> q71Sql,
    "q72_session_window" -> q72Sql,
    "q73_window_breadth" -> q73Sql,
    "q74_fuzzy_match" -> q74Sql,
    "q75_zorder" -> q75Sql,
    "q76_bpe_pairs" -> q76Sql,
    "q77_set_ops" -> q77Sql,
    "q78_chunking" -> q78Sql,
    "q79_url_canon" -> q79Sql,
    "q80_media_meta" -> q80Sql,
    "q81_pagerank" -> q81Sql,
    "q82_image_decode" -> q82Sql,
    "q83_bpe_encode" -> q83Sql,
    "q84_audio_decode" -> q84Sql,
    "q85_mp4_meta" -> q85Sql,
    "q86_pq_encode" -> q86Sql,
    "q87_pq_adc_topk" -> q87Sql,
    "q88_line_dedup" -> q88Sql,
    "q89_ivfpq_topk" -> q89Sql,
    "q90_gopher_rules" -> q90Sql,
    "q91_bigram_lm" -> q91Sql,
    "q92_ivfpq_residual" -> q92Sql,
    "q93_hash_embed" -> q93Sql,
    "q94_mjpeg_decode" -> q94Sql,
    "q95_dup_windows" -> q95Sql,
    "q96_tfidf_terms" -> q96Sql,
    "q97_dsir_resample" -> q97Sql,
    "q98_quality_classifier" -> q98Sql,
    "q99_c4_rules" -> q99Sql,
    "q100_mixture_plan" -> q100Sql,
    "q101_image_resize" -> q101Sql,
    "q102_audio_windows" -> q102Sql,
    "q103_image_ahash" -> q103Sql,
    "q104_image_neardup" -> q104Sql,
    "q105_bm25_topk" -> q105Sql,
    "q106_cms_heavy" -> q106Sql,
    "q107_hll_distinct" -> q107Sql,
    "q108_warc_parse" -> q108Sql,
    "q109_html_text" -> q109Sql,
    "q110_trigram_backoff" -> q110Sql,
    "q111_phrase_search" -> q111Sql,
    "q112_cluster_sample" -> q112Sql,
    "q113_zip_introspect" -> q113Sql,
    "q114_size_change" -> q114Sql,
    "q115_inventory_parse" -> q115Sql,
    "q116_crawl_ingest" -> q116Sql,
  )
}
