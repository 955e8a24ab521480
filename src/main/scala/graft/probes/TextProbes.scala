package graft.probes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curation, Dedup, Multimodal, Similarity, TextStats}
import ProbeShared._

/** Text-analysis probe family: language ID, quality scores, token
  * work, LM scoring (bigram, backoff), TF-IDF/BM25, DSIR, classifier,
  * C4/Gopher rules, mixture planning, BPE, PII, phrase search.
  *
  * Split from the former monolithic ExtProbes (3.1 kLoC); aggregated and
  * re-exported by [[ExtProbes]] — registry keys, probe bodies, and oracle
  * SQL unchanged.
  */
object TextProbes {
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

  // ---- q150 best-fit-decreasing packing ----------------------------------
  // Curation.packSequencesBestFit on the q53 item set (same shards, same
  // token counts, same budget — head-to-head with the greedy cut). The
  // oracle REPLAYS the fold with a recursive CTE carrying each shard's
  // bin residuals as a LIST (the q142 DP-array discipline): items
  // numbered by (toks DESC, doc_id ASC) per shard; per step the best bin
  // is the smallest residual >= toks (list_min over list_filter,
  // list_position = lowest index on ties), else a new bin opens.
  val q150: Q = (s, d) =>
    Curation.packSequencesBestFit(
        Tables.documents(s, d)
          .withColumn("toks", TextStats.wsTokenCount(col("text")).cast("long")),
        "doc_id", col("toks"), Curation.shardAssign(col("text")),
        budget = 256)
      .select("doc_id", "shard", "toks", "pack")
      .orderBy("doc_id")

  val q150Sql: String = {
    val best = "list_min(list_filter(r.bins, x -> x >= i.toks))"
    s"""WITH RECURSIVE t AS (
      |  SELECT doc_id,
      |    CAST(strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS INT) AS shard,
      |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
      |      ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS toks
      |  FROM documents),
      |it AS (
      |  SELECT doc_id, shard, toks,
      |    CAST(row_number() OVER (PARTITION BY shard
      |      ORDER BY toks DESC, doc_id ASC) AS BIGINT) AS rn
      |  FROM t),
      |rec AS (
      |  SELECT shard, CAST(0 AS BIGINT) AS rn, []::BIGINT[] AS bins,
      |    CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS toks,
      |    CAST(NULL AS BIGINT) AS pack
      |  FROM (SELECT DISTINCT shard FROM it)
      |  UNION ALL
      |  SELECT i.shard, i.rn,
      |    CASE WHEN $best IS NULL THEN list_append(r.bins, 256 - i.toks)
      |      ELSE list_transform(generate_series(1, len(r.bins)), j ->
      |        CASE WHEN j = list_position(r.bins, $best)
      |          THEN r.bins[j] - i.toks ELSE r.bins[j] END)
      |    END,
      |    i.doc_id, i.toks,
      |    CAST(CASE WHEN $best IS NULL THEN len(r.bins)
      |      ELSE list_position(r.bins, $best) - 1 END AS BIGINT)
      |  FROM rec r JOIN it i ON i.shard = r.shard AND i.rn = r.rn + 1)
      |SELECT doc_id, shard, toks, pack FROM rec WHERE rn >= 1
      |ORDER BY doc_id""".stripMargin
  }

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

  // ---- q148 BYTE-LEVEL BPE encode (GPT-2/LLaMA-family seeding) ------------
  // Bpe.encodeOneSeeded over byteSymbols (UTF-8 bytes as hex-pair
  // symbols — the 256-symbol no-OOV base alphabet) under the pinned
  // DemoByteMerges table (BpeSpec derives that table by hand and pins
  // trainLocal to it). Same full-fidelity output as q83: token count +
  // md5 over the complete symbol stream. The oracle seeds bytes with
  // hex(encode(w)) and replays the identical rank-order fold — the
  // constants interpolate from the SAME DemoByteMerges, the q83
  // discipline.
  val q148: Q = (s, d) => {
    import s.implicits._
    val table = graft.operators.Bpe.DemoByteMerges.toVector
    val ranks = table.zipWithIndex.map { case (m, i) => m -> i }.toMap
    graft.core.Ops.widen(Tables.documents(s, d))
      .select(col("doc_id"), Dedup.normalizeWords(col("text")).as("ws"))
      .as[(Long, Seq[String])]
      .map { case (id, ws) =>
        val toks = ws.map(w => graft.operators.Bpe.encodeOneSeeded(
          graft.operators.Bpe.byteSymbols(w), table, ranks))
        (id, toks.map(_.length.toLong).sum,
          toks.map(_.mkString("|")).mkString(" "))
      }
      .toDF("doc_id", "n_tokens", "enc")
      .select(col("doc_id"), col("n_tokens"), md5(col("enc")).as("enc_md5"))
      .orderBy("doc_id")
  }

  val q148Sql: String = {
    def stage(inner: String, a: String, b: String): String =
      s"""list_reduce(list_prepend('', string_split($inner, '|')),
         |      (acc, x) -> CASE
         |        WHEN acc = '$a' AND x = '$b' THEN '${a + b}'
         |        WHEN acc LIKE '%|$a' AND x = '$b'
         |          THEN substr(acc, 1, length(acc) - ${a.length}) || '${a + b}'
         |        WHEN acc = '' THEN x
         |        ELSE acc || '|' || x END)""".stripMargin
    // byte seed: normalizeWords output is ASCII, so each char is one
    // UTF-8 byte — hex pairs i*2-1..i*2 of hex(encode(w))
    val seed = "array_to_string(list_transform(" +
      "generate_series(1, length(w)), " +
      "i -> substring(lower(hex(encode(w))), i*2 - 1, 2)), '|')"
    val chained = graft.operators.Bpe.DemoByteMerges.foldLeft(seed) {
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

  // ---- q154 GPT-2 pretokenization (published contraction regex) ----------
  // Bpe.gpt2Pretokens over punctuation-enriched documents text: the
  // deterministic prefix/suffix/replace plants contractions ("It's",
  // "don't"), a digit run, commas, and a mixed alnum-punct word ("a-1")
  // so every non-whitespace alternative of the published pattern fires.
  // ORACLE EQUIVALENCE: the guard filter admits only single-spaced,
  // edge-trimmed docs and the enrichment preserves that shape, so the
  // two whitespace alternatives (`\s+(?!\S)` needs a run of >= 2, or a
  // trailing run) never match — DuckDB's RE2 (no lookahead support) can
  // then run the remaining alternatives verbatim and agree exactly.
  val q154: Q = (s, d) => {
    val e = graft.core.Ops.widen(Tables.documents(s, d))
      .filter(!col("text").rlike("\\s\\s|^\\s|\\s$"))
      .select(concat(lit("It's 42, "), expr("replace(text, ' a ', ' a-1 ')"),
        lit(" don't!")).as("t"))
    e.select(explode(graft.operators.Bpe.gpt2Pretokens(col("t"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy("tok")
  }

  val q154Sql: String =
    s"""WITH e AS (
       |  SELECT 'It''s 42, ' || replace(text, ' a ', ' a-1 ')
       |    || ' don''t!' AS t
       |  FROM documents
       |  WHERE NOT regexp_matches(text, '\\s\\s|^\\s|\\s$$')),
       |tk AS (SELECT unnest(regexp_extract_all(t,
       |  '''s|''t|''re|''ve|''m|''ll|''d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+'))
       |  AS tok FROM e)
       |SELECT tok, CAST(count(*) AS BIGINT) AS n
       |FROM tk GROUP BY tok ORDER BY tok""".stripMargin

  // ---- q162 corpus tokenization (GPT-2 pretokens → byte BPE → ids) -------
  // Bpe.encodeCorpusGpt2 end to end: the q154 guard/enrichment (single-
  // spaced docs so DuckDB's lookahead-free RE2 subset of the published
  // pattern is exact; the prefix/suffix plant contractions) feeds
  // GPT-2 pretokens into the distinct-word byte-BPE encode under the
  // pinned DemoByteMerges, symbols mapping to byteVocabIds (base 256 +
  // rank order). The oracle replays pretokens → the q148 rank-order
  // fold per word → the SAME symbol→id mapping (CASE generated from
  // DemoByteMerges; base symbols parse as hex) → flattened per-doc id
  // lists. Full fidelity: token count + md5 over the id stream.
  private def tokenIdCase(sym: String): String = {
    val cases = graft.operators.Bpe.DemoByteMerges.zipWithIndex
      .map { case ((a, b), r) => s"WHEN '${a + b}' THEN ${256 + r}" }
      .mkString(" ")
    s"""CAST(CASE $sym $cases
       |  ELSE (instr('0123456789abcdef', substring($sym, 1, 1)) - 1) * 16
       |    + instr('0123456789abcdef', substring($sym, 2, 1)) - 1
       |  END AS INTEGER)""".stripMargin
  }

  // the q162/q163 shared oracle prefix: guarded+enriched docs → GPT-2
  // pretokens (RE2-exact subset) → per-word fold → per-doc id lists
  private def corpusIdsCte: String = {
    def stage(inner: String, a: String, b: String): String =
      s"""list_reduce(list_prepend('', string_split($inner, '|')),
         |      (acc, x) -> CASE
         |        WHEN acc = '$a' AND x = '$b' THEN '${a + b}'
         |        WHEN acc LIKE '%|$a' AND x = '$b'
         |          THEN substr(acc, 1, length(acc) - ${a.length}) || '${a + b}'
         |        WHEN acc = '' THEN x
         |        ELSE acc || '|' || x END)""".stripMargin
    val seed = "array_to_string(list_transform(" +
      "generate_series(1, length(lower(hex(encode(w)))) // 2), " +
      "i -> substring(lower(hex(encode(w))), i*2 - 1, 2)), '|')"
    val chained = graft.operators.Bpe.DemoByteMerges.foldLeft(seed) {
      case (inner, (a, b)) => stage(inner, a, b)
    }
    s"""e AS (
       |  SELECT doc_id, 'It''s ' || text || ' don''t!' AS t
       |  FROM documents
       |  WHERE NOT regexp_matches(text, '\\s\\s|^\\s|\\s$$')),
       |tk AS (SELECT doc_id, regexp_extract_all(t,
       |  '''s|''t|''re|''ve|''m|''ll|''d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+')
       |  AS ws FROM e),
       |enc AS (SELECT doc_id, flatten(list_transform(ws,
       |  w -> list_transform(string_split($chained, '|'),
       |    s -> ${tokenIdCase("s")}))) AS ids
       |  FROM tk)""".stripMargin
  }

  private def q162Input(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.core.Ops.widen(Tables.documents(s, d))
      .filter(!col("text").rlike("\\s\\s|^\\s|\\s$"))
      .select(col("doc_id"),
        concat(lit("It's "), col("text"), lit(" don't!")).as("t"))

  val q162: Q = (s, d) => {
    graft.operators.Bpe.encodeCorpusGpt2(q162Input(s, d), "doc_id", "t",
        graft.operators.Bpe.DemoByteMerges)
      .select(col("doc_id"), col("n_tokens"),
        md5(concat_ws(" ", transform(col("ids"), x => x.cast("string"))))
          .as("ids_md5"))
      .orderBy("doc_id")
  }

  val q162Sql: String =
    s"""WITH ${corpusIdsCte}
       |SELECT doc_id, CAST(len(ids) AS BIGINT) AS n_tokens,
       |  md5(array_to_string(ids, ' ')) AS ids_md5
       |FROM enc ORDER BY doc_id""".stripMargin

  // ---- q163 token-id sequence packing (materialized training shards) -----
  // Curation.packTokenIds over q162's encoded corpus: docs in id order,
  // each terminated by the EOS id (262 = first free id after the base
  // 256 + 6 merges), the global stream cut into 512-id sequences. The
  // oracle replays the exclusive prefix sum over doc ids (window), the
  // positional explode (parallel unnest zip), and the per-sequence
  // ordered reassembly. Verifies the whole chain: offsets exact, no
  // token lost or reordered (md5 per sequence), doc attribution counts.
  val q163: Q = (s, d) => {
    val enc = graft.operators.Bpe.encodeCorpusGpt2(q162Input(s, d),
      "doc_id", "t", graft.operators.Bpe.DemoByteMerges)
    graft.operators.Curation.packTokenIds(enc, "doc_id", "ids",
        seqLen = 512, eosId = 262)
      .select(col("seq_id"), col("n_tokens"), col("n_docs"),
        md5(concat_ws(" ", transform(col("ids"), x => x.cast("string"))))
          .as("ids_md5"))
      .orderBy("seq_id")
  }

  val q163Sql: String =
    s"""WITH ${corpusIdsCte},
       |e2 AS (SELECT doc_id, list_append(ids, 262) AS ids FROM enc),
       |off AS (SELECT doc_id, ids,
       |  CAST(coalesce(sum(len(ids)) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS BIGINT) AS off
       |  FROM e2),
       |t AS (SELECT doc_id,
       |    off + unnest(generate_series(1, len(ids))) - 1 AS gpos,
       |    unnest(ids) AS tok
       |  FROM off)
       |SELECT CAST(gpos // 512 AS BIGINT) AS seq_id,
       |  CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  md5(array_to_string(list(tok ORDER BY gpos), ' ')) AS ids_md5
       |FROM t GROUP BY 1 ORDER BY seq_id""".stripMargin

  // ---- q171 doc-span attribution in packed sequences ----------------------
  // Curation.packTokenIdsWithSpans over q162's encoded corpus: the q163
  // packing plus a per-sequence (doc_id, start, len) attribution array —
  // the attention-boundary/provenance metadata shipped shards carry
  // (Shards.retract's serving side). The oracle recomputes each span as
  // the per-(sequence, doc) min global position and token count over the
  // q163 stream CTEs; spans exit as one ordered ':'-joined string per
  // sequence (arrays of structs don't hash portably across engines).
  val q171: Q = (s, d) => {
    val enc = graft.operators.Bpe.encodeCorpusGpt2(q162Input(s, d),
      "doc_id", "t", graft.operators.Bpe.DemoByteMerges)
    graft.operators.Curation.packTokenIdsWithSpans(enc, "doc_id", "ids",
        seqLen = 512, eosId = 262)
      .select(col("seq_id"), col("n_tokens"), col("n_docs"),
        md5(concat_ws(" ", transform(col("ids"), x => x.cast("string"))))
          .as("ids_md5"),
        concat_ws("|", transform(col("spans"), sp => concat_ws(":",
          sp.getField("doc_id").cast("string"),
          sp.getField("start").cast("string"),
          sp.getField("len").cast("string")))).as("spans_repr"))
      .orderBy("seq_id")
  }

  val q171Sql: String =
    s"""WITH ${corpusIdsCte},
       |e2 AS (SELECT doc_id, list_append(ids, 262) AS ids FROM enc),
       |off AS (SELECT doc_id, ids,
       |  CAST(coalesce(sum(len(ids)) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS BIGINT) AS off
       |  FROM e2),
       |t AS (SELECT doc_id,
       |    off + unnest(generate_series(1, len(ids))) - 1 AS gpos,
       |    unnest(ids) AS tok
       |  FROM off),
       |seg AS (SELECT CAST(gpos // 512 AS BIGINT) AS seq_id, doc_id,
       |    min(gpos) AS g0, count(*) AS slen
       |  FROM t GROUP BY 1, 2),
       |sp AS (SELECT seq_id,
       |    string_agg(doc_id || ':' || (g0 - seq_id * 512) || ':' || slen,
       |      '|' ORDER BY g0) AS spans_repr
       |  FROM seg GROUP BY seq_id)
       |SELECT s.seq_id, CAST(q.n_tokens AS BIGINT) AS n_tokens,
       |  CAST(q.n_docs AS BIGINT) AS n_docs, q.ids_md5, s.spans_repr
       |FROM sp s JOIN (
       |  SELECT CAST(gpos // 512 AS BIGINT) AS seq_id,
       |    count(*) AS n_tokens, count(DISTINCT doc_id) AS n_docs,
       |    md5(array_to_string(list(tok ORDER BY gpos), ' ')) AS ids_md5
       |  FROM t GROUP BY 1) q USING (seq_id)
       |ORDER BY seq_id""".stripMargin

  // ---- q172 epoch shuffle (deterministic training read order) ------------
  // Curation.epochShuffle: every epoch is a fresh md5-keyed global
  // permutation, readers take epoch_pos ≡ r (mod shards) in position
  // order. The probe runs TWO epochs and fingerprints each reader's
  // stream: n_seqs + sum_pos pin permutation totality (each reader gets
  // exactly its residue class), fp = Σ pos·(doc_id mod 1000003) pins the
  // ASSIGNMENT — any swapped pair of docs changes it. The oracle
  // recomputes the whole permutation via row_number over the same md5
  // key (the q58 md5-arithmetic convention).
  val q172: Q = (s, d) => {
    val docs = Tables.documents(s, d).select("doc_id")
    val both = graft.operators.Curation
      .epochShuffle(docs, col("doc_id"), 0, 8)
      .unionByName(graft.operators.Curation
        .epochShuffle(docs, col("doc_id"), 1, 8))
    both.groupBy("epoch", "read_shard")
      .agg(count(lit(1)).as("n_seqs"),
        sum(col("epoch_pos")).as("sum_pos"),
        sum(col("epoch_pos") * pmod(col("doc_id"), lit(1000003L)))
          .as("fp"))
      .orderBy("epoch", "read_shard")
  }

  val q172Sql: String =
    """WITH k AS (
      |  SELECT doc_id, e.epoch,
      |    md5('graft:' || e.epoch || ':' || CAST(doc_id AS VARCHAR)) AS ek
      |  FROM documents, (SELECT unnest([0, 1]) AS epoch) e),
      |r AS (
      |  SELECT epoch, doc_id,
      |    CAST(row_number() OVER (PARTITION BY epoch
      |      ORDER BY ek, CAST(doc_id AS VARCHAR)) - 1 AS BIGINT) AS pos
      |  FROM k)
      |SELECT CAST(epoch AS INTEGER) AS epoch,
      |  CAST(pos % 8 AS INTEGER) AS read_shard,
      |  CAST(count(*) AS BIGINT) AS n_seqs,
      |  CAST(sum(pos) AS BIGINT) AS sum_pos,
      |  CAST(sum(pos * (doc_id % 1000003)) AS BIGINT) AS fp
      |FROM r GROUP BY 1, 2 ORDER BY epoch, read_shard""".stripMargin

  // ---- q164 corpus detokenize (the round-trip identity) ------------------
  // Bpe.decodeCorpus(encodeCorpusGpt2(docs)) must reproduce every input
  // byte: byte-level BPE is lossless by construction (merges only
  // concatenate hex names; GPT-2 pretokens partition the text). The
  // strongest possible oracle shape: the ENGINE runs the full
  // distributed encode → id stream → broadcast-vocab decode chain,
  // while the oracle merely hashes the untouched input — any dropped
  // pretoken, mis-mapped id, or reassembly misorder breaks the hash.
  val q164: Q = (s, d) => {
    val in = q162Input(s, d)
    val enc = graft.operators.Bpe.encodeCorpusGpt2(in, "doc_id", "t",
      graft.operators.Bpe.DemoByteMerges)
    graft.operators.Bpe.decodeCorpus(enc, "doc_id", "ids",
        graft.operators.Bpe.DemoByteMerges, "t2")
      .select(col("doc_id"), md5(col("t2")).as("text_md5"))
      .orderBy("doc_id")
  }

  val q164Sql: String =
    s"""SELECT doc_id, md5('It''s ' || text || ' don''t!') AS text_md5
       |FROM documents
       |WHERE NOT regexp_matches(text, '\\s\\s|^\\s|\\s$$')
       |ORDER BY doc_id""".stripMargin

  // ---- q168 special-token round trip through padded training shards ------
  // The q164 identity extended to the FULL special-token discipline
  // (BOS/EOS/PAD reserved after the merge space, byteVocabIdsWithSpecials):
  // encode → wrap each doc [bos]+ids+[eos] → packTokenIdsPadded into
  // fixed 512-id sequences (pad-filled tail) → then the REVERSE chain
  // reconstructs every doc from the packed stream alone: explode with
  // global position, strip pads, attribute each token to its doc by the
  // running EOS count (per-seq exclusive prefix sum — the q163
  // machinery driven backwards, no single-partition window), strip
  // bos/eos, decode, hash. The oracle hashes the untouched input — any
  // pad misplacement, boundary drift, or special/byte id collision
  // breaks the hash.
  val q168: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val merges = graft.operators.Bpe.DemoByteMerges
    val specials = Seq("<|bos|>", "<|eos|>", "<|pad|>", "<|unk|>")
    val sid = graft.operators.Bpe.specialIds(merges, specials)
    val (bos, eos, pad) =
      (sid("<|bos|>"), sid("<|eos|>"), sid("<|pad|>"))
    val in = q162Input(s, d)
    val enc = graft.operators.Bpe.encodeCorpusGpt2(in, "doc_id", "t",
      merges)
    val packed = graft.operators.Curation.packTokenIdsPadded(enc,
      "doc_id", "ids", seqLen = 512, eosId = eos, padId = pad,
      bosId = Some(bos))
    // reverse: doc index of a token = number of EOS strictly before it
    val seqEos = packed.select(col("seq_id"), col("ids"))
      .withColumn("__ne",
        size(filter(col("ids"), t => t === eos)).cast("long"))
    val offs = graft.core.Ops.globalExclusivePrefixSum(seqEos,
      Seq(col("seq_id")), "__ne", "__eoff")
    val toks = offs
      .select(col("seq_id"), col("__eoff"),
        posexplode(col("ids")).as(Seq("__p", "__tok")))
      .withColumn("__ebefore", col("__eoff") + coalesce(
        sum(when(col("__tok") === eos, 1L).otherwise(0L)).over(
          Window.partitionBy("seq_id").orderBy("__p")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("__tok") =!= pad && col("__tok") =!= eos &&
        col("__tok") =!= bos)
      .withColumn("__gpos", col("seq_id") * 512 + col("__p"))
      .groupBy(col("__ebefore").as("__docidx"))
      .agg(transform(
        array_sort(collect_list(struct(col("__gpos"), col("__tok")))),
        x => x.getField("__tok").cast("int")).as("ids"))
    val docRanks = graft.core.Ops.globalRank(
      enc.select(col("doc_id")), Seq(col("doc_id")), "__drank")
      .select(col("doc_id"), (col("__drank") - 1).as("__docidx"))
    val rebuilt = docRanks.join(toks, Seq("__docidx"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("ids"),
          expr("CAST(array() AS array<int>)")).as("ids"))
    graft.operators.Bpe.decodeCorpusSpecials(rebuilt, "doc_id", "ids",
        merges, specials, "t2")
      .select(col("doc_id"), md5(col("t2")).as("text_md5"))
      .orderBy("doc_id")
  }

  val q168Sql: String = q164Sql

  // ---- q156 Gopher repetition-rule bundle ---------------------------------
  // TextStats.repetitionSignals over repetition-enriched documents text:
  // every doc gains a duplicated line, every 3rd a duplicated paragraph,
  // every 4th its own text doubled (dup n-grams + top-gram inflation) —
  // identically on both engines, so every rule fires on real rows. The
  // oracle recomputes all twelve fractions from the definitions (list
  // dedup for lines/paras, grouped gram counts with the (cnt desc, gram
  // asc) argmax, DISTINCT-position interval union for dup-gram
  // coverage) in exact fixed-point.
  val q156: Q = (s, d) => {
    val docs = Tables.documents(s, d).filter(col("doc_id") < 200)
      .select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 4 === 0, concat(lit(" "), col("text")))
          .otherwise(lit("")),
        lit("\ndup line\ndup line"),
        when(col("doc_id") % 3 === 0, lit("\n\npara\n\npara"))
          .otherwise(lit(""))).as("text"))
    graft.operators.TextStats.repetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id")
  }

  val q156Sql: String = {
    def frac(num: String, den: String) =
      s"CASE WHEN $den > 0 THEN CAST(floor(($num) * 1.0 / ($den) * 10000 + 0.5) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    def sumlen(l: String) =
      s"CAST(coalesce(list_sum(list_transform($l, x -> length(x))), 0) AS BIGINT)"
    val topNs = Seq(2, 3, 4); val dupNs = Seq(5, 6, 7, 8, 9, 10)
    val topCols = topNs.map(nn =>
      s"${frac(s"coalesce(tp.t$nn, 0)", "b.tchars")} AS top${nn}_gram_frac_e4")
    val dupCols = dupNs.map(nn =>
      s"${frac(s"coalesce(cv.c$nn, 0)", "b.tchars")} AS dup${nn}_gram_frac_e4")
    val passTop = topNs.zip(Seq(2000, 1800, 1600)).map { case (nn, th) =>
      s"${frac(s"coalesce(tp.t$nn, 0)", "b.tchars")} <= $th" }
    val passDup = dupNs.zip(Seq(1500, 1400, 1300, 1200, 1100, 1000))
      .map { case (nn, th) =>
        s"${frac(s"coalesce(cv.c$nn, 0)", "b.tchars")} <= $th" }
    s"""WITH d0 AS (
       |  SELECT doc_id, text
       |    || (CASE WHEN doc_id % 4 = 0 THEN ' ' || text ELSE '' END)
       |    || chr(10) || 'dup line' || chr(10) || 'dup line'
       |    || (CASE WHEN doc_id % 3 = 0 THEN chr(10) || chr(10) || 'para'
       |        || chr(10) || chr(10) || 'para' ELSE '' END) AS text
       |  FROM documents WHERE doc_id < 200),
       |n AS (SELECT doc_id, text, $duckWords AS ws FROM d0),
       |b AS (SELECT doc_id, ${sumlen("ws")} AS tchars,
       |    list_filter(list_transform(string_split(text, chr(10)),
       |      x -> trim(x)), x -> x <> '') AS lines,
       |    list_filter(list_transform(
       |      string_split(text, chr(10) || chr(10)),
       |      x -> trim(x)), x -> x <> '') AS paras
       |  FROM n),
       |g AS (
       |  SELECT doc_id, nn.n AS n, t.i AS pos,
       |    array_to_string(list_slice(ws, t.i, t.i + nn.n - 1), ' ') AS gram
       |  FROM n, unnest([2, 3, 4, 5, 6, 7, 8, 9, 10]) nn(n),
       |    unnest(generate_series(1, len(ws) - nn.n + 1)) t(i)
       |  WHERE len(ws) >= nn.n),
       |c AS (SELECT doc_id, n, gram, count(*) AS cnt
       |  FROM g GROUP BY 1, 2, 3),
       |top1 AS (
       |  SELECT doc_id, n, CAST(cnt * (length(gram) - (n - 1)) AS BIGINT)
       |    AS topchars
       |  FROM (SELECT doc_id, n, gram, cnt,
       |      row_number() OVER (PARTITION BY doc_id, n
       |        ORDER BY cnt DESC, gram ASC) AS r
       |    FROM c WHERE n IN (2, 3, 4)) WHERE r = 1),
       |tp AS (SELECT doc_id,
       |    ${topNs.map(nn =>
               s"max(CASE WHEN n = $nn THEN topchars END) AS t$nn")
              .mkString(", ")}
       |  FROM top1 GROUP BY 1),
       |cp AS (SELECT DISTINCT g.doc_id, g.n, g.pos + o.off - 1 AS wp
       |  FROM g JOIN c ON c.doc_id = g.doc_id AND c.n = g.n
       |    AND c.gram = g.gram,
       |    unnest(generate_series(1, g.n)) o(off)
       |  WHERE c.cnt >= 2 AND g.n IN (5, 6, 7, 8, 9, 10)),
       |wl AS (SELECT doc_id, t.i AS wp, length(ws[t.i]) AS wl
       |  FROM n, unnest(generate_series(1, len(ws))) t(i)),
       |cov AS (SELECT cp.doc_id, cp.n, CAST(sum(wl.wl) AS BIGINT)
       |    AS dupchars
       |  FROM cp JOIN wl ON wl.doc_id = cp.doc_id AND wl.wp = cp.wp
       |  GROUP BY 1, 2),
       |cv AS (SELECT doc_id,
       |    ${dupNs.map(nn =>
               s"max(CASE WHEN n = $nn THEN dupchars END) AS c$nn")
              .mkString(", ")}
       |  FROM cov GROUP BY 1)
       |SELECT b.doc_id,
       |  ${frac("len(b.lines) - len(list_distinct(b.lines))",
                "len(b.lines)")} AS dup_line_frac_e4,
       |  ${frac(s"${sumlen("b.lines")} - ${sumlen("list_distinct(b.lines)")}",
                sumlen("b.lines"))} AS dup_line_char_frac_e4,
       |  ${frac("len(b.paras) - len(list_distinct(b.paras))",
                "len(b.paras)")} AS dup_para_frac_e4,
       |  ${frac(s"${sumlen("b.paras")} - ${sumlen("list_distinct(b.paras)")}",
                sumlen("b.paras"))} AS dup_para_char_frac_e4,
       |  ${(topCols ++ dupCols).mkString(",\n  ")},
       |  (${frac("len(b.lines) - len(list_distinct(b.lines))",
                 "len(b.lines)")} <= 3000
       |    AND ${frac("len(b.paras) - len(list_distinct(b.paras))",
                 "len(b.paras)")} <= 3000
       |    AND ${frac(
                 s"${sumlen("b.lines")} - ${sumlen("list_distinct(b.lines)")}",
                 sumlen("b.lines"))} <= 2000
       |    AND ${frac(
                 s"${sumlen("b.paras")} - ${sumlen("list_distinct(b.paras)")}",
                 sumlen("b.paras"))} <= 2000
       |    AND ${(passTop ++ passDup).mkString("\n    AND ")}) AS rep_pass
       |FROM b
       |LEFT JOIN tp ON tp.doc_id = b.doc_id
       |LEFT JOIN cv ON cv.doc_id = b.doc_id
       |ORDER BY b.doc_id""".stripMargin
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

  // ---- q127 BM25 against a persisted postings index ----------------------
  // The retrieval member of the index-reuse family: the corpus explodes
  // once at build time, every query batch joins stored postings
  // (TextStats.writeBm25Index scaladoc). Numerically identical to q105's
  // per-call form — the oracle IS q105's oracle; only the engine path
  // changes (build index → query index).
  val q127: Q = (s, d) => {
    val docs = graft.core.Ops.widen(Tables.documents(s, d))
      .select("doc_id", "text")
    val dir = scratchDir("graft_q127_idx")
    graft.operators.TextStats.writeBm25Index(docs, "doc_id", "text", dir)
    val queries = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("qid"),
        explode(slice(Dedup.normalizeWords(col("text")), 1, 3)).as("term"))
    graft.operators.TextStats
      .bm25AgainstIndex(s, dir, queries, "qid", "term", k = 5)
      .withColumnRenamed("id", "doc_id")
      .orderBy("qid", "rnk")
  }

  val q127Sql: String = q105Sql

  // ---- q128 hybrid retrieval: RRF over BM25 + ANN cosine ------------------
  // Reciprocal-rank fusion (Fusion.rrfFuse scaladoc): the same %97 query
  // ids drive a lexical (BM25 over documents) and a dense (cosine over
  // embeddings, vec_id ≡ doc_id in the testdata) top-10, fused by
  // e6-rounded 1/(60+rank) contributions. The oracle replays both
  // retrieval chains (q105's and q23's shapes) and the fusion arithmetic.
  val q128: Q = (s, d) => {
    val docs = graft.core.Ops.widen(Tables.documents(s, d))
      .select("doc_id", "text")
    val queries = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("qid"),
        explode(slice(Dedup.normalizeWords(col("text")), 1, 3)).as("term"))
    val bm25 = TextStats.bm25TopK(docs, "doc_id", "text",
        queries, "qid", "term", k = 10)
      .select(col("qid"), col("doc_id"), col("rnk"))
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    val ann = Similarity.bruteForceTopK(e, e.filter(col("id") % 97 === 0), 10)
      .select(col("vec_id").as("qid"), col("other_id").as("doc_id"),
        col("rank").as("rnk"))
    graft.operators.Fusion.rrfFuse(Seq(bm25, ann), "qid", "doc_id", "rnk",
        k0 = 60, topK = 5)
      .orderBy("qid", "rnk")
  }

  val q128Sql: String =
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
       |br AS (SELECT qid, doc_id, CAST(row_number() OVER (
       |    PARTITION BY qid ORDER BY score_e6 DESC, doc_id) AS BIGINT)
       |    AS rnk FROM sc),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |p AS (SELECT a.vec_id AS qid, b.vec_id AS doc_id,
       |    CAST(floor(list_dot_product(a.v, b.v) /
       |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
       |      * 10000 + 0.5) AS BIGINT) AS score_e4
       |  FROM e a JOIN e b ON a.vec_id % 97 = 0 AND a.vec_id <> b.vec_id),
       |ar AS (SELECT qid, doc_id, CAST(row_number() OVER (
       |    PARTITION BY qid ORDER BY score_e4 DESC, doc_id ASC) AS BIGINT)
       |    AS rnk FROM p),
       |u AS (SELECT qid, doc_id,
       |    CAST(floor(1000000.0 / (60 + rnk) + 0.5) AS BIGINT) AS c_e6
       |  FROM br WHERE rnk <= 10
       |  UNION ALL
       |  SELECT qid, doc_id,
       |    CAST(floor(1000000.0 / (60 + rnk) + 0.5) AS BIGINT) AS c_e6
       |  FROM ar WHERE rnk <= 10),
       |f AS (SELECT qid, doc_id, CAST(sum(c_e6) AS BIGINT) AS rrf_e6
       |  FROM u GROUP BY qid, doc_id),
       |fr AS (SELECT qid, doc_id, rrf_e6, CAST(row_number() OVER (
       |    PARTITION BY qid ORDER BY rrf_e6 DESC, doc_id ASC) AS BIGINT)
       |    AS rnk FROM f)
       |SELECT qid, doc_id, rrf_e6, rnk FROM fr WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin

  // ---- q129 WordPiece train + greedy longest-match encode -----------------
  // The second tokenizer family beside BPE (Subword scaladoc): top-200
  // substring vocabulary by (weighted freq, piece), then the BERT-style
  // greedy longest-match fold with char fallback. The oracle replays the
  // training CTEs and the EXACT segmentation as a recursive CTE with a
  // longest-piece LATERAL probe — same 32-step cap, so parity is
  // structural for arbitrarily long words.
  val q129: Q = (s, d) => {
    val docs = graft.core.Ops.widen(Tables.documents(s, d))
      .select("doc_id", "text")
    val vocab = graft.operators.Subword.trainWordPiece(
      graft.operators.Bpe.wordFreqs(docs, "text"), vocabSize = 200)
    val model = graft.operators.Subword.collectWpModel(vocab)
    graft.operators.Subword.wordPieceEncode(docs, "doc_id", "text", model)
      .orderBy("doc_id")
  }

  val q129Sql: String =
    s"""WITH RECURSIVE n AS (SELECT doc_id, $duckWords AS w FROM documents),
       |wf AS (SELECT wrd AS w, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(w) AS wrd FROM n) GROUP BY 1),
       |sub AS (SELECT substr(w, p, l) AS piece, freq
       |  FROM wf, unnest(generate_series(2, 8)) t(l),
       |       unnest(generate_series(1, length(w) - l + 1)) s(p)
       |  WHERE length(w) >= l),
       |sc AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS wfreq
       |  FROM sub GROUP BY 1),
       |voc AS (SELECT piece FROM sc ORDER BY wfreq DESC, piece ASC
       |  LIMIT 200),
       |dw AS (SELECT doc_id, i AS widx, w[i] AS wrd
       |  FROM n, unnest(generate_series(1, len(w))) t(i)),
       |seg AS (
       |  SELECT doc_id, widx, wrd, 1 AS pos, 0 AS np,
       |    CAST(NULL AS VARCHAR) AS piece
       |  FROM dw
       |  UNION ALL
       |  SELECT s.doc_id, s.widx, s.wrd, s.pos + coalesce(m.l, 1),
       |    s.np + 1, coalesce(m.p, substr(s.wrd, s.pos, 1))
       |  FROM seg s LEFT JOIN LATERAL (
       |    SELECT piece AS p, length(piece) AS l FROM voc
       |    WHERE piece = substr(s.wrd, s.pos, length(piece))
       |    ORDER BY length(piece) DESC LIMIT 1) m ON true
       |  WHERE s.pos <= length(s.wrd) AND s.np < 32),
       |pieces AS (SELECT doc_id, widx, np, piece FROM seg
       |  WHERE piece IS NOT NULL),
       |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pieces,
       |    string_agg(piece, '|' ORDER BY widx, np) AS enc
       |  FROM pieces GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(a.n_pieces, 0) AS n_pieces,
       |  coalesce(a.enc, '') AS enc
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

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

  // ---- q117 DoReMi learned mixture weights -------------------------------
  // The learning step ABOVE q100's executor: Group-DRO multiplicative
  // reweighting over the lang domains with the count-based bigram LM as
  // proxy/reference (TextStats.doremiMixtureWeights scaladoc). The oracle
  // unrolls the same T=3 steps as a CTE chain — per-domain e6
  // distributions, exact-integer mixture model counts, e6-rounded log
  // costs, and the identical floor(x+0.5) update arithmetic — so the
  // learned weights match hash-exact, like q98's unrolled GD.
  val q117: Q = (s, d) =>
    graft.operators.TextStats.doremiMixtureWeights(
        Tables.documents(s, d).select(col("lang"), col("text")),
        "lang", "text", vocabSize = 1000L, steps = 3, etaE4 = 10000L,
        smoothE4 = 1000L)
      .orderBy("domain")

  val q117Sql: String = {
    val steps = 3
    // cost of a gram under model counts `cm` with context mass `ctx`:
    // α = 1e6, V·α = 1e9 (vocabSize 1000) — rounded to e6 per gram
    def cost(cm: String, ctx: String): String =
      s"CAST(floor(-ln(($cm + 1000000.0) / ($ctx + 1000000000.0)) * 1000000 + 0.5) AS BIGINT)"
    // per-domain mean of c-weighted gram costs, e4
    def meanE4(sumExpr: String): String =
      s"CAST(floor($sumExpr / (sum(g.c) * 100.0) + 0.5) AS BIGINT)"
    val stepCtes = (1 to steps).map { t =>
      val p = if (t == 1) "w0" else s"w${t - 1}"
      s"""m$t AS (SELECT s.gram, CAST(sum(p.w * s.p_e6) AS BIGINT) AS cm
         |  FROM scaled s JOIN $p p USING (dom) GROUP BY 1),
         |c$t AS (SELECT string_split(gram, ' ')[1] AS w1,
         |    CAST(sum(cm) AS BIGINT) AS ctx FROM m$t GROUP BY 1),
         |l$t AS (SELECT g.dom,
         |    ${meanE4(s"sum(g.c * ${cost("m.cm", "x.ctx")})")} AS lx
         |  FROM dgc g JOIN m$t m USING (gram)
         |  JOIN c$t x ON x.w1 = string_split(g.gram, ' ')[1]
         |  GROUP BY g.dom),
         |u$t AS (SELECT l.dom, p.w *
         |    CAST(floor(exp(10000 * greatest(l.lx - r.ref_e4, 0) / 100000000.0)
         |      * 1000000 + 0.5) AS BIGINT) AS u
         |  FROM l$t l JOIN refloss r USING (dom) JOIN $p p USING (dom)),
         |w$t AS (SELECT u.dom,
         |    CAST(floor((9000 * CAST(floor(u.u * 10000.0 /
         |      (SELECT CAST(sum(u) AS BIGINT) FROM u$t) + 0.5) AS BIGINT)
         |      + 1000 * c.unif) / 10000.0 + 0.5) AS BIGINT) AS w
         |  FROM u$t u, cfg c)""".stripMargin
    }.mkString(",\n")
    val avg = (1 to steps).map(t => s"w$t.w").mkString(" + ")
    val joins = (1 to steps).map(t => s"JOIN w$t USING (dom)").mkString(" ")
    s"""WITH n AS (SELECT lang AS dom, $duckWords AS w FROM documents),
       |bg AS (SELECT dom, w[i] || ' ' || w[i + 1] AS gram
       |  FROM n, unnest(generate_series(1, len(w) - 1)) t(i)
       |  WHERE len(w) >= 2),
       |dgc AS (SELECT dom, gram, CAST(count(*) AS BIGINT) AS c
       |  FROM bg GROUP BY 1, 2),
       |nd AS (SELECT dom, CAST(sum(c) AS BIGINT) AS n FROM dgc GROUP BY 1),
       |cfg AS (SELECT CAST(floor(10000.0 / count(*) + 0.5) AS BIGINT) AS unif
       |  FROM nd),
       |scaled AS (SELECT g.dom, g.gram,
       |    CAST(floor(g.c * 1000000.0 / d.n + 0.5) AS BIGINT) AS p_e6
       |  FROM dgc g JOIN nd d USING (dom)),
       |selfctx AS (SELECT dom, string_split(gram, ' ')[1] AS w1,
       |    CAST(sum(p_e6 * 10000) AS BIGINT) AS ctx FROM scaled GROUP BY 1, 2),
       |refloss AS (SELECT g.dom,
       |    ${meanE4(s"sum(g.c * ${cost("s.p_e6 * 10000", "x.ctx")})")} AS ref_e4
       |  FROM dgc g JOIN scaled s USING (dom, gram)
       |  JOIN selfctx x ON x.dom = g.dom AND x.w1 = string_split(g.gram, ' ')[1]
       |  GROUP BY g.dom),
       |w0 AS (SELECT d.dom, c.unif AS w FROM nd d, cfg c),
       |$stepCtes
       |SELECT r.dom AS domain, d.n AS n_bigrams, r.ref_e4 AS ref_xent_e4,
       |  l$steps.lx AS mix_xent_e4,
       |  CAST(floor(($avg) / $steps.0 + 0.5) AS BIGINT) AS weight_e4
       |FROM refloss r JOIN nd d USING (dom) JOIN l$steps USING (dom) $joins
       |ORDER BY domain""".stripMargin
  }

  // ---- q118 Kneser–Ney bigram LM -----------------------------------------
  // The smoothing the CCNet/KenLM perplexity filter actually ships
  // (TextStats.knCrossEntropy scaladoc): absolute discounting + smoothed
  // continuation probability over left-neighbor type counts. Self-train
  // shape (one corpus explode, model = the same grams); per-bigram costs
  // e6-rounded before the doc sum, so the ln() compare is exact.

  /** KN scoring CTE chain over a bigram source CTE `bg(doc_id, gram)` and
    * a model-gram source `mbg(gram)` (the rows the model counts): emits
    * `agg(doc_id, n_bigrams, kn_e4)`. Shared by q118 (self-train) and
    * q119 (slice-trained cross-model — exercises the unseen-w1/w2 paths
    * self-train never hits). Mirrors scoreKnBigrams term for term.
    */
  private def knDuckAgg(scoreOut: String): String =
    s"""grams AS (SELECT gram, count(*) AS c FROM mbg GROUP BY gram),
       |g2 AS (SELECT gram, c, string_split(gram, ' ')[1] AS w1,
       |    string_split(gram, ' ')[2] AS w2 FROM grams),
       |ctx AS (SELECT w1, CAST(sum(c) AS BIGINT) AS ctx, count(*) AS n1r
       |  FROM g2 GROUP BY w1),
       |cont AS (SELECT w2, count(*) AS n1l FROM g2 GROUP BY w2),
       |tt AS (SELECT count(*) AS t FROM grams),
       |sc AS (SELECT b.doc_id,
       |    CAST(floor(-ln(CASE WHEN x.ctx IS NULL
       |        THEN (coalesce(l.n1l, 0) + 1.0) / (tt.t + 1000.0)
       |        ELSE (greatest(coalesce(g.c, 0) - 0.75, 0.0)
       |          + 0.75 * x.n1r * ((coalesce(l.n1l, 0) + 1.0) / (tt.t + 1000.0)))
       |          / x.ctx END) * 1000000 + 0.5) AS BIGINT) AS le6
       |  FROM bg b
       |  LEFT JOIN grams g USING (gram)
       |  LEFT JOIN ctx x ON x.w1 = string_split(b.gram, ' ')[1]
       |  LEFT JOIN cont l ON l.w2 = string_split(b.gram, ' ')[2]
       |  CROSS JOIN tt),
       |$scoreOut AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(floor(sum(le6) / (count(*) * 100.0) + 0.5) AS BIGINT) AS kn_e4
       |  FROM sc GROUP BY doc_id)""".stripMargin

  val q118: Q = (s, d) =>
    graft.operators.TextStats.selfKnCrossEntropy(
        Tables.documents(s, d).select("doc_id", "text"),
        "doc_id", "text", vocabSize = 1000L)
      .orderBy("doc_id")

  val q118Sql: String =
    s"""WITH n AS (SELECT doc_id, $duckWords AS w FROM documents),
       |bg AS (SELECT doc_id, w[i] || ' ' || w[i + 1] AS gram
       |  FROM n, unnest(generate_series(1, len(w) - 1)) t(i)
       |  WHERE len(w) >= 2),
       |mbg AS (SELECT gram FROM bg),
       |${knDuckAgg("agg")}
       |SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
       |  coalesce(a.kn_e4, 0) AS kn_e4
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  // ---- q119 CCNet perplexity buckets -------------------------------------
  // Wenzek et al. 2020: score the pool under a KN LM trained on the
  // lang='en' slice (cross-model — the unseen-gram/context/continuation
  // smoothing paths all fire), then label head/middle/tail by each
  // language's tercile split. Thresholds mirror Ops.exactPercentiles'
  // weighted-sum interpolation EXACTLY (v_lo·(hi−pos) + v_hi·(pos−lo)) —
  // quantile_cont's algebraically-equal lo+f·(hi−lo) form can drift an
  // ulp and flip a boundary doc's bucket.
  val q119: Q = (s, d) => {
    val docs = graft.core.Ops.widen(Tables.documents(s, d))
      .select("doc_id", "text", "lang")
    val grams = graft.operators.TextStats.bigramCounts(
        docs.filter(col("lang") === "en"), "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val t = grams.count() // bounded: model metadata, vocabulary-sized table
    val scored = graft.operators.TextStats.knCrossEntropy(
      docs, "doc_id", "text", grams, vocabSize = 1000L, bigramTypes = t)
    graft.operators.Curation.perplexityBuckets(
        scored.join(docs.select("doc_id", "lang"), Seq("doc_id")),
        "lang", "kn_e4")
      .select("doc_id", "lang", "n_bigrams", "kn_e4", "bucket")
      .orderBy("doc_id")
  }

  val q119Sql: String =
    s"""WITH n AS (SELECT doc_id, lang, $duckWords AS w FROM documents),
       |bg AS (SELECT doc_id, w[i] || ' ' || w[i + 1] AS gram
       |  FROM n, unnest(generate_series(1, len(w) - 1)) t(i)
       |  WHERE len(w) >= 2),
       |mbg AS (SELECT b.gram FROM bg b JOIN n USING (doc_id)
       |  WHERE n.lang = 'en'),
       |${knDuckAgg("agg")},
       |wl AS (SELECT d.doc_id, d.lang, coalesce(a.n_bigrams, 0) AS n_bigrams,
       |    coalesce(a.kn_e4, 0) AS kn_e4
       |  FROM documents d LEFT JOIN agg a USING (doc_id)),
       |r AS (SELECT lang, kn_e4,
       |    row_number() OVER (PARTITION BY lang ORDER BY kn_e4) - 1 AS rk
       |  FROM wl),
       |gn AS (SELECT lang, count(*) AS n FROM wl GROUP BY lang),
       |ps AS (SELECT lang, p, (n - 1) * p AS pos
       |  FROM gn, (SELECT unnest([1.0/3.0, 2.0/3.0]) AS p) pp),
       |th0 AS (SELECT ps.lang, ps.p, sum(r.kn_e4 * CASE
       |      WHEN CAST(floor(ps.pos) AS BIGINT) = CAST(ceil(ps.pos) AS BIGINT)
       |        THEN 1.0
       |      WHEN r.rk = CAST(floor(ps.pos) AS BIGINT) THEN ceil(ps.pos) - ps.pos
       |      ELSE ps.pos - floor(ps.pos) END) AS t
       |  FROM ps JOIN r ON r.lang = ps.lang
       |    AND r.rk IN (CAST(floor(ps.pos) AS BIGINT), CAST(ceil(ps.pos) AS BIGINT))
       |  GROUP BY 1, 2),
       |th AS (SELECT lang, min(CASE WHEN p = 1.0/3.0 THEN t END) AS t1,
       |    min(CASE WHEN p = 2.0/3.0 THEN t END) AS t2
       |  FROM th0 GROUP BY lang)
       |SELECT wl.doc_id, wl.lang, wl.n_bigrams, wl.kn_e4,
       |  CASE WHEN wl.kn_e4 <= th.t1 THEN 'head'
       |       WHEN wl.kn_e4 <= th.t2 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM wl JOIN th USING (lang)
       |ORDER BY wl.doc_id""".stripMargin

  // ---- q123 quality-signals attributes table -----------------------------
  // The Dolma/RedPajama-v2 "attributes file" shape: every stateless
  // signal in one scan (TextStats.qualitySignals scaladoc). The oracle
  // assembles the already-proven per-signal mirrors (q32 lang, q33
  // quality, q90 gopher, q99 c4, q34 tokens, q51 repetition, q48 pii)
  // over the RAW documents text and joins them per doc — one engine scan
  // vs seven oracle CTE families, same 18 columns.
  val q123: Q = (s, d) =>
    graft.operators.TextStats.qualitySignals(
        Tables.documents(s, d).select("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id")

  val q123Sql: String = {
    def fracE4(num: String, den: String) =
      s"CASE WHEN $den > 0 THEN CAST(floor(($num) * 1.0 / ($den) * 10000 + 0.5) AS BIGINT) ELSE 0 END"
    val scores = graft.operators.TextStats.LangProfiles.map {
      case (name, markers) =>
        val in = markers.map(m => s"'$m'").mkString(", ")
        s"CAST(len(list_filter(w, x -> x IN ($in))) AS BIGINT) AS s_$name"
    }.mkString(",\n    ")
    val stopIn = graft.operators.TextStats.StopWords
      .map(w => s"'$w'").mkString(", ")
    val email = graft.operators.TextStats.EmailRegex
    val url = graft.operators.TextStats.UrlRegex
    val phone = graft.operators.TextStats.PhoneRegex
    s"""WITH n AS (SELECT doc_id, text, $duckWords AS w FROM documents),
       |sc AS (SELECT doc_id,
       |    $scores
       |  FROM n),
       |lang AS (SELECT doc_id,
       |    ${graft.operators.TextStats.langPredictDuckSql} AS lang_pred
       |  FROM sc),
       |q AS (SELECT doc_id, CAST(floor((0.5 * least(1.0, len(w) / 50.0) +
       |    0.3 * (1.0 - (length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))) * 1.0 / greatest(length(text), 1)) +
       |    0.2 * (len(list_filter(w, x -> x IN ($stopIn))) * 1.0 / greatest(len(w), 1))) * 10000 + 0.5) AS BIGINT) AS quality_e4
       |  FROM n),
       |gt AS (SELECT doc_id, text,
       |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       |      ELSE string_split_regex(trim(text), '\\s+') END AS toks,
       |    string_split(text, chr(10)) AS lines, w
       |  FROM n),
       |gm AS (SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n,
       |    CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT) AS sumlen,
       |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
       |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
       |      + CAST(len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT) AS n_sym,
       |    CAST(len(lines) AS BIGINT) AS nl,
       |    CAST(len(list_filter(lines, l -> starts_with(l, '- ')
       |      OR starts_with(l, '* ') OR starts_with(l, '•'))) AS BIGINT) AS n_bullet,
       |    CAST(len(list_filter(lines, l -> ends_with(l, '...'))) AS BIGINT) AS n_ell,
       |    CAST(len(list_filter(w, x -> x IN ($stopIn))) AS BIGINT) AS stop_hits
       |  FROM gt),
       |g AS (SELECT doc_id, n AS n_words,
       |    ${fracE4("sumlen", "n")} AS mean_len_e4,
       |    ${fracE4("n_alpha", "n")} AS alpha_frac_e4,
       |    ${fracE4("n_sym", "n")} AS symbol_ratio_e4,
       |    ${fracE4("n_bullet", "nl")} AS bullet_frac_e4,
       |    ${fracE4("n_ell", "nl")} AS ellipsis_frac_e4,
       |    stop_hits, nl AS n_lines
       |  FROM gm),
       |gp AS (SELECT *, (n_words BETWEEN 50 AND 100000
       |    AND mean_len_e4 BETWEEN 30000 AND 100000
       |    AND symbol_ratio_e4 <= 1000 AND bullet_frac_e4 <= 9000
       |    AND ellipsis_frac_e4 <= 3000 AND alpha_frac_e4 >= 8000
       |    AND stop_hits >= 2) AS gopher_pass FROM g),
       |ck AS (SELECT doc_id, text,
       |    list_filter(string_split(text, chr(10)), l ->
       |      right(rtrim(l), 1) IN ('.', '!', '?', '"')
       |      AND len(list_filter(string_split_regex(trim(l), ' +'),
       |        x -> x <> '')) >= 5
       |      AND NOT contains(lower(l), 'javascript')) AS kept
       |  FROM n),
       |cc AS (SELECT doc_id, text,
       |    coalesce(array_to_string(kept, chr(10)), '') AS cleaned FROM ck),
       |c4 AS (SELECT doc_id,
       |    CAST(length(cleaned) - length(
       |      regexp_replace(cleaned, '[.!?]', '', 'g')) AS BIGINT) AS c4_sentences,
       |    ((length(cleaned) - length(regexp_replace(cleaned, '[.!?]', '', 'g'))) >= 3
       |      AND NOT contains(lower(text), 'lorem ipsum')
       |      AND NOT contains(text, '{')) AS c4_keep
       |  FROM cc),
       |tok AS (SELECT doc_id,
       |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |      ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ws_toks,
       |    CAST(len(regexp_extract_all(text, '${graft.operators.TextStats.BpeTokenRegex}', 0)) AS BIGINT) AS bpe_toks
       |  FROM n),
       |shl AS (SELECT doc_id,
       |  CASE WHEN len(w) >= 3 THEN list_transform(generate_series(1, len(w)-2),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) ELSE []::VARCHAR[] END AS sh
       |  FROM n),
       |rep AS (SELECT doc_id,
       |  CASE WHEN len(sh) = 0 THEN CAST(0 AS BIGINT)
       |       ELSE CAST(floor((1.0 - len(list_distinct(sh)) * 1.0 / len(sh))
       |            * 10000 + 0.5) AS BIGINT) END AS rep_e4
       |  FROM shl),
       |pii AS (SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$email', 0)) +
       |       len(regexp_extract_all(text, '$url', 0)) +
       |       len(regexp_extract_all(text, '$phone', 0)) AS BIGINT) AS pii_hits
       |  FROM n)
       |SELECT n.doc_id, lang.lang_pred, q.quality_e4,
       |  gp.n_words, gp.mean_len_e4, gp.alpha_frac_e4, gp.symbol_ratio_e4,
       |  gp.bullet_frac_e4, gp.ellipsis_frac_e4, gp.stop_hits,
       |  gp.gopher_pass, c4.c4_keep, c4.c4_sentences,
       |  tok.ws_toks, tok.bpe_toks, rep.rep_e4, pii.pii_hits, gp.n_lines
       |FROM n JOIN lang USING (doc_id) JOIN q USING (doc_id)
       |  JOIN gp USING (doc_id) JOIN c4 USING (doc_id)
       |  JOIN tok USING (doc_id) JOIN rep USING (doc_id)
       |  JOIN pii USING (doc_id)
       |ORDER BY n.doc_id""".stripMargin
  }

  // ---- family registry --------------------------------------------------

  // ---- q134 external-ARPA perplexity (CCNet reference-model serving) -----
  // TextStats.parseArpa loads a LITERAL KenLM-format bigram backoff model
  // (listed bigrams over the corpus's head vocabulary, unigram backoffs,
  // an <unk> mass) and arpaCrossEntropy scores every document under it —
  // the CCNet deployment where the filter model is a FILE, not
  // self-trained. The oracle re-states the same literal model as VALUES
  // tables and replays the Katz chain (listed-bigram / backoff / unknown)
  // with the identical e6-round-before-sum fixed-point discipline.
  private val q134Arpa =
    """\data\
      |ngram 1=6
      |ngram 2=4
      |
      |\1-grams:
      |-0.9 join -0.30103
      |-1.0 hash -0.2
      |-1.1 row -0.25
      |-1.2 scan
      |-1.3 table -0.1
      |-3.5 <unk>
      |
      |\2-grams:
      |-0.4 join hash
      |-0.6 hash join
      |-0.7 table row
      |-0.8 row scan
      |
      |\end\
      |""".stripMargin

  val q134: Q = (s, d) => {
    val m = graft.operators.TextStats.parseArpa(q134Arpa)
    val (uni, bi) = graft.operators.TextStats.arpaTables(s, m)
    graft.operators.TextStats.arpaCrossEntropy(
        Tables.documents(s, d).select("doc_id", "text"),
        "doc_id", "text", uni, bi, m.unkLp)
      .orderBy("doc_id")
  }

  val q134Sql: String =
    s"""WITH uni(w, lp, bo) AS (VALUES
       |    ('join', -0.9, -0.30103), ('hash', -1.0, -0.2),
       |    ('row', -1.1, -0.25), ('scan', -1.2, 0.0),
       |    ('table', -1.3, -0.1), ('<unk>', -3.5, 0.0)),
       |bi(gram, lp) AS (VALUES
       |    ('join hash', -0.4), ('hash join', -0.6),
       |    ('table row', -0.7), ('row scan', -0.8)),
       |n AS (SELECT doc_id, $duckWords AS w FROM documents),
       |bg AS (SELECT doc_id, w[i] || ' ' || w[i + 1] AS gram,
       |    w[i] AS w1, w[i + 1] AS w2
       |  FROM n, unnest(generate_series(1, len(w) - 1)) t(i)
       |  WHERE len(w) >= 2),
       |sc AS (SELECT b.doc_id,
       |    CAST(floor(-(CASE WHEN b2.lp IS NOT NULL THEN b2.lp
       |        ELSE coalesce(u1.bo, 0) + coalesce(u2.lp, -3.5) END)
       |      * 2.302585092994046 * 1000000 + 0.5) AS BIGINT) AS le6
       |  FROM bg b
       |  LEFT JOIN bi b2 USING (gram)
       |  LEFT JOIN uni u1 ON u1.w = b.w1
       |  LEFT JOIN uni u2 ON u2.w = b.w2),
       |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(floor(sum(le6) / (count(*) * 100.0) + 0.5) AS BIGINT)
       |      AS arpa_e4
       |  FROM sc GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
       |  coalesce(a.arpa_e4, 0) AS arpa_e4
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  // ---- q135 unigram-LM tokenizer (SentencePiece-style train + encode) ----
  // The third tokenizer family (Unigram scaladoc): seed chars + top-600
  // substrings with −ln-likelihood e6 costs, ONE distributed E-step
  // (likelihood-greedy segment of the vocabulary word table), prune to
  // chars + top-114ish multi by usage, add-one re-estimate, then encode
  // the corpus under the final model. The oracle replays the ENTIRE
  // training round — seed CTEs, the E-step as a recursive CTE with a
  // min-cost-ratio LATERAL probe, usage ranking, smoothed costs — and
  // the final segmentation with the same 32-step cap (the q129
  // structural-parity pattern, likelihood rule instead of longest-match).
  val q135: Q = (s, d) => {
    val docs = graft.core.Ops.widen(Tables.documents(s, d))
      .select("doc_id", "text")
    val wf = graft.operators.Bpe.wordFreqs(docs, "text")
    val vocab = graft.operators.Unigram.trainUnigram(wf, vocabSize = 150)
    val m = graft.operators.Unigram.collectUniModel(vocab)
    graft.operators.Unigram.unigramEncode(docs, "doc_id", "text", m)
      .orderBy("doc_id")
  }

  val q135Sql: String =
    s"""WITH RECURSIVE n AS (SELECT doc_id, $duckWords AS w FROM documents),
       |wf AS (SELECT wrd AS w, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(w) AS wrd FROM n) GROUP BY 1),
       |chars AS (SELECT substr(w, p, 1) AS piece,
       |    CAST(sum(freq) AS BIGINT) AS wfreq
       |  FROM wf, unnest(generate_series(1, length(w))) s(p) GROUP BY 1),
       |sub AS (SELECT substr(w, p, l) AS piece, freq
       |  FROM wf, unnest(generate_series(2, 8)) t(l),
       |       unnest(generate_series(1, length(w) - l + 1)) s(p)
       |  WHERE length(w) >= l),
       |multi AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS wfreq
       |  FROM sub GROUP BY 1 ORDER BY wfreq DESC, piece ASC LIMIT 600),
       |seed AS (SELECT * FROM chars UNION ALL SELECT * FROM multi),
       |cost0 AS (SELECT piece,
       |    CAST(floor(-ln(CAST(wfreq AS DOUBLE) /
       |      (SELECT CAST(sum(wfreq) AS DOUBLE) FROM seed)) * 1000000
       |      + 0.5) AS BIGINT) AS cost
       |  FROM seed),
       |segw AS (
       |  SELECT w, freq, 1 AS pos, 0 AS np, CAST(NULL AS VARCHAR) AS piece
       |  FROM wf
       |  UNION ALL
       |  SELECT s.w, s.freq, s.pos + coalesce(m.l, 1), s.np + 1,
       |    coalesce(m.p, substr(s.w, s.pos, 1))
       |  FROM segw s LEFT JOIN LATERAL (
       |    SELECT piece AS p, length(piece) AS l FROM cost0
       |    WHERE piece = substr(s.w, s.pos, length(piece))
       |    ORDER BY CAST(cost AS DOUBLE) / length(piece) ASC,
       |      length(piece) DESC LIMIT 1) m ON true
       |  WHERE s.pos <= length(s.w) AND s.np < 32),
       |usage AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS usage
       |  FROM segw WHERE piece IS NOT NULL GROUP BY 1),
       |charset AS (SELECT DISTINCT piece FROM chars),
       |charrows AS (SELECT c.piece, coalesce(u.usage, 0) AS usage
       |  FROM charset c LEFT JOIN usage u USING (piece)),
       |multikept AS (SELECT piece, usage FROM (
       |    SELECT piece, usage, row_number() OVER (
       |      ORDER BY usage DESC, piece ASC) AS rn
       |    FROM usage WHERE length(piece) >= 2)
       |  WHERE rn <= 150 - (SELECT count(*) FROM charset)),
       |kept AS (SELECT piece, usage + 1 AS wfreq FROM charrows
       |  UNION ALL SELECT piece, usage + 1 FROM multikept),
       |cost1 AS (SELECT piece,
       |    CAST(floor(-ln(CAST(wfreq AS DOUBLE) /
       |      (SELECT CAST(sum(wfreq) AS DOUBLE) FROM kept)) * 1000000
       |      + 0.5) AS BIGINT) AS cost
       |  FROM kept),
       |dw AS (SELECT doc_id, i AS widx, w[i] AS wrd
       |  FROM n, unnest(generate_series(1, len(w))) t(i)),
       |seg AS (
       |  SELECT doc_id, widx, wrd, 1 AS pos, 0 AS np,
       |    CAST(NULL AS VARCHAR) AS piece
       |  FROM dw
       |  UNION ALL
       |  SELECT s.doc_id, s.widx, s.wrd, s.pos + coalesce(m.l, 1),
       |    s.np + 1, coalesce(m.p, substr(s.wrd, s.pos, 1))
       |  FROM seg s LEFT JOIN LATERAL (
       |    SELECT piece AS p, length(piece) AS l FROM cost1
       |    WHERE piece = substr(s.wrd, s.pos, length(piece))
       |    ORDER BY CAST(cost AS DOUBLE) / length(piece) ASC,
       |      length(piece) DESC LIMIT 1) m ON true
       |  WHERE s.pos <= length(s.wrd) AND s.np < 32),
       |pieces AS (SELECT doc_id, widx, np, piece FROM seg
       |  WHERE piece IS NOT NULL),
       |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pieces,
       |    string_agg(piece, '|' ORDER BY widx, np) AS enc
       |  FROM pieces GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(a.n_pieces, 0) AS n_pieces,
       |  coalesce(a.enc, '') AS enc
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  // ---- q137 order-3 external-ARPA perplexity (full Katz ladder) ----------
  // The q134 CCNet deployment one order up: TextStats.parseArpa loads a
  // LITERAL order-3 KenLM-format model (the default maxOrder=5 cap) and
  // arpaCrossEntropyN scores every document through the depth-3 Katz
  // recursion — longest listed suffix wins, every longer unlisted context
  // charges its backoff weight (0 when the context gram is unlisted).
  // The oracle re-states the per-order tables as VALUES and replays the
  // identical suffix/context join ladder and when-chain with the
  // e6-round-before-sum fixed point.
  private val q137Arpa =
    """\data\
      |ngram 1=7
      |ngram 2=5
      |ngram 3=4
      |
      |\1-grams:
      |-0.9 join -0.30103
      |-1.0 hash -0.2
      |-1.1 row -0.25
      |-1.2 scan -0.12
      |-1.3 table -0.1
      |-1.4 key -0.18
      |-3.5 <unk>
      |
      |\2-grams:
      |-0.4 join hash -0.15
      |-0.6 hash join -0.22
      |-0.7 table row -0.09
      |-0.8 row scan -0.3
      |-0.5 key scan
      |
      |\3-grams:
      |-0.2 table row scan
      |-0.3 join hash join
      |-0.35 key scan slow
      |-0.45 hash join hash
      |
      |\end\
      |""".stripMargin

  val q137: Q = (s, d) => {
    val m = graft.operators.TextStats.parseArpa(q137Arpa)
    val tabs = graft.operators.TextStats.arpaTablesN(s, m)
    graft.operators.TextStats.arpaCrossEntropyN(
        Tables.documents(s, d).select("doc_id", "text"),
        "doc_id", "text", tabs, m.unkLp)
      .orderBy("doc_id")
  }

  val q137Sql: String =
    s"""WITH t1(gram, lp, bo) AS (VALUES
       |    ('join', -0.9, -0.30103), ('hash', -1.0, -0.2),
       |    ('row', -1.1, -0.25), ('scan', -1.2, -0.12),
       |    ('table', -1.3, -0.1), ('key', -1.4, -0.18),
       |    ('<unk>', -3.5, 0.0)),
       |t2(gram, lp, bo) AS (VALUES
       |    ('join hash', -0.4, -0.15), ('hash join', -0.6, -0.22),
       |    ('table row', -0.7, -0.09), ('row scan', -0.8, -0.3),
       |    ('key scan', -0.5, 0.0)),
       |t3(gram, lp) AS (VALUES
       |    ('table row scan', -0.2), ('join hash join', -0.3),
       |    ('key scan slow', -0.35), ('hash join hash', -0.45)),
       |n AS (SELECT doc_id, $duckWords AS w FROM documents),
       |tg AS (SELECT doc_id,
       |    w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS s3,
       |    w[i + 1] || ' ' || w[i + 2] AS s2, w[i + 2] AS s1,
       |    w[i] || ' ' || w[i + 1] AS c2, w[i + 1] AS c1
       |  FROM n, unnest(generate_series(1, len(w) - 2)) t(i)
       |  WHERE len(w) >= 3),
       |sc AS (SELECT g.doc_id,
       |    CAST(floor(-(CASE
       |        WHEN l3.lp IS NOT NULL THEN l3.lp
       |        WHEN l2.lp IS NOT NULL THEN coalesce(b2.bo, 0) + l2.lp
       |        WHEN l1.lp IS NOT NULL THEN
       |          coalesce(b1.bo, 0) + coalesce(b2.bo, 0) + l1.lp
       |        ELSE coalesce(b1.bo, 0) + coalesce(b2.bo, 0) + (-3.5) END)
       |      * 2.302585092994046 * 1000000 + 0.5) AS BIGINT) AS le6
       |  FROM tg g
       |  LEFT JOIN t3 l3 ON l3.gram = g.s3
       |  LEFT JOIN t2 l2 ON l2.gram = g.s2
       |  LEFT JOIN t1 l1 ON l1.gram = g.s1
       |  LEFT JOIN t2 b2 ON b2.gram = g.c2
       |  LEFT JOIN t1 b1 ON b1.gram = g.c1),
       |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |    CAST(floor(sum(le6) / (count(*) * 100.0) + 0.5) AS BIGINT)
       |      AS arpa_e4
       |  FROM sc GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(a.n_grams, 0) AS n_grams,
       |  coalesce(a.arpa_e4, 0) AS arpa_e4
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  // ---- q138 full-EM unigram-LM training (lattice forward–backward) -------
  // Unigram.trainUnigramEM replaces q135's greedy segmentation counts
  // with Kudo 2018's actual E-step: per vocabulary word, a forward and a
  // backward softmin DP (the e6 log-semiring combine, re-rounded per ⊕)
  // and per-edge posterior-expected counts; one prune + add-one
  // re-estimate round exits as the (piece, cost) table. The oracle
  // replays the WHOLE trajectory: seed CTEs, both DPs as recursive CTEs
  // carrying their α/β arrays as LISTs (softmin nested in fixed l-order
  // through LATERAL — identical null-skip fold), the edge posterior
  // explode, usage ranking and smoothed costs.
  private def duckCmb(a: String, b: String, out: String): String =
    s"CASE WHEN $b IS NULL THEN $a WHEN $a IS NULL THEN $b " +
      s"ELSE least($a, $b) - CAST(floor(ln(1 + exp(-CAST(greatest($a, $b)" +
      s" - least($a, $b) AS DOUBLE) / 1000000)) * 1000000 + 0.5) AS " +
      s"BIGINT) END AS $out"

  private def duckSoftmin4(t1: String, t2: String, t3: String,
                           t4: String): String =
    s"""(SELECT ${duckCmb("c3", "t4", "v")}
       |      FROM (SELECT ${duckCmb("c2", "t3", "c3")}, t4
       |        FROM (SELECT ${duckCmb("t1", "t2", "c2")}, t3, t4
       |          FROM (SELECT $t1 AS t1, $t2 AS t2,
       |                       $t3 AS t3, $t4 AS t4))))""".stripMargin

  val q138: Q = (s, d) => {
    val docs = graft.core.Ops.widen(Tables.documents(s, d))
      .select("doc_id", "text")
    val wf = graft.operators.Bpe.wordFreqs(docs, "text")
    graft.operators.Unigram.trainUnigramEM(wf, vocabSize = 40, rounds = 1,
        seedMultiplier = 4, maxPieceLen = 4)
      .orderBy("piece")
  }

  val q138Sql: String = {
    def fwdT(l: Int) =
      s"CASE WHEN f.i >= ${l - 1} THEN f.al[f.i - ${l - 2}] + " +
        s"(SELECT cost FROM cost0 WHERE piece = " +
        s"substr(f.w, f.i - ${l - 2}, $l)) END"
    val fwdT1 = "f.al[f.i + 1] + coalesce((SELECT cost FROM cost0 " +
      "WHERE piece = substr(f.w, f.i + 1, 1)), 100000000)"
    def bwdT(l: Int) =
      s"CASE WHEN b.j >= ${l - 1} THEN b.bl[b.j - ${l - 2}] + " +
        s"(SELECT cost FROM cost0 WHERE piece = " +
        s"substr(b.w, length(b.w) - b.j, $l)) END"
    val bwdT1 = "b.bl[b.j + 1] + coalesce((SELECT cost FROM cost0 " +
      "WHERE piece = substr(b.w, length(b.w) - b.j, 1)), 100000000)"
    s"""WITH RECURSIVE n AS (SELECT doc_id, $duckWords AS w FROM documents),
       |wf AS (SELECT wrd AS w, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(w) AS wrd FROM n) GROUP BY 1),
       |chars AS (SELECT substr(w, p, 1) AS piece,
       |    CAST(sum(freq) AS BIGINT) AS wfreq
       |  FROM wf, unnest(generate_series(1, length(w))) s(p) GROUP BY 1),
       |sub AS (SELECT substr(w, p, l) AS piece, freq
       |  FROM wf, unnest(generate_series(2, 4)) t(l),
       |       unnest(generate_series(1, length(w) - l + 1)) s(p)
       |  WHERE length(w) >= l),
       |multi AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS wfreq
       |  FROM sub GROUP BY 1 ORDER BY wfreq DESC, piece ASC LIMIT 160),
       |seed AS (SELECT * FROM chars UNION ALL SELECT * FROM multi),
       |cost0 AS (SELECT piece,
       |    CAST(floor(-ln(CAST(wfreq AS DOUBLE) /
       |      (SELECT CAST(sum(wfreq) AS DOUBLE) FROM seed)) * 1000000
       |      + 0.5) AS BIGINT) AS cost
       |  FROM seed),
       |fwd AS (
       |  SELECT w, freq, 0 AS i, [CAST(0 AS BIGINT)] AS al FROM wf
       |  UNION ALL
       |  SELECT f.w, f.freq, f.i + 1, list_append(f.al, c.v)
       |  FROM fwd f LEFT JOIN LATERAL
       |    ${duckSoftmin4(fwdT1, fwdT(2), fwdT(3), fwdT(4))} c ON true
       |  WHERE f.i < length(f.w)),
       |bwd AS (
       |  SELECT w, freq, 0 AS j, [CAST(0 AS BIGINT)] AS bl FROM wf
       |  UNION ALL
       |  SELECT b.w, b.freq, b.j + 1, list_append(b.bl, c.v)
       |  FROM bwd b LEFT JOIN LATERAL
       |    ${duckSoftmin4(bwdT1, bwdT(2), bwdT(3), bwdT(4))} c ON true
       |  WHERE b.j < length(b.w)),
       |fwdf AS (SELECT w, freq, al FROM fwd WHERE i = length(w)),
       |bwdf AS (SELECT w, bl FROM bwd WHERE j = length(w)),
       |ed AS (
       |  SELECT f.w, f.freq, substr(f.w, st.s, lt.l) AS piece,
       |    CAST(floor(exp(-CAST(f.al[st.s] +
       |        CASE WHEN lt.l = 1 THEN coalesce((SELECT cost FROM cost0
       |            WHERE piece = substr(f.w, st.s, 1)), 100000000)
       |          ELSE (SELECT cost FROM cost0
       |            WHERE piece = substr(f.w, st.s, lt.l)) END +
       |        b.bl[length(f.w) - st.s - lt.l + 2] -
       |        f.al[length(f.w) + 1] AS DOUBLE) / 1000000)
       |      * 1000000 + 0.5) AS BIGINT) AS cnt
       |  FROM fwdf f JOIN bwdf b USING (w),
       |       unnest(generate_series(1, 8)) st(s),
       |       unnest(generate_series(1, 4)) lt(l)
       |  WHERE st.s <= length(f.w) AND st.s + lt.l - 1 <= length(f.w)),
       |usage AS (SELECT piece, CAST(sum(freq * cnt) AS BIGINT) AS usage_e6
       |  FROM ed WHERE cnt IS NOT NULL GROUP BY 1),
       |charset AS (SELECT DISTINCT piece FROM chars),
       |charrows AS (SELECT c.piece, coalesce(u.usage_e6, 0) AS usage_e6
       |  FROM charset c LEFT JOIN usage u USING (piece)),
       |multikept AS (SELECT piece, usage_e6 FROM (
       |    SELECT piece, usage_e6, row_number() OVER (
       |      ORDER BY usage_e6 DESC, piece ASC) AS rn
       |    FROM usage WHERE length(piece) >= 2)
       |  WHERE rn <= 40 - (SELECT count(*) FROM charset)),
       |kept AS (SELECT piece, usage_e6 + 1000000 AS wfreq FROM charrows
       |  UNION ALL SELECT piece, usage_e6 + 1000000 FROM multikept)
       |SELECT piece, CAST(floor(-ln(CAST(wfreq AS DOUBLE) /
       |    (SELECT CAST(sum(wfreq) AS DOUBLE) FROM kept)) * 1000000
       |    + 0.5) AS BIGINT) AS cost
       |FROM kept ORDER BY piece""".stripMargin
  }

  // ---- q142 subword-regularization sampling encode -----------------------
  // Unigram.sampleEncode: forward softmin lattice (the q138 DP) then a
  // BACKWARD-SAMPLING walk — per boundary, candidate edges weigh their
  // e6-rounded posterior exp(−(α(i−l)+c−α(i))/10⁶), the draw is the md5
  // seedless-uniform convention on (word:widx:boundary:seed), and the
  // pick walks candidates ascending-l until the cumulative weight clears
  // ⌊u·Σw/10⁶⌋. Literal model (training is q135/q138's subject), seed 7,
  // α = 1. The oracle replays the walk exactly: the q138 forward CTE per
  // word OCCURRENCE, then a recursive sampling CTE whose per-step LATERAL
  // layers bind weights → cumulative sums + draw → threshold → pick.
  private val q142Pieces = Seq(
    "t" -> 2500000L, "h" -> 2500000L, "e" -> 2200000L, "a" -> 2300000L,
    "n" -> 2400000L, "i" -> 2400000L, "o" -> 2400000L, "s" -> 2400000L,
    "th" -> 3000000L, "he" -> 3100000L, "in" -> 3200000L, "an" -> 3200000L,
    "the" -> 3800000L, "ing" -> 4000000L, "tion" -> 4500000L)

  val q142: Q = (s, d) => {
    val docs = Tables.documents(s, d).filter(col("doc_id") < 20)
      .select(col("doc_id"), substring(col("text"), 1, 200).as("text"))
    graft.operators.Unigram.sampleEncode(docs, "doc_id", "text",
        graft.operators.Unigram.UniModel(q142Pieces.toMap, maxPieceLen = 4),
        seed = 7L)
      .orderBy("doc_id")
  }

  val q142Sql: String = {
    val costVals = q142Pieces
      .map { case (p, c) => s"('$p', CAST($c AS BIGINT))" }.mkString(", ")
    def fwdT(l: Int) =
      s"CASE WHEN f.i >= ${l - 1} THEN f.al[f.i - ${l - 2}] + " +
        s"(SELECT cost FROM cost0 WHERE piece = " +
        s"substr(f.w, f.i - ${l - 2}, $l)) END"
    val fwdT1 = "f.al[f.i + 1] + coalesce((SELECT cost FROM cost0 " +
      "WHERE piece = substr(f.w, f.i + 1, 1)), 100000000)"
    // candidate weight for an edge of length l ending at boundary s.p
    def wT(l: Int) =
      if (l == 1)
        "CASE WHEN s.p >= 1 THEN CAST(floor(exp(-CAST(s.al[s.p] + " +
          "coalesce((SELECT cost FROM cost0 WHERE piece = " +
          "substr(s.w, s.p, 1)), 100000000) - s.al[s.p + 1] AS DOUBLE) " +
          "/ 1000000) * 1000000 + 0.5) AS BIGINT) END"
      else
        s"CASE WHEN s.p >= $l THEN (SELECT CAST(floor(exp(-CAST(" +
          s"s.al[s.p - ${l - 1}] + cost - s.al[s.p + 1] AS DOUBLE) " +
          s"/ 1000000) * 1000000 + 0.5) AS BIGINT) FROM cost0 " +
          s"WHERE piece = substr(s.w, s.p - ${l - 1}, $l)) END"
    s"""WITH RECURSIVE
       |docs0 AS (SELECT doc_id, substr(text, 1, 200) AS text
       |  FROM documents WHERE doc_id < 20),
       |n AS (SELECT doc_id, $duckWords AS w FROM docs0),
       |wx AS (SELECT doc_id, w[t.i] AS w, t.i AS widx
       |  FROM n, unnest(generate_series(1, len(w))) t(i)),
       |cost0(piece, cost) AS (SELECT * FROM (VALUES $costVals)),
       |fwd AS (
       |  SELECT doc_id, widx, w, 0 AS i, [CAST(0 AS BIGINT)] AS al FROM wx
       |  UNION ALL
       |  SELECT f.doc_id, f.widx, f.w, f.i + 1, list_append(f.al, c.v)
       |  FROM fwd f LEFT JOIN LATERAL
       |    ${duckSoftmin4(fwdT1, fwdT(2), fwdT(3), fwdT(4))} c ON true
       |  WHERE f.i < length(f.w)),
       |fwdf AS (SELECT doc_id, widx, w, al FROM fwd WHERE i = length(w)),
       |samp AS (
       |  SELECT doc_id, widx, w, al, length(w) AS p,
       |    CAST([] AS VARCHAR[]) AS acc
       |  FROM fwdf
       |  UNION ALL
       |  SELECT s.doc_id, s.widx, s.w, s.al, s.p - c.pickl,
       |    [substr(s.w, s.p - c.pickl + 1, c.pickl)] || s.acc
       |  FROM samp s LEFT JOIN LATERAL
       |    (SELECT CASE WHEN w1 IS NOT NULL AND cw1 > t THEN 1
       |         WHEN w2 IS NOT NULL AND cw2 > t THEN 2
       |         WHEN w3 IS NOT NULL AND cw3 > t THEN 3
       |         WHEN w4 IS NOT NULL AND cw4 > t THEN 4
       |         WHEN w4 IS NOT NULL THEN 4 WHEN w3 IS NOT NULL THEN 3
       |         WHEN w2 IS NOT NULL THEN 2 ELSE 1 END AS pickl
       |     FROM (SELECT w1, w2, w3, w4, cw1, cw2, cw3, cw4,
       |         (u * cw4) // 1000000 AS t
       |       FROM (SELECT w1, w2, w3, w4,
       |           coalesce(w1, 0) AS cw1,
       |           coalesce(w1, 0) + coalesce(w2, 0) AS cw2,
       |           coalesce(w1, 0) + coalesce(w2, 0) + coalesce(w3, 0)
       |             AS cw3,
       |           coalesce(w1, 0) + coalesce(w2, 0) + coalesce(w3, 0)
       |             + coalesce(w4, 0) AS cw4,
       |           ('0x' || substr(md5(s.w || ':' ||
       |             CAST(s.widx AS VARCHAR) || ':' ||
       |             CAST(s.p AS VARCHAR) || ':7'), 1, 8))::BIGINT
       |             % 1000000 AS u
       |         FROM (SELECT ${wT(1)} AS w1, ${wT(2)} AS w2,
       |                      ${wT(3)} AS w3, ${wT(4)} AS w4)))) c ON true
       |  WHERE s.p > 0),
       |sampf AS (SELECT doc_id, widx, acc FROM samp WHERE p = 0),
       |agg AS (SELECT doc_id, flatten(list(acc ORDER BY widx)) AS ps
       |  FROM sampf GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(len(a.ps), 0) AS BIGINT) AS n_pieces,
       |  coalesce(array_to_string(a.ps, '|'), '') AS enc
       |FROM docs0 d LEFT JOIN agg a USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // ---- q167 external language-ID model artifact ---------------------------
  // parseLangId + langIdScores (the JOIN serving form): a shipped
  // char-3-gram profile artifact — grams drawn from the synthetic
  // languages' marker vocabulary, '_'-encoded space gram included —
  // scores every doc by occurrence-weighted gram hits and predicts the
  // argmax (alphabetical tie-break). The oracle replays the identical
  // normalization (lower, non-alphanumerics→space, trim), 1-based char
  // trigram extraction, weight join, and CASE argmax. The per-row
  // collected form is spec-pinned equal (LangIdModelSpec), so this
  // probe covers both serving shapes.
  private val q167Model: String =
    """\langid\
      |order 3
      |\profile alpha\
      |tab 40
      |abl 25
      |row 30
      |sca 20
      |can 15
      |key 35
      |e_r 5
      |\profile beta\
      |joi 50
      |oin 30
      |mer 25
      |rge 20
      |win 30
      |dow 15
      |bat 25
      |tch 20
      |\profile gamma\
      |str 35
      |eam 30
      |fil 25
      |lte 20
      |sor 30
      |ort 15
      |que 40
      |uer 25
      |\end\
      |""".stripMargin

  val q167: Q = (s, d) => {
    val m = TextStats.parseLangId(q167Model)
    TextStats.langIdScores(Tables.documents(s, d)
        .select("doc_id", "text"), "doc_id", "text", m)
      .orderBy("doc_id")
  }

  val q167Sql: String = {
    val m = graft.operators.TextStats.parseLangId(q167Model)
    val values = m.profiles.flatMap { case (l, grams) =>
      grams.map { case (g, w) => s"('$l', '$g', $w)" }
    }.mkString(",\n    ")
    s"""WITH model(lang, gram, weight) AS (VALUES
       |    $values),
       |nrm AS (
       |  SELECT doc_id,
       |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, substr(t, i, 3) AS gram
       |  FROM nrm, unnest(generate_series(1, greatest(0, len(t) - 2))) u(i)
       |  WHERE len(t) >= 3),
       |sc AS (
       |  SELECT g.doc_id,
       |    CAST(coalesce(sum(CASE WHEN m.lang = 'alpha' THEN m.weight END),
       |      0) AS BIGINT) AS s_alpha,
       |    CAST(coalesce(sum(CASE WHEN m.lang = 'beta' THEN m.weight END),
       |      0) AS BIGINT) AS s_beta,
       |    CAST(coalesce(sum(CASE WHEN m.lang = 'gamma' THEN m.weight END),
       |      0) AS BIGINT) AS s_gamma
       |  FROM grams g JOIN model m ON m.gram = g.gram
       |  GROUP BY g.doc_id)
       |SELECT d.doc_id,
       |  coalesce(sc.s_alpha, 0) AS s_alpha,
       |  coalesce(sc.s_beta, 0) AS s_beta,
       |  coalesce(sc.s_gamma, 0) AS s_gamma,
       |  CASE WHEN coalesce(sc.s_alpha, 0) >= coalesce(sc.s_beta, 0)
       |         AND coalesce(sc.s_alpha, 0) >= coalesce(sc.s_gamma, 0)
       |       THEN 'alpha'
       |       WHEN coalesce(sc.s_beta, 0) >= coalesce(sc.s_gamma, 0)
       |       THEN 'beta' ELSE 'gamma' END AS lang_ext
       |FROM documents d LEFT JOIN sc USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // ---- q175 realistic langid artifact (r16 verdict #5) --------------------
  // q167 proved the parse/serve path on the synthetic alpha/beta/gamma
  // languages; this exercises it at REAL vocabulary scale: a
  // Cavnar–Trenkle-style char-trigram artifact over six real languages
  // (deu/eng/fra/ita/nld/spa), with profiles DERIVED from each
  // language's basic high-frequency vocabulary (public linguistic
  // facts; ASCII forms — the langid normalization strips everything
  // outside [a-z0-9] anyway): every word space-padded, its trigrams
  // weighted by Zipf rank (len − rank per occurrence, summed per gram),
  // top 64 grams per profile — ~380 grams total across overlapping
  // profiles (romance languages share 'que'/'les'-class grams, so
  // tie-break and cross-profile competition actually engage). The
  // fixture corpus is built from the SAME word lists: doc i carries a
  // 20-word sentence of language i%6 (every 11th doc a mixed
  // eng-then-fra sentence — the competing-profiles case). The oracle
  // replays the artifact as a VALUES table, the sentence construction,
  // the normalization/trigram/join pipeline, and the alphabetical-
  // tie-break argmax. The artifact TEXT goes through parseLangId —
  // the shipped-file path — and is pinned verbatim in
  // artifacts/langid_real.profile (LangIdModelSpec keeps them equal).
  private[graft] val q175Words: Seq[(String, Seq[String])] = Seq(
    "deu" -> Seq("der", "die", "und", "ich", "nicht", "das", "ist",
      "sie", "ein", "aber", "was", "wir", "mit", "sich", "auf", "eine",
      "als", "auch", "haben", "werden", "wenn", "noch", "schon", "mehr",
      "immer", "doch", "nur", "schnell", "wasser", "sprache", "zeit",
      "jahr", "mensch", "welt", "leben", "gut", "machen", "sehen",
      "geben", "stadt"),
    "eng" -> Seq("the", "and", "that", "have", "for", "not", "with",
      "you", "this", "but", "his", "from", "they", "say", "her", "she",
      "will", "one", "all", "would", "there", "their", "what", "out",
      "about", "who", "get", "which", "when", "make", "can", "like",
      "time", "just", "him", "know", "take", "people", "into", "year"),
    "fra" -> Seq("les", "des", "est", "pas", "que", "une", "dans",
      "pour", "qui", "sur", "sont", "avec", "plus", "tout", "nous",
      "vous", "mais", "comme", "faire", "leur", "bien", "temps", "tres",
      "sans", "autre", "apres", "homme", "monde", "jour", "aussi",
      "cette", "deux", "meme", "notre", "votre", "encore", "toujours",
      "grand", "petit", "alors"),
    "ita" -> Seq("che", "non", "una", "per", "sono", "della", "questo",
      "come", "anche", "piu", "nella", "essere", "tutto", "fare",
      "quando", "molto", "bene", "dove", "tempo", "anno", "uomo",
      "cosa", "vita", "giorno", "casa", "mondo", "parte", "stato",
      "primo", "grande", "nuovo", "stesso", "altro", "ancora", "sempre",
      "dopo", "senza", "ogni", "loro", "noi"),
    "nld" -> Seq("het", "een", "van", "dat", "niet", "zijn", "met",
      "voor", "maar", "ook", "als", "dan", "naar", "bij", "over",
      "nog", "wat", "worden", "deze", "omdat", "onder", "tussen",
      "tegen", "door", "andere", "alle", "veel", "twee", "eerste",
      "jaar", "tijd", "mensen", "werk", "goed", "groot", "nieuw",
      "eigen", "moet", "kunnen", "hebben"),
    "spa" -> Seq("que", "los", "del", "las", "por", "con", "para",
      "una", "como", "pero", "sus", "este", "esta", "cuando", "muy",
      "sin", "sobre", "tambien", "hasta", "donde", "quien", "desde",
      "todo", "nos", "durante", "todos", "uno", "les", "contra",
      "otros", "ese", "eso", "ante", "ellos", "esto", "antes",
      "algunos", "unos", "otro", "tiempo"))

  /** The derived per-language trigram profiles: space-padded words'
    * trigrams, weight = Σ over containing words of (listLen − rank),
    * top 64 by (weight desc, gram asc) — deterministic.
    */
  private[graft] def q175Profiles: Seq[(String, Seq[(String, Long)])] =
    q175Words.map { case (lang, words) =>
      val n = words.length
      val acc = scala.collection.mutable.LinkedHashMap
        .empty[String, Long]
      for ((w, rank) <- words.zipWithIndex) {
        val padded = s" $w "
        for (i <- 0 to padded.length - 3) {
          val g = padded.substring(i, i + 3)
          acc(g) = acc.getOrElse(g, 0L) + (n - rank).toLong
        }
      }
      lang -> acc.toSeq.sortBy { case (g, w) => (-w, g) }.take(64)
    }

  /** The artifact TEXT (the parseLangId file format; spaces in grams
    * written as '_', the Cavnar–Trenkle convention).
    */
  private[graft] def q175Artifact: String = {
    val sb = new StringBuilder("\\langid\\\norder 3\n")
    for ((lang, grams) <- q175Profiles) {
      sb.append(s"\\profile $lang\\\n")
      for ((g, w) <- grams)
        sb.append(s"${g.replace(' ', '_')} $w\n")
    }
    sb.append("\\end\\\n").toString
  }

  /** Doc `id`'s fixture sentence: 20 words of language id%6 (every
    * 11th doc: 10 eng then 10 fra words — competing profiles), word j
    * = list[(id·7 + j) mod 40].
    */
  private[graft] def q175Sentence(id: Long): String = {
    val langs = q175Words.toMap
    val names = q175Words.map(_._1)
    (0 until 20).map { j =>
      val lg =
        if (id % 11 == 0) { if (j < 10) "eng" else "fra" }
        else names((id % 6).toInt)
      langs(lg)(((id * 7 + j) % 40).toInt)
    }.mkString(" ")
  }

  val q175: Q = (s, d) => {
    import s.implicits._
    val m = TextStats.parseLangId(q175Artifact)
    val docs = graft.core.Ops.widen(Tables.documents(s, d))
      .select(col("doc_id")).as[Long]
      .map(id => (id, q175Sentence(id)))
      .toDF("doc_id", "text")
    TextStats.langIdScores(docs, "doc_id", "text", m)
      .orderBy("doc_id")
  }

  val q175Sql: String = {
    val langNames = q175Words.map(_._1)
    val modelValues = q175Profiles.flatMap { case (l, grams) =>
      grams.map { case (g, w) => s"('$l', '$g', $w)" }
    }.mkString(",\n    ")
    val wordValues = q175Words.flatMap { case (l, ws) =>
      ws.zipWithIndex.map { case (w, i) => s"('$l', $i, '$w')" }
    }.mkString(",\n    ")
    val scoreCols = langNames.map(l =>
      s"""    CAST(coalesce(sum(CASE WHEN m.lang = '$l' THEN m.weight
         |      END), 0) AS BIGINT) AS s_$l""".stripMargin)
      .mkString(",\n")
    val outCols = langNames.map(l =>
      s"  coalesce(sc.s_$l, 0) AS s_$l").mkString(",\n")
    // alphabetical tie-break argmax: the first language (sorted) whose
    // score is >= every other's wins — exactly langIdArgmax's
    // (-score, lang) sort
    val argmax = langNames.init.map { l =>
      val ge = langNames.filter(_ != l)
        .map(o => s"coalesce(sc.s_$l, 0) >= coalesce(sc.s_$o, 0)")
        .mkString(" AND ")
      s"       WHEN $ge THEN '$l'"
    }.mkString("\n")
    s"""WITH model(lang, gram, weight) AS (VALUES
       |    $modelValues),
       |w(lang, idx, word) AS (VALUES
       |    $wordValues),
       |tok AS (
       |  SELECT d.doc_id, j.j,
       |    CASE WHEN d.doc_id % 11 = 0 THEN
       |        CASE WHEN j.j < 10 THEN 'eng' ELSE 'fra' END
       |      ELSE (['deu', 'eng', 'fra', 'ita', 'nld',
       |        'spa'])[CAST(d.doc_id % 6 AS INTEGER) + 1] END AS lg
       |  FROM documents d, range(20) j(j)),
       |txt AS (
       |  SELECT t.doc_id, string_agg(w.word, ' ' ORDER BY t.j) AS text
       |  FROM tok t JOIN w ON w.lang = t.lg
       |    AND w.idx = (t.doc_id * 7 + t.j) % 40
       |  GROUP BY t.doc_id),
       |nrm AS (
       |  SELECT doc_id,
       |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
       |  FROM txt),
       |grams AS (
       |  SELECT doc_id, substr(t, i, 3) AS gram
       |  FROM nrm, unnest(generate_series(1, greatest(0, len(t) - 2))) u(i)
       |  WHERE len(t) >= 3),
       |sc AS (
       |  SELECT g.doc_id,
       |$scoreCols
       |  FROM grams g JOIN model m ON m.gram = g.gram
       |  GROUP BY g.doc_id)
       |SELECT d.doc_id,
       |$outCols,
       |  CASE
       |$argmax
       |       ELSE '${langNames.last}' END AS lang_ext
       |FROM documents d LEFT JOIN sc USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  private[probes] val queries: Map[String, Q] = Map(
    "q175_langid_real" -> q175,
    "q167_langid_artifact" -> q167,
    "q168_special_roundtrip" -> q168,
    "q171_packed_spans" -> q171,
    "q172_epoch_shuffle" -> q172,
    "q32_lang_id" -> q32,
    "q33_quality_score" -> q33,
    "q34_token_count" -> q34,
    "q35_winnow_fingerprint" -> q35,
    "q38_token_binning" -> q38,
    "q41_json_extract" -> q41,
    "q48_pii_redaction" -> q48,
    "q51_repetition_ratio" -> q51,
    "q53_sequence_packing" -> q53,
    "q150_bestfit_pack" -> q150,
    "q58_weighted_mix" -> q58,
    "q76_bpe_pairs" -> q76,
    "q78_chunking" -> q78,
    "q83_bpe_encode" -> q83,
    "q148_byte_bpe" -> q148,
    "q154_gpt2_pretokens" -> q154,
    "q162_corpus_tokenize" -> q162,
    "q163_token_packing" -> q163,
    "q164_detokenize" -> q164,
    "q156_gopher_repetition" -> q156,
    "q90_gopher_rules" -> q90,
    "q91_bigram_lm" -> q91,
    "q93_hash_embed" -> q93,
    "q96_tfidf_terms" -> q96,
    "q97_dsir_resample" -> q97,
    "q98_quality_classifier" -> q98,
    "q99_c4_rules" -> q99,
    "q100_mixture_plan" -> q100,
    "q105_bm25_topk" -> q105,
    "q110_trigram_backoff" -> q110,
    "q111_phrase_search" -> q111,
    "q117_doremi_weights" -> q117,
    "q118_kn_lm" -> q118,
    "q119_ppl_buckets" -> q119,
    "q123_quality_signals" -> q123,
    "q127_bm25_indexed" -> q127,
    "q128_rrf_hybrid" -> q128,
    "q129_wordpiece" -> q129,
    "q134_arpa_ppl" -> q134,
    "q135_unigram_lm" -> q135,
    "q137_arpa3_ppl" -> q137,
    "q138_unigram_em" -> q138,
    "q142_unigram_sample" -> q142)

  private[probes] val oracleSql: Map[String, String] = Map(
    "q175_langid_real" -> q175Sql,
    "q167_langid_artifact" -> q167Sql,
    "q168_special_roundtrip" -> q168Sql,
    "q171_packed_spans" -> q171Sql,
    "q172_epoch_shuffle" -> q172Sql,
    "q32_lang_id" -> q32Sql,
    "q33_quality_score" -> q33Sql,
    "q34_token_count" -> q34Sql,
    "q35_winnow_fingerprint" -> q35Sql,
    "q38_token_binning" -> q38Sql,
    "q41_json_extract" -> q41Sql,
    "q48_pii_redaction" -> q48Sql,
    "q51_repetition_ratio" -> q51Sql,
    "q53_sequence_packing" -> q53Sql,
    "q150_bestfit_pack" -> q150Sql,
    "q58_weighted_mix" -> q58Sql,
    "q76_bpe_pairs" -> q76Sql,
    "q78_chunking" -> q78Sql,
    "q83_bpe_encode" -> q83Sql,
    "q148_byte_bpe" -> q148Sql,
    "q154_gpt2_pretokens" -> q154Sql,
    "q162_corpus_tokenize" -> q162Sql,
    "q163_token_packing" -> q163Sql,
    "q164_detokenize" -> q164Sql,
    "q156_gopher_repetition" -> q156Sql,
    "q90_gopher_rules" -> q90Sql,
    "q91_bigram_lm" -> q91Sql,
    "q93_hash_embed" -> q93Sql,
    "q96_tfidf_terms" -> q96Sql,
    "q97_dsir_resample" -> q97Sql,
    "q98_quality_classifier" -> q98Sql,
    "q99_c4_rules" -> q99Sql,
    "q100_mixture_plan" -> q100Sql,
    "q105_bm25_topk" -> q105Sql,
    "q110_trigram_backoff" -> q110Sql,
    "q111_phrase_search" -> q111Sql,
    "q117_doremi_weights" -> q117Sql,
    "q118_kn_lm" -> q118Sql,
    "q119_ppl_buckets" -> q119Sql,
    "q123_quality_signals" -> q123Sql,
    "q127_bm25_indexed" -> q127Sql,
    "q128_rrf_hybrid" -> q128Sql,
    "q129_wordpiece" -> q129Sql,
    "q134_arpa_ppl" -> q134Sql,
    "q135_unigram_lm" -> q135Sql,
    "q137_arpa3_ppl" -> q137Sql,
    "q138_unigram_em" -> q138Sql,
    "q142_unigram_sample" -> q142Sql)
}
