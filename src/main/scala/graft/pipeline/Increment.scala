package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.operators.{Curation, Dedup, TextStats}

/** Configuration for [[Increment.curateIncrement]] — the gate dials
  * shared with the batch funnel ([[CurateConfig]]) and the streaming
  * gate ([[graft.streaming.CurateStream.GateConfig]]): one definition
  * of each stage, three execution shapes.
  */
case class IncrementConfig(
    c4Clean: Boolean = false,
    minQualityE4: Long = 4000,
    keepLangs: Set[String] = Set("alpha", "beta", "gamma"),
    repetition: Option[TextStats.RepetitionConfig] = None,
    nearDupThresholdE4: Long = 8000,
    // banding for a state the FIRST increment creates; existing state
    // pins its own banding (read from the index meta, mismatch is loud
    // there)
    bands: Int = 4, rowsPerBand: Int = 3,
    // optional SEMANTIC stage (the batch funnel's sem_dup gate, against
    // accumulated state): hash-trick embed at `semDim`, SemDeDup vs the
    // sem sub-state then within batch; admitted vectors append. The sem
    // sub-state's reads are restricted to MINHASH-committed batches (the
    // increment's one authoritative marker), so a torn increment's sem
    // rows never serve.
    // ENABLE-FROM-BATCH-N semantics: turning this on for a state with
    // prior committed batches bootstraps the sem sub-state EMPTY from
    // the current batch forward — docs admitted before enablement do
    // not participate in semantic dedup (they were never embedded).
    // For retroactive coverage run [[Increment.semBackfill]] first: it
    // embeds every already-admitted doc and seeds the sub-state under
    // batch "base" before the next increment appends.
    // When the sub-state EXISTS, its pinned (centroid_every, nassign)
    // override the cfg dials below and a semDim mismatch is loud.
    semDedupThresholdE4: Option[Long] = None,
    semDim: Int = 64, semCentroidEvery: Int = 25, semNassign: Int = 2,
    // optional SUBSTRING-DEDUP stage (the batch funnel's window_dedup
    // gate, against accumulated state): every w-token window of the
    // batch is hashed; windows the accumulated corpus already CLAIMS
    // (the `windows` state table, minhash-committed batches only) are
    // removed as duplicate spans, then the within-batch canonical rule
    // applies ([[graft.operators.Curation.removeDuplicateSpansVsClaims]]).
    // Docs are REWRITTEN, not rejected — the cleaned text flows into
    // exact/minhash/sem, and admitted docs' final-text windows append
    // as new claims under this batch id. Runs BEFORE exact dedup, the
    // funnel's stage order.
    dedupWindowsW: Option[Int] = None,
    // language gate from an EXTERNAL char-n-gram artifact (the batch
    // funnel's langIdModel, same swap semantics)
    langIdModel: Option[graft.operators.TextStats.LangIdModel] = None,
    // per-row Gopher quality rules — folded into the quality stage
    // exactly like the funnel (one "quality" reject reason, the words
    // array computed once)
    gopherRules: Option[graft.operators.TextStats.GopherConfig] = None,
    // fastText-style classifier gate threshold (e6 P(keep)); active
    // only when curateIncrement is given classifierModel
    minClassifierPE6: Long = 500000L,
    // external ARPA/KenLM reference-perplexity bound; active only when
    // curateIncrement is given arpaModel. The funnel's POOL-RELATIVE
    // gates (self-trained LM bound, CCNet ppl buckets, DSIR selection)
    // are deliberately NOT increment stages: a small batch cannot
    // self-train a meaningful model, and batch-relative terciles drift
    // with every increment — run those in the periodic full re-curation
    // instead; external-model gates (this one, the classifier, langid)
    // judge each doc identically at any batch size.
    maxArpaE4: Option[Long] = None,
    // intra-doc line dedup (the funnel's rewrite stage — docs are
    // cleaned, never rejected)
    dedupLinesWithinDocs: Boolean = false,
    // benchmark-decontamination gram size; active only when
    // curateIncrement is given a benchmark frame (the funnel's terminal
    // gate, same position: after every dedup stage, before admission)
    decontamGramN: Int = 8,
    // Bloom-prune the accumulated-state scans (exact keys, window
    // claims, minhash bands + shingles, sem cell assignments) with
    // filters built over the
    // BATCH side's keys: state rows that cannot match drop at the scan,
    // before the state-side shuffle, so each increment's join cost is
    // batch-proportional instead of corpus-proportional. Size at ~10
    // bits per batch key for <1% false positives (e.g. 1<<23 for a
    // ~1M-doc batch) — false positives only pass extra rows to the
    // exact joins, results are bit-identical (spec-pinned). None = off;
    // at small state sizes the extra build jobs cost more than the
    // pruned shuffle saves (measured crossover in SCALE.md), so this is
    // the at-scale dial, not a default.
    stateBloomBits: Option[Long] = None,
    // AUTO-dial the Bloom pruning (r16 verdict #3): when true and
    // stateBloomBits is None, each increment decides per batch from
    // the committed state's heavy-table BYTES vs the batch's row count
    // ([[Increment.decideStateBloom]] — the measured SCALE.md crossover
    // as the threshold) and sizes the filter from the batch. The
    // operator stops hand-tuning: small states keep bloom off (the
    // build jobs would cost more than the pruned shuffle saves), and
    // the dial flips exactly when the state-scan volume dominates.
    // stateBloomBits set = manual override, auto never consulted.
    stateBloomAuto: Boolean = false)

/** `ledger` — one [[graft.streaming.CurateStream.GateVerdict]]-shaped
  * row PER BATCH DOC (id, admitted, reason, dup_of); `admitted` — the
  * batch docs that entered the accumulated state this increment;
  * `stageCounts` — the funnel report, derivable from the ledger.
  */
case class IncrementResult(ledger: DataFrame, admitted: DataFrame,
                           stageCounts: Seq[(String, Long)])

/** Incremental batch curation against PERSISTED state — the deployment
  * shape every recurring 100 TB ingest actually runs (VERDICT r14 #1):
  * a NEW SNAPSHOT batch is curated against the ACCUMULATED corpus
  * state, admitting only genuinely-new documents, and the admitted set
  * is appended to every index under one batch id. The batch funnel
  * ([[Curate.run]]) curates one corpus-global pool; the streaming gate
  * ([[graft.streaming.CurateStream.gate]]) covers continuous per-doc
  * ingest; this is the third shape — batch-sized work, corpus-sized
  * memory, same verdict vocabulary.
  *
  * State layout under `stateDir`:
  *  - `minhash/` — the [[Dedup.writeMinhashIndex]] snapshot index
  *    (bands + shingles + per-batch meta commit markers);
  *  - `exact/keys` — (key = md5(text), id) of every ADMITTED doc,
  *    batch_id-partitioned (the exact-dedup key ledger);
  *  - `ledger/` — the per-batch verdict rows, batch_id-partitioned
  *    (the corpus accounting a production ingest owes);
  *  - `metrics/` — one (batch_id, stage, rows) row per funnel stage
  *    per increment: repeated increments build the funnel-rate time
  *    series maintenance decisions can read.
  *
  * Crash/retry contract (the index-family discipline): every state
  * table partitions by batch_id with dynamic overwrite; the MINHASH
  * META partition commits LAST and is the increment's commit marker —
  * `exact/keys`, `ledger/`, and `metrics/` reads semi-join the minhash
  * committed set, so a torn increment is invisible until its marker
  * lands. A retry MUST reuse the batch id: every against-state read
  * excludes the batch's own partitions (the pre-batch view), so the
  * retry recomputes identical verdicts and replaces its partitions
  * bit-identically.
  *
  * Scale shape: per increment, cost is O(batch) hashing/shingling plus
  * equi joins against the state's band/shingle/key tables — the old
  * corpus is read-never re-hashed-never (only its band keys and the
  * candidate-matched shingle sets move, the [[Dedup.nearDupAgainstIndex]]
  * argument). Nothing all-pairs, no driver state beyond counts.
  *
  * Funnel semantics (stream-gate order, verdict-for-verdict parity
  * spec-pinned): c4 → quality/lang → repetition → exact dedup
  * (against state first — dup_of is the stored key's canonical — then
  * within-batch min-id) → MinHash near-dup (against state first —
  * dup_of is the smallest matching old id, the stream's min-parent
  * rule — then within-batch components with min-id canonicals).
  * Rejected docs never enter state (the stream invariant).
  */
object Increment {

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The state root's OWNING family — which sub-index's meta is the
    * increment's authoritative commit marker. Written as a one-word
    * `_family` sentinel file by the FIRST increment touching the root,
    * BEFORE any state write, so even the earliest torn bootstrap is
    * attributable: without it, a text increment that died between its
    * sem sub-state write and its minhash marker would be mistaken for a
    * committed standalone embedding state by the marker-discovery
    * fallback, and its torn ledger would read as committed.
    */
  private def writeFamilySentinel(spark: SparkSession, stateDir: String,
                                  family: String): Unit = {
    val f = fs(spark, stateDir)
    val p = new org.apache.hadoop.fs.Path(s"$stateDir/_family")
    if (!f.exists(p)) {
      val out = f.create(p, true)
      out.write(family.getBytes("UTF-8"))
      out.close()
    }
  }

  /** The `_family` sentinel at an increment state root (None for any
    * other directory, e.g. a versioned warehouse db). Present ⇒ the
    * root is a FUNNEL state whose sub-indexes are owned by the
    * increment's commit protocol — [[Maintain.decideAll]] marks
    * decisions under such a root advisory-only.
    */
  def stateFamily(spark: SparkSession, stateDir: String): Option[String] =
    readFamilySentinel(spark, stateDir)

  private def readFamilySentinel(spark: SparkSession,
                                 stateDir: String): Option[String] = {
    val f = fs(spark, stateDir)
    val p = new org.apache.hadoop.fs.Path(s"$stateDir/_family")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        // loop to EOF: a single read() may return short on remote
        // filesystems, which would truncate the family name and make
        // the marker path silently miss
        val out = new java.io.ByteArrayOutputStream(64)
        val buf = new Array[Byte](64)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(new String(out.toByteArray, "UTF-8").trim)
      } finally in.close()
    }
  }

  /** Batch ids whose state rows were folded under `base` by
    * [[compactStateTo]] — a one-id-per-line `_folded` sentinel at the
    * state root. A retry of a folded batch id is UNSUPPORTED: its own
    * rows now live under `base`, so the excludeBatch pre-batch view
    * cannot hide them and the rerun would mark the whole batch a dup of
    * itself and stomp its committed ledger partition (ADVICE r16). The
    * entry points read this set and refuse such retries loudly; retries
    * against a non-compacted state keep the documented contract.
    */
  private def writeFoldedSentinel(spark: SparkSession, destDir: String,
                                  ids: Seq[String]): Unit = {
    val f = fs(spark, destDir)
    val out = f.create(
      new org.apache.hadoop.fs.Path(s"$destDir/_folded"), true)
    out.write(ids.sorted.mkString("\n").getBytes("UTF-8"))
    out.close()
  }

  private def readFoldedSentinel(spark: SparkSession,
                                 stateDir: String): Set[String] = {
    val f = fs(spark, stateDir)
    val p = new org.apache.hadoop.fs.Path(s"$stateDir/_folded")
    if (!f.exists(p)) Set.empty
    else {
      val in = f.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream(256)
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        new String(out.toByteArray, "UTF-8").linesIterator
          .map(_.trim).filter(_.nonEmpty).toSet
      } finally in.close()
    }
  }

  private def requireBatchNotFolded(spark: SparkSession, stateDir: String,
                                    batchId: String,
                                    caller: String): Unit =
    require(!readFoldedSentinel(spark, stateDir).contains(batchId),
      s"$caller: batch id '$batchId' was compacted into the 'base' " +
        s"partition of $stateDir — committed-batch retries are " +
        "unsupported against a compacted state (rerun under a NEW " +
        "batch id, or retry against the pre-compaction root)")

  /** State exists iff the minhash index has a meta commit marker. */
  def stateExists(spark: SparkSession, stateDir: String): Boolean =
    fs(spark, stateDir).exists(
      new org.apache.hadoop.fs.Path(s"$stateDir/minhash/meta"))

  /** Seed the state from an ALREADY-CURATED corpus (e.g. the admitted
    * output of a [[Curate.run]] over the historical pool): exact keys +
    * minhash index under batch id "base". The caller asserts the corpus
    * is internally deduplicated — seeding does not re-curate.
    */
  def initStateFromCurated(spark: SparkSession, stateDir: String,
                           curated: DataFrame, idCol: String,
                           textCol: String, bands: Int = 4,
                           rowsPerBand: Int = 3,
                           claimsW: Option[Int] = None): Unit = {
    require(!stateExists(spark, stateDir),
      s"initStateFromCurated: state already exists at $stateDir")
    writeFamilySentinel(spark, stateDir, "minhash")
    val docs = graft.core.Ops.widen(curated)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      writeExactKeys(docs, s"$stateDir/exact", "base")
      // seed window claims when the state will run the substring-dedup
      // stage — without them, passages of the seeded corpus would be
      // invisible to cfg.dedupWindowsW until re-claimed by an increment
      for (w <- claimsW)
        Curation.windowClaims(docs, "id", "text", w)
          .withColumn("batch_id", lit("base"))
          .write.mode("overwrite").partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(s"$stateDir/windows")
      Dedup.writeMinhashParts(docs, "id", "text", s"$stateDir/minhash",
        bands, rowsPerBand, overwrite = true, batchId = "base")
    } finally docs.unpersist()
  }

  private def writeExactKeys(docs: DataFrame, dir: String,
                             batchId: String): Unit =
    writeExactKeyRows(docs.select(md5(col("text")).as("key"), col("id")),
      dir, batchId)

  private def writeExactKeyRows(keys: DataFrame, dir: String,
                                batchId: String): Unit =
    keys.select(col("key"), col("id"), lit(batchId).as("batch_id"))
      .write.mode("overwrite").partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(s"$dir/keys")

  /** Bloom-prune `state` rows by `stateKey` against the batch-side key
    * set when `bits` is set — the [[graft.core.Bloom.pruneByKeys]]
    * composition every accumulated-state read below shares. Identity
    * when off.
    */
  private def bloomPrune(state: DataFrame, stateKey: Column,
                         batchKeys: DataFrame, batchKey: Column,
                         bits: Option[Long]): DataFrame =
    bits.map(m => graft.core.Bloom.pruneByKeys(state, stateKey,
      batchKeys, batchKey, m)).getOrElse(state)

  /** The auto-dial behind [[IncrementConfig.stateBloomAuto]]: Bloom
    * pruning pays one filter-build job per pruned family plus a probe
    * filter per state row, and saves (1 − selectivity) of the
    * state-side shuffle — net-positive only when the committed state
    * is much larger than the batch. The r17 paired sweeps pin the
    * crossover as ABSOLUTE state volume, not the state/batch ratio
    * (both sides scale together in a steady-state ingest, so the
    * ratio is flat): the r17 paired sweeps measured break-even around
    * ~100 MB of heavy tables; the r18 past-floor grid (SCALE.md
    * round-18) then showed the byte floor alone is NOT sufficient —
    * with a broadcastable batch the state side never shuffles and
    * bloom lost 27–45% at every measured cell up to 350 MB of state,
    * so the dial additionally requires `minBatchRows` (see
    * [[StateBloomMinBatchRows]] — the shuffle-regime condition). Rule:
    * enable iff batch rows ≥ `minBatchRows` AND committed heavy-table
    * bytes ≥ `minStateBytes` (default 256 MiB) AND ≥
    * `minStateBytesPerBatchRow` (default 4 KiB) per batch row (the
    * huge-batch-tiny-state guard). Filter sized at ~16 bits per batch
    * row, clamped to [2^20, 2^27] (<1% fpp, ≤16 MiB literal).
    * Heavy-table bytes come from one bounded `getContentSummary` walk
    * — no Spark job. Returns the bits to use, or None = keep bloom
    * off.
    */
  /** Every family's heavy data tables, relative to a state root —
    * absent paths contribute nothing, so one list serves text AND the
    * modality increments. Shared with the
    * [[graft.pipeline.Maintain.decideAll]] bloom ADVISORY so the
    * operational report can never silently drift from what the
    * increments' auto dial actually measures.
    */
  val StateBloomHeavyTables: Seq[String] = Seq("exact/keys", "windows",
    "minhash/bands", "minhash/shingles", "sem/assigned", "phash/sigs",
    "audio/fps", "audio/sizes", "video/frames", "video/sizes")

  /** [[decideStateBloom]]'s default activation floor (absolute
    * committed heavy-table bytes) and per-batch-row guard — the single
    * definition both the increments and the Maintain advisory read.
    */
  val StateBloomMinStateBytes: Long = 256L << 20
  val StateBloomMinBytesPerBatchRow: Long = 4096L

  /** Minimum BATCH rows before the auto dial will enable (r18 verdict
    * #3 measurement): Bloom pruning saves state-side SHUFFLE, and the
    * state side only shuffles when the batch's keyed frames exceed the
    * broadcast threshold — below that the batch broadcasts, the state
    * streams through the join unshuffled, and the filter build + the
    * per-state-row probe are pure overhead. Measured (SCALE.md
    * round-18): net-NEGATIVE (+27–45%) at EVERY cell of a
    * {178, 1.8k, 5.3k, 16.8k} batch-rows × {3 MB … 350 MB} state-bytes
    * grid, INCLUDING past the 256 MiB byte floor — the batch side
    * broadcast in all of them. 256k rows ≈ where band/key frames pass
    * the 10 MB spark.sql.autoBroadcastJoinThreshold at ~40–60 B/row;
    * the dial stays provably off everywhere the loss was measured and
    * arms only in the genuinely shuffle-bound regime (multi-million-row
    * production snapshots).
    */
  val StateBloomMinBatchRows: Long = 262144L

  /** Committed heavy-table bytes under `stateDir` — one bounded
    * `getContentSummary` walk over [[StateBloomHeavyTables]], no Spark
    * job.
    */
  def stateHeavyBytes(spark: SparkSession, stateDir: String): Long = {
    val f = fs(spark, stateDir)
    StateBloomHeavyTables
      .map(rel => new org.apache.hadoop.fs.Path(s"$stateDir/$rel"))
      .filter(f.exists)
      .map(p => f.getContentSummary(p).getLength)
      .sum
  }

  def decideStateBloom(spark: SparkSession, stateDir: String,
                       batchRows: Long,
                       minStateBytes: Long = StateBloomMinStateBytes,
                       minStateBytesPerBatchRow: Long =
                         StateBloomMinBytesPerBatchRow,
                       minBatchRows: Long = StateBloomMinBatchRows)
      : Option[Long] = {
    val stateBytes = stateHeavyBytes(spark, stateDir)
    if (batchRows < minBatchRows ||
        stateBytes < minStateBytes ||
        stateBytes < minStateBytesPerBatchRow * math.max(1L, batchRows))
      None
    else {
      val want = java.lang.Long.highestOneBit(
        math.max(1L << 20, math.min(1L << 27,
          16L * math.max(1L, batchRows))))
      Some(want)
    }
  }

  /** Committed exact keys (key, id), excluding `excludeBatch` — the
    * committed set is the MINHASH meta's (keys commit before the
    * marker, so a torn increment's keys never read). Keys canonicalize
    * to min(id): under the contract a key is admitted once ever, so
    * this is a no-op — it pins ONE dup_of per key even if a seeded
    * corpus violated the curated-input contract.
    */
  private def readExactKeys(spark: SparkSession, stateDir: String,
                            excludeBatch: String,
                            batchHashes: Option[(DataFrame, Long)] = None,
                            // prebuilt filter (the buildMany shared
                            // pass) — takes precedence over batchHashes
                            prebuilt: Option[(Array[Long], Long)] = None)
      : DataFrame = {
    val committed = Dedup.minhashCommitted(spark, s"$stateDir/minhash")
      .filter(col("batch_id") =!= excludeBatch)
    val keys = spark.read.parquet(s"$stateDir/exact/keys")
    // prune BEFORE the per-key min aggregate: dropping every row of a
    // key the batch cannot carry leaves surviving keys' groups intact,
    // so min(id) per surviving key — the only keys the exact join can
    // hit — is unchanged
    val pruned = (prebuilt, batchHashes) match {
      case (Some((fl, m)), _) =>
        graft.core.Bloom.pruneByFilter(keys, col("key"), fl, m)
      case (None, Some((b, m))) => bloomPrune(keys, col("key"), b,
        col("__h"), Some(m))
      case _ => keys
    }
    pruned
      .join(broadcast(committed), Seq("batch_id"), "left_semi")
      .groupBy("key").agg(min(col("id")).as("id"))
  }

  /** Accumulated window claims visible to a (re)run of `excludeBatch`:
    * minhash-committed batches only (the one authoritative marker — a
    * torn increment's claim rows never serve), minus the batch's own
    * prior attempt (the retry pre-batch view). Absent table ⇒ empty
    * claims (states built before the stage was enabled): the sem
    * stage's enable-from-batch-N semantics.
    */
  private def readWindowClaims(spark: SparkSession, stateDir: String,
                               excludeBatch: String,
                               batchWindows: Option[(DataFrame, Long)] =
                                 None): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$stateDir/windows")
    if (!fs(spark, stateDir).exists(p))
      spark.range(0).select(lit("").as("h"))
    else {
      val committed = Dedup.minhashCommitted(spark, s"$stateDir/minhash")
        .filter(col("batch_id") =!= excludeBatch)
      val claims = spark.read.parquet(s"$stateDir/windows")
      val pruned = batchWindows match {
        case Some((b, m)) => bloomPrune(claims, col("h"), b, col("h"),
          Some(m))
        case None => claims
      }
      pruned
        .join(broadcast(committed), Seq("batch_id"), "left_semi")
        .select("h")
    }
  }

  // ---- decontamination benchmark state family (r17 verdict #1) ----------
  // The benchmark-gram set used to be a CALLER argument only: an
  // increment handed no benchmark ran no decontamination gate, so a doc
  // the funnel REJECTED as contaminated could be resubmitted through a
  // benchmark-less increment and ADMITTED (the q176-pinned gap). At
  // 100 TB the benchmark set is operational state like every index
  // family: it persists under the state root and the increment gate
  // DEFAULTS to it. Layout: `decontam/grams` — (bench_key, gram) rows,
  // bench_key = md5 of the source benchmark doc's text (the provenance
  // retraction purges by), batch_id-partitioned; `decontam/meta` — the
  // gram size n re-stated per batch, written LAST as the family's OWN
  // commit marker (its writers — Recurate's rebuild, a standalone
  // eval-set registration — are not increments, so it cannot ride the
  // minhash marker). Reads take meta-committed batches only and require
  // one consistent n. Reference anchor: the de-live suite's principle
  // that staged data must be scrubbed before serving (db.py:342-348).

  /** The benchmark's distinct (bench_key, gram) rows at gram size `n`
    * — the persisted form of the funnel's broadcast side.
    */
  private def decontamGramRows(benchmark: DataFrame, benchTextCol: String,
                               n: Int): DataFrame =
    graft.core.Ops.widen(benchmark)
      .select(md5(col(benchTextCol).cast("string")).as("bench_key"),
        Dedup.normalizeWords(col(benchTextCol)).as("__w"))
      .select(col("bench_key"),
        explode(Curation.wordNgrams(col("__w"), n)).as("gram"))
      .distinct()

  /** Register (or replace, under the same `batchId`) a benchmark's
    * grams in the state's decontamination family. Grams land first,
    * the meta partition commits LAST — a torn write is invisible to
    * [[readDecontamGrams]]. A second benchmark registers under its own
    * batch id and the gate unions them (gram membership is a union
    * test).
    */
  def writeDecontamState(spark: SparkSession, stateDir: String,
                         benchmark: DataFrame, benchTextCol: String,
                         n: Int = 8, batchId: String = "base"): Unit = {
    require(n >= 1, s"writeDecontamState: n ($n)")
    require(batchId.nonEmpty && batchId != "__HIVE_DEFAULT_PARTITION__",
      s"writeDecontamState: invalid batch id '$batchId'")
    import spark.implicits._
    def w(df: DataFrame, path: String): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic").parquet(path)
    w(decontamGramRows(benchmark, benchTextCol, n),
      s"$stateDir/decontam/grams")
    w(Seq(n).toDF("n"), s"$stateDir/decontam/meta")
  }

  /** Read-side schema for `decontam/grams` — explicit so a ZERO-ROW
    * grams table (a benchmark whose docs are all shorter than n words
    * writes no part files) still reads as an empty gram set (a no-op
    * gate) instead of failing schema inference.
    */
  private val decontamGramsSchema = org.apache.spark.sql.types.StructType(
    Seq("bench_key", "gram", "batch_id").map(n =>
      org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.StringType)))

  /** The committed decontamination gram table (one `gram` column,
    * deduplicated across benchmarks) and its pinned gram size, or None
    * when the state has no committed decontam family.
    */
  def readDecontamGrams(spark: SparkSession,
                        stateDir: String): Option[(DataFrame, Int)] = {
    val metaP = new org.apache.hadoop.fs.Path(s"$stateDir/decontam/meta")
    if (!fs(spark, stateDir).exists(metaP)) None
    else {
      val meta = spark.read.parquet(metaP.toString)
      val ns = meta.select("n").distinct().collect()
      require(ns.length == 1,
        s"decontam family at $stateDir: inconsistent gram size across " +
          s"benchmark batches (${ns.length} distinct) — re-register " +
          "under one n")
      val committed = meta.select("batch_id").distinct()
      Some((spark.read.schema(decontamGramsSchema)
        .parquet(s"$stateDir/decontam/grams")
        .join(broadcast(committed), Seq("batch_id"), "left_semi")
        .select("gram").distinct(), ns.head.getInt(0)))
    }
  }

  /** Eval-set rotation: purge a retired benchmark's grams from the
    * family. Victim rows are keyed by the benchmark docs' text md5
    * (the provenance [[writeDecontamState]] recorded); only partitions
    * holding a victim rewrite (dynamic overwrite — emptied partitions
    * become zero-row schema-ful parquet, the [[Shards.retract]]
    * discipline); meta markers are untouched so family visibility
    * never changes. A gram SHARED with a still-registered benchmark
    * survives through that benchmark's own rows. Returns purged rows.
    */
  def retractDecontamBenchmark(spark: SparkSession, stateDir: String,
                               benchmark: DataFrame,
                               benchTextCol: String): Long = {
    val gramsPath = s"$stateDir/decontam/grams"
    require(fs(spark, stateDir).exists(
        new org.apache.hadoop.fs.Path(gramsPath)),
      s"retractDecontamBenchmark: no decontam family at $stateDir")
    val keys = graft.core.Ops.widen(benchmark)
      .select(md5(col(benchTextCol).cast("string")).as("bench_key"))
      .distinct().localCheckpoint(eager = true)
    val tbl = spark.read.schema(decontamGramsSchema).parquet(gramsPath)
    val hit = tbl.join(broadcast(keys), Seq("bench_key"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nPurged = hit.count()
      if (nPurged == 0L) 0L
      else {
        val affected = hit.select("batch_id").distinct()
          .localCheckpoint(eager = true)
        val keep = tbl
          .join(broadcast(affected), Seq("batch_id"), "left_semi")
          .join(broadcast(keys), Seq("bench_key"), "left_anti")
          .localCheckpoint(eager = true)
        keep.write.mode("overwrite").partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic").parquet(gramsPath)
        val emptied = affected.join(keep.select("batch_id").distinct(),
          Seq("batch_id"), "left_anti").collect()
        for (r <- emptied)
          keep.drop("batch_id").limit(0).write.mode("overwrite")
            .parquet(s"$gramsPath/batch_id=${r.getString(0)}")
        nPurged
      }
    } finally hit.unpersist()
  }

  def curateIncrement(batch: DataFrame, idCol: String, textCol: String,
                      stateDir: String, batchId: String,
                      cfg: IncrementConfig = IncrementConfig(),
                      // the funnel's external-model gates, same shapes:
                      // a trained Classifier.Model for the
                      // minClassifierPE6 gate, a parsed ARPA model for
                      // maxArpaE4, and a (frame, textCol) benchmark for
                      // decontamination — each None = stage off
                      classifierModel: Option[
                        graft.operators.Classifier.Model] = None,
                      arpaModel: Option[
                        graft.operators.TextStats.ArpaModel] = None,
                      benchmark: Option[(DataFrame, String)] = None)
      : IncrementResult = {
    require(batchId.nonEmpty && batchId != "base" &&
        batchId != "__HIVE_DEFAULT_PARTITION__",
      s"curateIncrement: invalid batch id '$batchId'")
    val spark = batch.sparkSession
    requireBatchNotFolded(spark, stateDir, batchId, "curateIncrement")
    import spark.implicits._
    writeFamilySentinel(spark, stateDir, "minhash")
    val haveState = stateExists(spark, stateDir)
    val counts = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val led = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def stage(name: String, c: Long): Unit = counts += ((name, c))
    def rejectPiece(ids: DataFrame, reason: String): Unit =
      led += ids.select(col("id").cast("long").as("id"),
          lit(false).as("admitted"), lit(reason).as("reason"),
          coalesce(col("__dup_of"), col("id")).cast("long").as("dup_of"))
        .localCheckpoint(eager = true)
    def rejectAnti(prev: DataFrame, next: DataFrame,
                   reason: String): Unit =
      rejectPiece(prev.select(col("id"))
        .join(next.select(col("id")), Seq("id"), "left_anti")
        .withColumn("__dup_of", lit(null).cast("long")), reason)

    // ---- stateless gates (the batch funnel's exprs verbatim) -----------
    var input = graft.core.Ops.widen(batch)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .localCheckpoint(eager = true)
    stage("ingest", input.count())
    // effective Bloom dial: manual bits win; otherwise the auto
    // decision from committed-state bytes vs batch rows (r16 #3)
    val effBloomBits = cfg.stateBloomBits.orElse(
      if (cfg.stateBloomAuto && haveState)
        decideStateBloom(spark, stateDir, counts.head._2)
      else None)
    if (cfg.c4Clean) {
      val pre = input
      input = Curation.c4Clean(input, "id", "text")
        .filter(col("keep"))
        .select(col("id"), col("cleaned_text").as("text"))
        .localCheckpoint(eager = true)
      stage("c4_clean", input.count())
      rejectAnti(pre, input, "c4")
    }
    cfg.langIdModel.foreach(m => require(
      cfg.keepLangs.subsetOf(m.langs.toSet),
      s"curateIncrement: keepLangs ${cfg.keepLangs} not all in the " +
        s"langid model's languages ${m.langs}"))
    val scored = TextStats.langGateCols(
      input.withColumn("__w", Dedup.normalizeWords(col("text"))),
      col("text"), col("__w"), cfg.langIdModel)
    var quality = scored
      .withColumn("__q", TextStats.qualityScore(col("text"), col("__w")))
      .filter(col("__q") >= cfg.minQualityE4 &&
        col("__lang").isInCollection(cfg.keepLangs))
    // optional Gopher-rule gate — same pass and same "quality" reject
    // reason as the funnel, reusing the words array
    for (g <- cfg.gopherRules)
      quality = quality.filter(
        TextStats.gopherFlags(col("text"), col("__w"), g)
          .getField("pass"))
    var filtered = quality
      .select(col("id"), col("text"))
      .localCheckpoint(eager = true)
    stage("quality", filtered.count())
    rejectAnti(input, filtered, "quality")
    for (rc <- cfg.repetition) {
      val pre = filtered
      filtered = pre.join(
          TextStats.repetitionSignals(pre, "id", "text", rc)
            .filter(col("rep_pass")).select(col("id")), Seq("id"))
        .localCheckpoint(eager = true)
      stage("repetition", filtered.count())
      rejectAnti(pre, filtered, "repetition")
    }
    // ---- the funnel's external-model gates, in its stage order ---------
    for (m <- classifierModel) {
      val pre = filtered
      filtered = pre.join(
          graft.operators.Classifier.score(pre, "id", "text", m)
            .filter(col("p_e6") >= cfg.minClassifierPE6)
            .select(col("id")), Seq("id"))
        .localCheckpoint(eager = true)
      stage("classifier_gate", filtered.count())
      rejectAnti(pre, filtered, "classifier")
    }
    for (bound <- cfg.maxArpaE4; m <- arpaModel) {
      val pre = filtered
      val tabs = TextStats.arpaTablesN(spark, m)
      filtered = pre.join(
          TextStats.arpaCrossEntropyN(pre, "id", "text", tabs, m.unkLp)
            .filter(col("arpa_e4") <= bound)
            .select(col("id")), Seq("id"))
        .localCheckpoint(eager = true)
      stage("arpa_gate", filtered.count())
      rejectAnti(pre, filtered, "arpa")
    }
    // ---- optional intra-doc line dedup (rewrite, never a reject) --------
    if (cfg.dedupLinesWithinDocs) {
      filtered = Curation.dedupLines(filtered, "id", "text")
        .select(col("id"), col("cleaned_text").as("text"))
        .localCheckpoint(eager = true)
      stage("line_dedup", filtered.count())
    }

    // ---- optional SUBSTRING-DEDUP stage (the funnel's window_dedup,
    // against accumulated claims): spans the corpus already owns are
    // removed, then the within-batch canonical rule — docs are
    // REWRITTEN (normalized token stream), never rejected, so the
    // ledger is untouched here; the count is pool size at the stage
    for (w <- cfg.dedupWindowsW) {
      val claims =
        if (!haveState) None
        else Some(readWindowClaims(spark, stateDir, batchId,
          effBloomBits.map(m =>
            (Curation.windowClaims(filtered, "id", "text", w)
              .select("h"), m))))
      val cleaned = claims match {
        case None =>
          Curation.removeDuplicateSpans(filtered, "id", "text", w)
        case Some(c) =>
          Curation.removeDuplicateSpansVsClaims(filtered, "id", "text",
            w, c)
      }
      filtered = cleaned
        .select(col("id"), col("cleaned_text").as("text"))
        .localCheckpoint(eager = true)
      stage("window_dedup", filtered.count())
    }

    // ---- exact dedup: against state, then within batch -----------------
    val hashed = filtered.withColumn("__h", md5(col("text")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // ONE shared filter-build pass for the exact-key AND band-key
    // prunes (r16 #3's amortization): both key sets derive from the
    // final batch text, so one buildMany job replaces two per-family
    // builds. The band filter is built over the PRE-exact-dedup pool —
    // a superset of the probing `kept` keys, so pruning stays
    // conservative-correct. The window-claims filter above cannot
    // join this pass (its keys hash the PRE-rewrite text).
    val sharedFilters: Option[(Map[String, Array[Long]], Long)] =
      effBloomBits.filter(_ => haveState).map { m =>
        val (sb, srp) = Dedup.readMinhashMeta(spark,
          s"$stateDir/minhash")
        // normalizeWords PROJECTED as its own attribute before the
        // shingle window (the shingleSets two-step discipline):
        // shingles3 references its input at three offsets inside a
        // transform lambda, so handing it the raw regex+split pipeline
        // would re-evaluate the normalization per shingle element —
        // the O(len²)-per-row trap shingleSets documents
        val keyed = hashed
          .select(col("__h"), Dedup.normalizeWords(col("text")).as("__w"))
          .select(array(col("__h")).as("__ek"),
            Dedup.shingleHashes(Dedup.shingles3(col("__w"))).as("__hv"))
          .select(col("__ek"),
            Dedup.bandKeyArrayFromHv(col("__hv"), sb, srp).as("__bk"))
        (graft.core.Bloom.buildMany(keyed,
          Seq("exact" -> col("__ek"), "bands" -> col("__bk")), m), m)
      }
    val afterExact =
      if (!haveState) hashed
      else {
        val stateKeys = readExactKeys(spark, stateDir, batchId,
          prebuilt = sharedFilters.map { case (fm, m) =>
            (fm("exact"), m) })
        val hits = hashed.join(
            stateKeys.select(col("key").as("__h"),
              col("id").as("__dup_of")), Seq("__h"))
          .localCheckpoint(eager = true)
        rejectPiece(hits.select(col("id"), col("__dup_of")), "exact_dup")
        hashed.join(hits.select("id"), Seq("id"), "left_anti")
      }
    val keptH = graft.core.Ops
      .latestPerGroup(afterExact, Seq("__h"), Seq(col("id").asc))
      .persist(StorageLevel.MEMORY_AND_DISK)
    rejectPiece(afterExact.select(col("id"), col("__h"))
      .join(keptH.select(col("__h"), col("id").as("__dup_of")), Seq("__h"))
      .filter(col("id") =!= col("__dup_of"))
      .select(col("id"), col("__dup_of")), "exact_dup")
    val kept = keptH.drop("__h").localCheckpoint(eager = true)
    stage("exact_dedup", kept.count())
    hashed.unpersist(); keptH.unpersist()

    // ---- near-dup: against state (min old parent), then within batch ---
    val afterOld =
      if (!haveState) kept
      else {
        val pairsM = Dedup.nearDupAgainstIndex(spark,
          s"$stateDir/minhash", kept, "id", "text",
          excludeBatch = Some(batchId),
          bloomBits = effBloomBits,
          bandFilter = sharedFilters.map(_._1("bands")))
        val hits = pairsM.df
          .filter(col("jacc_e4") >= cfg.nearDupThresholdE4)
          .groupBy("id_new").agg(min(col("id_old")).as("__dup_of"))
          .select(col("id_new").as("id"), col("__dup_of"))
          .localCheckpoint(eager = true)
        pairsM.close()
        rejectPiece(hits, "near_dup")
        kept.join(hits.select("id"), Seq("id"), "left_anti")
          .localCheckpoint(eager = true)
      }
    val (pairsM, bandRows) =
      Dedup.minhashNearDupPairsBanded(afterOld, "id", "text")
    val edges = pairsM.df.filter(col("jacc_e4") >= cfg.nearDupThresholdE4)
    val compM = Dedup.connectedComponentsManaged(edges)
    val victims = compM.df.filter(col("id") =!= col("label"))
      .select(col("id"), col("label").as("__dup_of"))
      .localCheckpoint(eager = true)
    // band-bucket skew metric (VERDICT r17 #7): the hottest LSH bucket
    // population among the batch's own band rows — read off the pairs
    // job's already-persisted bands before close(), one cheap
    // aggregate, no plan change. A mass-duplicated boilerplate band
    // shows here as max ≈ batch size BEFORE it skews a corpus-scale
    // shuffle; the funnel-rate time series carries it per batch.
    val bandMax = Dedup.bandBucketStats(bandRows)
      .select(col("max_bucket")).head().getLong(0)
    compM.close(); pairsM.close()
    rejectPiece(victims, "near_dup")
    val afterMh = afterOld
      .join(victims.select("id"), Seq("id"), "left_anti")
      .localCheckpoint(eager = true)
    stage("near_dup", afterMh.count())
    stage("band_bucket_max", bandMax)

    // ---- optional SEMANTIC stage (the batch funnel's sem_dup gate) ------
    // against the sem SUB-state (reads restricted to minhash-committed
    // batches — the increment's one authoritative marker), then within
    // batch over the frozen centroid set
    val semPieces = cfg.semDedupThresholdE4.map { th =>
      val semDir = s"$stateDir/sem"
      // the sem sub-state counts as existing only when the AUTHORITATIVE
      // minhash marker does too: a first increment that died between its
      // sem write and its minhash marker must RE-BOOTSTRAP on retry
      // (static overwrite replaces the torn sem partitions) — reading
      // the torn sub-state would crash on the missing minhash path
      val haveSem = haveState && semStateExists(spark, stateDir)
      // dial consistency: an existing sem sub-state PINS its dials — the
      // within-batch stage must use the same (centroid_every, nassign)
      // [and dim] as the against-state reads, or a caller passing a
      // different cfg would get silently inconsistent within-batch vs
      // against-state recall (the banding path's loud-mismatch rule,
      // applied here)
      val (semCe, semNa) =
        if (!haveSem) (cfg.semCentroidEvery, cfg.semNassign)
        else {
          val (ce, na, dim) = Curation.readSemMeta(spark, s"$stateDir/sem")
          require(dim == 0 || dim == cfg.semDim,
            s"curateIncrement: semDim ${cfg.semDim} != pinned sem " +
              s"sub-state dim $dim at $stateDir/sem")
          (ce, na)
        }
      val nonzero = TextStats.hashEmbedVectors(afterMh, "id", "text",
          cfg.semDim)
        .filter(expr("aggregate(v, 0D, (a, x) -> a + x * x)") > lit(0.0))
        .localCheckpoint(eager = true)
      val centroids =
        if (haveSem)
          spark.read.parquet(s"$semDir/centroids")
            .select(col("cid").as("id"), col("cv").as("v"))
        else Curation.semCentroidSample(nonzero.select("id", "v"),
          semCe).localCheckpoint(eager = true)
      val afterSemState =
        if (!haveSem) afterMh
        else {
          val restrict = Dedup
            .minhashCommitted(spark, s"$stateDir/minhash")
          val hits = Curation.semNearDupAgainstIndex(spark, semDir,
              nonzero.select("id", "v"), th,
              excludeBatch = Some(batchId), restrictTo = Some(restrict),
              bloomBits = effBloomBits)
            .groupBy("id_new").agg(min(col("id_old")).as("__dup_of"))
            .select(col("id_new").as("id"), col("__dup_of"))
            .localCheckpoint(eager = true)
          rejectPiece(hits, "sem_dup")
          afterMh.join(hits.select("id"), Seq("id"), "left_anti")
            .localCheckpoint(eager = true)
        }
      val survNonzero = nonzero
        .join(afterSemState.select("id"), Seq("id"), "left_semi")
      val pm = graft.operators.Similarity.ivfNearDupPairsManaged(
        survNonzero.select("id", "v"), centroids, th / 10000.0,
        semNa)
      val cm = Dedup.connectedComponentsManaged(
        pm.df.select("idA", "idB"))
      val svict = cm.df.filter(col("id") =!= col("label"))
        .select(col("id"), col("label").as("__dup_of"))
        .localCheckpoint(eager = true)
      cm.close(); pm.close()
      rejectPiece(svict, "sem_dup")
      val adm = afterSemState
        .join(svict.select("id"), Seq("id"), "left_anti")
        .localCheckpoint(eager = true)
      stage("semantic", adm.count())
      (adm, nonzero, centroids, haveSem)
    }
    // ---- benchmark decontamination (the funnel's terminal gate, same
    // position: after every dedup stage, before admission). Gram
    // source, in precedence order: the CALLER's benchmark frame when
    // given (gram size cfg.decontamGramN — the legacy explicit shape),
    // else the state's PERSISTED decontam family (gram size pinned by
    // its meta) — so a benchmark-less increment can no longer re-admit
    // content the funnel rejected (r17 verdict #1; the q176-pinned gap,
    // now closed by default whenever the state carries the family).
    // Neither present = gate off.
    val afterSem = semPieces.map(_._1).getOrElse(afterMh)
    def gateDecontam(flags: DataFrame): DataFrame = {
      val clean = afterSem.join(
          flags.filter(!col("contaminated")).select(col("id")),
          Seq("id"))
        .localCheckpoint(eager = true)
      rejectPiece(flags.filter(col("contaminated")).select(col("id"))
        .withColumn("__dup_of", lit(null).cast("long")),
        "decontaminated")
      stage("decontaminated", clean.count())
      clean
    }
    val admitted = benchmark match {
      case Some((bench, btCol)) =>
        gateDecontam(Curation.contaminationFlags(afterSem, "id", "text",
          bench, btCol, cfg.decontamGramN))
      case None =>
        readDecontamGrams(spark, stateDir) match {
          case None => afterSem
          case Some((grams, n)) =>
            gateDecontam(Curation.contaminationFlagsVsGrams(afterSem,
              "id", "text", grams, n))
        }
    }
    led += admitted.select(col("id"), lit(true).as("admitted"),
        lit("admitted").as("reason"), col("id").as("dup_of"))
      .localCheckpoint(eager = true)

    // ---- persist: keys → ledger → metrics → (sem sub-state) →
    // minhash META (the marker, LAST) --------------------------------------
    val ledger = led.reduce(_ unionByName _)
      .select(col("id"), col("admitted"), col("reason"), col("dup_of"))
      .localCheckpoint(eager = true)
    // one ledger row per input doc — loud, not assumed
    val nLed = ledger.count()
    val nIn = counts.head._2
    require(nLed == nIn,
      s"curateIncrement: ledger rows $nLed != batch docs $nIn")
    def writer(df: DataFrame, path: String): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic").parquet(path)
    if (haveState || admitted.head(1).nonEmpty) {
      writeExactKeys(admitted, s"$stateDir/exact", batchId)
      writer(ledger, s"$stateDir/ledger")
      writer(counts.toSeq.toDF("stage", "rows"), s"$stateDir/metrics")
      semPieces.foreach { case (_, nonzero, centroids, haveSem) =>
        // semi-join the FINAL admitted set, not the sem stage's: a doc
        // decontaminated after sem must not leave vectors in the state
        val admNonzero = nonzero
          .join(admitted.select("id"), Seq("id"), "left_semi")
          .select("id", "v")
        if (haveSem)
          Curation.appendSemVectors(spark, s"$stateDir/sem", admNonzero,
            batchId)
        else
          Curation.writeSemIndex(admNonzero, centroids, s"$stateDir/sem",
            cfg.semCentroidEvery, cfg.semNassign, batchId)
      }
      // window claims of the admitted docs' FINAL text — exactly the
      // content entering the corpus; lands BEFORE the minhash marker
      // (same dynamic-partition retry contract as every state table)
      for (w <- cfg.dedupWindowsW)
        writer(Curation.windowClaims(admitted, "id", "text", w),
          s"$stateDir/windows")
      if (haveState)
        Dedup.appendToMinhashIndex(spark, s"$stateDir/minhash", admitted,
          "id", "text", batchId)
      else
        Dedup.writeMinhashParts(admitted, "id", "text",
          s"$stateDir/minhash", cfg.bands, cfg.rowsPerBand,
          overwrite = true, batchId = batchId)
    }
    IncrementResult(ledger, admitted, counts.toSeq)
  }

  /** The committed per-batch verdict ledger (batch_id, id, admitted,
    * reason, dup_of) — torn increments invisible (marker-committed set).
    */
  def readLedger(spark: SparkSession, stateDir: String): DataFrame =
    committedTable(spark, stateDir, "ledger")

  /** The committed funnel-rate time series (batch_id, stage, rows) —
    * what a maintenance decision reads to spot drift in admit rates.
    */
  def readMetrics(spark: SparkSession, stateDir: String): DataFrame =
    committedTable(spark, stateDir, "metrics")

  /** A state table restricted to committed batches — the commit-marker
    * index is whichever modality's lives here (text: minhash meta;
    * image: phash meta; audio: audio meta; video: video meta).
    */
  private def committedTable(spark: SparkSession, stateDir: String,
                             sub: String): DataFrame = {
    val f = fs(spark, stateDir)
    val marker = readFamilySentinel(spark, stateDir) match {
      case Some(fam) =>
        // the sentinel names the authoritative family; its meta absent
        // means NOTHING is committed yet (a torn bootstrap) — serve the
        // empty committed set, never another family's marker
        val p = s"$stateDir/$fam/meta"
        if (f.exists(new org.apache.hadoop.fs.Path(p))) Some(p) else None
      case None =>
        // legacy states (pre-sentinel): marker-discovery order
        Some(Seq("minhash", "phash", "audio", "video", "sem")
          .map(m => s"$stateDir/$m/meta")
          .find(p => f.exists(new org.apache.hadoop.fs.Path(p)))
          .getOrElse(throw new IllegalStateException(
            s"no increment state (minhash/phash/audio/video/sem meta) " +
              s"at $stateDir")))
    }
    val tbl = spark.read.parquet(s"$stateDir/$sub")
    marker match {
      case None => tbl.limit(0)
      case Some(m) =>
        val committed = spark.read.parquet(m)
          .select("batch_id").distinct()
        tbl.join(broadcast(committed), Seq("batch_id"), "left_semi")
    }
  }

  // ---- the IMAGE twin: batch vs persisted pHash + exact-payload state ----

  /** [[IncrementConfig]]'s image sibling — the [[CurateImages
    * .ImageCurateConfig]] gate dials.
    */
  case class ImageIncrementConfig(maxPixels: Long = 64L << 20,
                                  maxHamming: Int = 3, nBands: Int = 4,
                                  // [[IncrementConfig.stateBloomBits]]:
                                  // prunes the exact-key and pHash band
                                  // state scans batch-proportional
                                  stateBloomBits: Option[Long] = None,
                                  // optional SEMANTIC stage: SemDeDup
                                  // over block-mean embeddings
                                  // ([[graft.operators.Multimodal
                                  // .imageEmbeddings]]) against a sem
                                  // sub-state under the pHash marker —
                                  // the text increment's
                                  // semDedupThresholdE4 pattern, incl.
                                  // its enable-from-batch-N semantics
                                  // (docs admitted before enablement
                                  // were never embedded)
                                  semDedupThresholdE4: Option[Long] = None,
                                  semGrid: Int = 8,
                                  semCentroidEvery: Int = 25,
                                  semNassign: Int = 2,
                                  // [[IncrementConfig.stateBloomAuto]]
                                  stateBloomAuto: Boolean = false)

  /** Image state exists iff the pHash index has a meta commit marker. */
  def imageStateExists(spark: SparkSession, stateDir: String): Boolean =
    fs(spark, stateDir).exists(
      new org.apache.hadoop.fs.Path(s"$stateDir/phash/meta"))

  /** Seed image state from an ALREADY-CURATED media corpus: exact
    * payload-md5 keys + pHash index under batch id "base" (undecodable
    * payloads excluded — they can never pair), plus the sem sub-state
    * when `cfg` enables the semantic stage.
    */
  def initImageStateFromCurated(spark: SparkSession, stateDir: String,
                                curated: org.apache.spark.sql.Dataset[
                                  graft.operators.Multimodal.MediaRecord],
                                cfg: ImageIncrementConfig =
                                  ImageIncrementConfig()): Unit = {
    require(!imageStateExists(spark, stateDir),
      s"initImageStateFromCurated: state already exists at $stateDir")
    writeFamilySentinel(spark, stateDir, "phash")
    val hashed = hashAndSign(curated, cfg.maxPixels)
      .filter(col("phash") =!= -1L)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      writeExactKeyRows(hashed.select(col("__md5").as("key"), col("id")),
        s"$stateDir/exact", "base")
      for (_ <- cfg.semDedupThresholdE4) {
        val nonzero = graft.operators.Multimodal
          .imageEmbeddings(curated, cfg.semGrid,
            maxPixels = cfg.maxPixels)
          .filter(expr("aggregate(v, 0D, (a, x) -> a + x * x)") >
            lit(0.0))
          .localCheckpoint(eager = true)
        Curation.writeSemIndex(nonzero,
          Curation.semCentroidSample(nonzero, cfg.semCentroidEvery),
          s"$stateDir/sem", cfg.semCentroidEvery, cfg.semNassign, "base")
      }
      // pHash index LAST — its meta is the family marker
      graft.operators.Multimodal.writePhashIndex(curated,
        s"$stateDir/phash", cfg.nBands)
    } finally hashed.unpersist()
  }

  /** Seed AUDIO state from an ALREADY-CURATED media corpus — the audio
    * member of the [[initStateFromCurated]] family (r16 verdict #2's
    * "generalize"): exact payload-md5 keys + fingerprint index under
    * batch id "base" (unprintable clips excluded — they can never
    * pair), plus the sem sub-state when the config enables the
    * semantic stage, so the first [[curateAudioIncrement]] against the
    * seeded root dedups semantically against the full history. The
    * caller asserts the corpus is internally deduplicated.
    */
  def initAudioStateFromCurated(spark: SparkSession, stateDir: String,
                                curated: org.apache.spark.sql.Dataset[
                                  graft.operators.Multimodal.MediaRecord],
                                cfg: AudioIncrementConfig =
                                  AudioIncrementConfig()): Unit = {
    import spark.implicits._
    require(!audioStateExists(spark, stateDir),
      s"initAudioStateFromCurated: state already exists at $stateDir")
    writeFamilySentinel(spark, stateDir, "audio")
    val printable = graft.operators.Multimodal
      .audioFingerprints(curated, cfg.windowFrames, cfg.k, cfg.stride,
        cfg.quantE4).toDF()
      .select(col("media_id").as("id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val keys = curated.mapPartitions { it =>
          val dg = java.security.MessageDigest.getInstance("MD5")
          it.map { r =>
            dg.reset()
            (r.media_id,
              dg.digest(r.media).map(b => f"${b & 0xff}%02x").mkString)
          }
        }.toDF("id", "key")
        .join(printable, Seq("id"), "left_semi")
      writeExactKeyRows(keys.select(col("key"), col("id")),
        s"$stateDir/exact", "base")
      for (_ <- cfg.semDedupThresholdE4) {
        val nonzero = graft.operators.Multimodal
          .audioEmbeddings(curated, cfg.semDim, cfg.windowFrames)
          .filter(expr("aggregate(v, 0D, (a, x) -> a + x * x)") >
            lit(0.0))
          .localCheckpoint(eager = true)
        Curation.writeSemIndex(nonzero,
          Curation.semCentroidSample(nonzero, cfg.semCentroidEvery),
          s"$stateDir/sem", cfg.semCentroidEvery, cfg.semNassign, "base")
      }
      // fingerprint index LAST — its meta is the family marker
      graft.operators.Multimodal.writeAudioIndex(curated,
        s"$stateDir/audio", cfg.windowFrames, cfg.k, cfg.stride,
        cfg.quantE4)
    } finally printable.unpersist()
  }

  /** Seed VIDEO state from an ALREADY-CURATED media corpus — the video
    * member of the [[initStateFromCurated]] family: exact payload-md5
    * keys + keyframe index under batch id "base" (frameless clips
    * excluded), plus the sem sub-state when enabled.
    */
  def initVideoStateFromCurated(spark: SparkSession, stateDir: String,
                                curated: org.apache.spark.sql.Dataset[
                                  graft.operators.Multimodal.MediaRecord],
                                cfg: VideoIncrementConfig =
                                  VideoIncrementConfig()): Unit = {
    import spark.implicits._
    require(!videoStateExists(spark, stateDir),
      s"initVideoStateFromCurated: state already exists at $stateDir")
    writeFamilySentinel(spark, stateDir, "video")
    val framed = graft.operators.Multimodal.videoKeyframePhash(curated)
      .toDF()
      .filter(col("phash") =!= -1L && col("frame_idx") >= 0L)
      .select(col("media_id").as("id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val keys = curated.mapPartitions { it =>
          val dg = java.security.MessageDigest.getInstance("MD5")
          it.map { r =>
            dg.reset()
            (r.media_id,
              dg.digest(r.media).map(b => f"${b & 0xff}%02x").mkString)
          }
        }.toDF("id", "key")
        .join(framed, Seq("id"), "left_semi")
      writeExactKeyRows(keys.select(col("key"), col("id")),
        s"$stateDir/exact", "base")
      for (_ <- cfg.semDedupThresholdE4) {
        val nonzero = graft.operators.Multimodal
          .videoEmbeddings(curated, cfg.semGrid)
          .filter(expr("aggregate(v, 0D, (a, x) -> a + x * x)") >
            lit(0.0))
          .localCheckpoint(eager = true)
        Curation.writeSemIndex(nonzero,
          Curation.semCentroidSample(nonzero, cfg.semCentroidEvery),
          s"$stateDir/sem", cfg.semCentroidEvery, cfg.semNassign, "base")
      }
      // keyframe index LAST — its meta is the family marker
      graft.operators.Multimodal.writeVideoIndex(curated,
        s"$stateDir/video", cfg.nBands)
    } finally framed.unpersist()
  }

  /** Seed EMBEDDING state from an ALREADY-CURATED (id, v) corpus — the
    * semantic member of the [[initStateFromCurated]] family: e6
    * fixed-point exact keys + the sem index (centroids drawn by the
    * replayable md5 rule from the corpus's non-zero vectors, pinned
    * for every later [[curateEmbeddingIncrement]]) under batch "base".
    */
  def initSemStateFromCurated(spark: SparkSession, stateDir: String,
                              curated: DataFrame,
                              cfg: EmbeddingIncrementConfig =
                                EmbeddingIncrementConfig()): Unit = {
    require(!semStateExists(spark, stateDir),
      s"initSemStateFromCurated: state already exists at $stateDir")
    writeFamilySentinel(spark, stateDir, "sem")
    val keyed = graft.core.Ops.widen(curated)
      .select(col("id").cast("long").as("id"), col("v"))
      .withColumn("__md5", md5(concat_ws(",",
        transform(col("v"),
          x => graft.core.Ops.fixedPoint(x, 6).cast("string")))))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      writeExactKeyRows(
        keyed.select(col("__md5").as("key"), col("id")),
        s"$stateDir/exact", "base")
      val nonzero = keyed
        .filter(expr("aggregate(v, 0D, (a, x) -> a + x * x)") > lit(0.0))
        .select("id", "v")
        .localCheckpoint(eager = true)
      // sem index LAST — its meta is the family marker
      Curation.writeSemIndex(nonzero,
        Curation.semCentroidSample(nonzero, cfg.centroidEvery),
        s"$stateDir/sem", cfg.centroidEvery, cfg.nassign, "base")
    } finally keyed.unpersist()
  }

  /** One decode pass: (id, __md5 of payload bytes, phash). */
  private def hashAndSign(media: org.apache.spark.sql.Dataset[
      graft.operators.Multimodal.MediaRecord], maxPixels: Long)
      : DataFrame = {
    val sess = media.sparkSession
    import sess.implicits._
    media.mapPartitions { it =>
        val d = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          d.reset()
          (r.media_id,
            d.digest(r.media).map(b => f"${b & 0xff}%02x").mkString)
        }
      }.toDF("id", "__md5")
      .join(graft.operators.Multimodal
          .imagePHash(media, maxPixels = maxPixels).toDF()
          .select(col("media_id").as("id"), col("phash")),
        Seq("id"))
  }

  /** The image increment: a new media batch curated against the
    * accumulated pHash + exact-payload state — decode ONCE, verdicts in
    * the [[CurateImages.run]] order (undecodable → exact vs state →
    * exact within batch → pHash near-dup vs state with min-old-parent →
    * within-batch components), admitted signatures appended under
    * `batchId` with the pHash META partition as the increment's commit
    * marker (keys/ledger/metrics commit before it). Retry contract and
    * torn-increment invisibility as in [[curateIncrement]].
    */
  def curateImageIncrement(batch: org.apache.spark.sql.Dataset[
        graft.operators.Multimodal.MediaRecord],
      stateDir: String, batchId: String,
      cfg: ImageIncrementConfig = ImageIncrementConfig())
      : IncrementResult = {
    require(batchId.nonEmpty && batchId != "base" &&
        batchId != "__HIVE_DEFAULT_PARTITION__",
      s"curateImageIncrement: invalid batch id '$batchId'")
    val spark = batch.sparkSession
    requireBatchNotFolded(spark, stateDir, batchId, "curateImageIncrement")
    import spark.implicits._
    writeFamilySentinel(spark, stateDir, "phash")
    val haveState = imageStateExists(spark, stateDir)
    val counts = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val led = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def stage(name: String, c: Long): Unit = counts += ((name, c))
    def rejectPiece(ids: DataFrame, reason: String): Unit =
      led += ids.select(col("id").cast("long").as("id"),
          lit(false).as("admitted"), lit(reason).as("reason"),
          coalesce(col("__dup_of"), col("id")).cast("long").as("dup_of"))
        .localCheckpoint(eager = true)

    val hashed = hashAndSign(batch, cfg.maxPixels)
      .persist(StorageLevel.MEMORY_AND_DISK)
    stage("ingest", hashed.count())
    // effective Bloom dial (manual bits win; see IncrementConfig)
    val effBloomBits = cfg.stateBloomBits.orElse(
      if (cfg.stateBloomAuto && haveState)
        decideStateBloom(spark, stateDir, counts.head._2)
      else None)
    rejectPiece(hashed.filter(col("phash") === -1L)
      .select(col("id"), lit(null).cast("long").as("__dup_of")),
      "undecodable")
    val decoded = hashed.filter(col("phash") =!= -1L)
    stage("decode", decoded.count())

    // exact payload dedup: against state, then within batch
    val afterExactState =
      if (!haveState) decoded
      else {
        val stateKeys = readImageExactKeys(spark, stateDir, batchId,
          effBloomBits.map(m => (decoded.select("__md5"), m)))
        val hits = decoded.join(
            stateKeys.select(col("key").as("__md5"),
              col("id").as("__dup_of")), Seq("__md5"))
          .localCheckpoint(eager = true)
        rejectPiece(hits.select(col("id"), col("__dup_of")), "exact_dup")
        decoded.join(hits.select("id"), Seq("id"), "left_anti")
      }
    val keeper = afterExactState.groupBy("__md5")
      .agg(min(col("id")).as("__keep"))
    val withKeep = afterExactState.join(keeper, Seq("__md5"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    rejectPiece(withKeep.filter(col("id") =!= col("__keep"))
      .select(col("id"), col("__keep").as("__dup_of")), "exact_dup")
    val exact = withKeep.filter(col("id") === col("__keep"))
      .select("id", "__md5", "phash").localCheckpoint(eager = true)
    stage("exact_dedup", exact.count())
    hashed.unpersist(); withKeep.unpersist()

    // pHash near-dup: against state (min old parent), then within batch
    val afterOld =
      if (!haveState) exact
      else {
        val hits = graft.operators.Multimodal
          .phashSigsNearDupAgainstIndex(spark, s"$stateDir/phash",
            exact.select(col("id").as("id_new"), col("phash")),
            cfg.maxHamming, excludeBatch = Some(batchId),
            bloomBits = effBloomBits)
          .groupBy("id_new").agg(min(col("id_old")).as("__dup_of"))
          .select(col("id_new").as("id"), col("__dup_of"))
          .localCheckpoint(eager = true)
        rejectPiece(hits, "near_dup")
        exact.join(hits.select("id"), Seq("id"), "left_anti")
          .localCheckpoint(eager = true)
      }
    val pairsM = graft.operators.Multimodal.phashBandNearDupPairsOf(
      afterOld.select(col("id").as("media_id"), col("phash").as("ahash")),
      cfg.maxHamming, cfg.nBands)
    val compM = Dedup.connectedComponentsManaged(
      pairsM.df.select(col("idA"), col("idB")))
    val victims = compM.df.filter(col("id") =!= col("label"))
      .select(col("id"), col("label").as("__dup_of"))
      .localCheckpoint(eager = true)
    compM.close(); pairsM.close()
    rejectPiece(victims, "near_dup")
    val afterMh = afterOld
      .join(victims.select("id"), Seq("id"), "left_anti")
      .localCheckpoint(eager = true)
    stage("near_dup", afterMh.count())

    // ---- optional SEMANTIC stage: SemDeDup over block-mean embeddings
    // against a sem SUB-state (reads restricted to pHash-committed
    // batches — the increment's one authoritative marker), then within
    // batch — the text increment's sem pattern, image modality
    val semPieces = cfg.semDedupThresholdE4.map { th =>
      val semDir = s"$stateDir/sem"
      val haveSem = haveState && fs(spark, stateDir).exists(
        new org.apache.hadoop.fs.Path(s"$semDir/meta"))
      val dim = cfg.semGrid * cfg.semGrid
      val (semCe, semNa) =
        if (!haveSem) (cfg.semCentroidEvery, cfg.semNassign)
        else {
          val (ce, na, pdim) = Curation.readSemMeta(spark, semDir)
          require(pdim == 0 || pdim == dim,
            s"curateImageIncrement: semGrid ${cfg.semGrid} (dim $dim) " +
              s"!= pinned sem sub-state dim $pdim at $semDir")
          (ce, na)
        }
      // embed ONLY the surviving pool (never re-decode rejects)
      val survRecs = batch.toDF()
        .join(afterMh.select(col("id").as("media_id")), Seq("media_id"),
          "left_semi")
        .as[graft.operators.Multimodal.MediaRecord]
      val nonzero = graft.operators.Multimodal
        .imageEmbeddings(survRecs, cfg.semGrid, maxPixels = cfg.maxPixels)
        .filter(expr("aggregate(v, 0D, (a, x) -> a + x * x)") > lit(0.0))
        .localCheckpoint(eager = true)
      val centroids =
        if (haveSem)
          spark.read.parquet(s"$semDir/centroids")
            .select(col("cid").as("id"), col("cv").as("v"))
        else Curation.semCentroidSample(nonzero.select("id", "v"),
          semCe).localCheckpoint(eager = true)
      val afterSemState =
        if (!haveSem) afterMh
        else {
          val restrict = spark.read.parquet(s"$stateDir/phash/meta")
            .select("batch_id").distinct()
          val hits = Curation.semNearDupAgainstIndex(spark, semDir,
              nonzero.select("id", "v"), th,
              excludeBatch = Some(batchId), restrictTo = Some(restrict),
              bloomBits = effBloomBits)
            .groupBy("id_new").agg(min(col("id_old")).as("__dup_of"))
            .select(col("id_new").as("id"), col("__dup_of"))
            .localCheckpoint(eager = true)
          rejectPiece(hits, "sem_dup")
          afterMh.join(hits.select("id"), Seq("id"), "left_anti")
            .localCheckpoint(eager = true)
        }
      val survNonzero = nonzero
        .join(afterSemState.select("id"), Seq("id"), "left_semi")
      val pm = graft.operators.Similarity.ivfNearDupPairsManaged(
        survNonzero.select("id", "v"), centroids, th / 10000.0, semNa)
      val cm = Dedup.connectedComponentsManaged(
        pm.df.select("idA", "idB"))
      val svict = cm.df.filter(col("id") =!= col("label"))
        .select(col("id"), col("label").as("__dup_of"))
        .localCheckpoint(eager = true)
      cm.close(); pm.close()
      rejectPiece(svict, "sem_dup")
      val adm = afterSemState
        .join(svict.select("id"), Seq("id"), "left_anti")
        .localCheckpoint(eager = true)
      stage("semantic", adm.count())
      (adm, nonzero, centroids, haveSem)
    }
    val admitted = semPieces.map(_._1).getOrElse(afterMh)
    led += admitted.select(col("id"), lit(true).as("admitted"),
        lit("admitted").as("reason"), col("id").as("dup_of"))
      .localCheckpoint(eager = true)

    // persist: keys → ledger → metrics → (sem sub-state) →
    // pHash META (the marker)
    val ledger = led.reduce(_ unionByName _)
      .select(col("id"), col("admitted"), col("reason"), col("dup_of"))
      .localCheckpoint(eager = true)
    val nLed = ledger.count()
    require(nLed == counts.head._2,
      s"curateImageIncrement: ledger rows $nLed != batch ${counts.head._2}")
    def writer(df: DataFrame, path: String): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic").parquet(path)
    if (haveState || admitted.head(1).nonEmpty) {
      writeExactKeyRows(admitted.select(col("__md5").as("key"), col("id")),
        s"$stateDir/exact", batchId)
      writer(ledger, s"$stateDir/ledger")
      writer(counts.toSeq.toDF("stage", "rows"), s"$stateDir/metrics")
      semPieces.foreach { case (_, nonzero, centroids, haveSem) =>
        val admNonzero = nonzero
          .join(admitted.select("id"), Seq("id"), "left_semi")
          .select("id", "v")
        if (haveSem)
          Curation.appendSemVectors(spark, s"$stateDir/sem", admNonzero,
            batchId)
        else
          Curation.writeSemIndex(admNonzero, centroids, s"$stateDir/sem",
            cfg.semCentroidEvery, cfg.semNassign, batchId)
      }
      if (haveState)
        graft.operators.Multimodal.appendPhashSigs(spark,
          s"$stateDir/phash", admitted.select("id", "phash"), batchId)
      else
        // bootstrap: the batch's admitted signatures become the index,
        // stored under this batch id (static overwrite — fresh state)
        graft.operators.Multimodal.writePhashSigIndex(spark,
          admitted.select("id", "phash"), s"$stateDir/phash", cfg.nBands,
          batchId)
    }
    IncrementResult(ledger, admitted.select("id", "phash"), counts.toSeq)
  }

  /** Committed image exact keys, excluding `excludeBatch` — the
    * committed set is the pHash meta's.
    */
  private def readImageExactKeys(spark: SparkSession, stateDir: String,
                                 excludeBatch: String,
                                 batchHashes: Option[(DataFrame, Long)] =
                                   None): DataFrame =
    readMarkedExactKeys(spark, stateDir, "phash", excludeBatch,
      batchHashes)

  private def readMarkedExactKeys(spark: SparkSession, stateDir: String,
                                  markerSub: String,
                                  excludeBatch: String,
                                  batchHashes: Option[(DataFrame, Long)] =
                                    None): DataFrame = {
    val committed = spark.read.parquet(s"$stateDir/$markerSub/meta")
      .select("batch_id").distinct()
      .filter(col("batch_id") =!= excludeBatch)
    val keys = spark.read.parquet(s"$stateDir/exact/keys")
    // see readExactKeys: pruning whole keys the batch cannot carry
    // leaves surviving keys' min(id) unchanged
    val pruned = batchHashes match {
      case Some((b, m)) => bloomPrune(keys, col("key"), b, col("__md5"),
        Some(m))
      case None => keys
    }
    pruned
      .join(broadcast(committed), Seq("batch_id"), "left_semi")
      .groupBy("key").agg(min(col("id")).as("id"))
  }

  // ---- the AUDIO twin: batch vs persisted fingerprint + exact state ------

  /** The audio gate dials ([[graft.operators.Multimodal
    * .audioNearDupPairs]] parameters).
    */
  case class AudioIncrementConfig(windowFrames: Int = 50, k: Int = 20,
                                  stride: Int = 1, quantE4: Long = 1L,
                                  minMatchE4: Long = 5000L,
                                  maxFpDocFreq: Long = 1000L,
                                  // [[IncrementConfig.stateBloomBits]]:
                                  // prunes the exact-key and fp state
                                  // scans batch-proportional
                                  stateBloomBits: Option[Long] = None,
                                  // [[IncrementConfig.stateBloomAuto]]
                                  stateBloomAuto: Boolean = false,
                                  // optional SEMANTIC stage: SemDeDup
                                  // over pooled energy-profile
                                  // embeddings ([[graft.operators
                                  // .Multimodal.audioEmbeddings]])
                                  // against a sem sub-state under the
                                  // audio marker — the image
                                  // increment's sem pattern (r16 #1),
                                  // incl. enable-from-batch-N semantics
                                  // (clips admitted before enablement
                                  // were never embedded). Catches the
                                  // RESAMPLED re-encode regime the
                                  // fixed-window fingerprint misses.
                                  semDedupThresholdE4: Option[Long] = None,
                                  semDim: Int = 16,
                                  semCentroidEvery: Int = 25,
                                  semNassign: Int = 2)

  /** Audio state exists iff the fingerprint index has its meta marker. */
  def audioStateExists(spark: SparkSession, stateDir: String): Boolean =
    fs(spark, stateDir).exists(
      new org.apache.hadoop.fs.Path(s"$stateDir/audio/meta"))

  /** The audio increment — the third modality twin of
    * [[curateIncrement]]/[[curateImageIncrement]]: decode + fingerprint
    * ONCE, verdict order no_fingerprint (undecodable or shorter than
    * k+1 windows — such clips can never pair) → exact payload key vs
    * state then within batch → fingerprint near-dup vs committed state
    * with min-old-parent → within-batch pairs + components; admitted
    * fingerprints append under `batchId` with the audio META partition
    * as the increment's commit marker. Retry/torn contracts as in the
    * siblings.
    */
  def curateAudioIncrement(batch: org.apache.spark.sql.Dataset[
        graft.operators.Multimodal.MediaRecord],
      stateDir: String, batchId: String,
      cfg: AudioIncrementConfig = AudioIncrementConfig())
      : IncrementResult = {
    require(batchId.nonEmpty && batchId != "base" &&
        batchId != "__HIVE_DEFAULT_PARTITION__",
      s"curateAudioIncrement: invalid batch id '$batchId'")
    val spark = batch.sparkSession
    requireBatchNotFolded(spark, stateDir, batchId, "curateAudioIncrement")
    import spark.implicits._
    writeFamilySentinel(spark, stateDir, "audio")
    val haveState = audioStateExists(spark, stateDir)
    val counts = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val led = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def stage(name: String, c: Long): Unit = counts += ((name, c))
    def rejectPiece(ids: DataFrame, reason: String): Unit =
      led += ids.select(col("id").cast("long").as("id"),
          lit(false).as("admitted"), lit(reason).as("reason"),
          coalesce(col("__dup_of"), col("id")).cast("long").as("dup_of"))
        .localCheckpoint(eager = true)

    // one pass over payload bytes: md5 key + fingerprints
    val keys = batch.mapPartitions { it =>
        val d = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          d.reset()
          (r.media_id,
            d.digest(r.media).map(b => f"${b & 0xff}%02x").mkString)
        }
      }.toDF("id", "__md5").localCheckpoint(eager = true)
    stage("ingest", keys.count())
    // effective Bloom dial (manual bits win; see IncrementConfig)
    val effBloomBits = cfg.stateBloomBits.orElse(
      if (cfg.stateBloomAuto && haveState)
        decideStateBloom(spark, stateDir, counts.head._2)
      else None)
    val fps = graft.operators.Multimodal
      .audioFingerprints(batch, cfg.windowFrames, cfg.k, cfg.stride,
        cfg.quantE4).toDF()
      .select(col("media_id").as("id"), col("fp")).distinct()
      .localCheckpoint(eager = true)
    val printable = fps.select("id").distinct()
    val decoded = keys.join(printable, Seq("id"), "left_semi")
      .localCheckpoint(eager = true)
    stage("fingerprint", decoded.count())
    rejectPiece(keys.join(printable, Seq("id"), "left_anti")
      .select(col("id"), lit(null).cast("long").as("__dup_of")),
      "no_fingerprint")

    // exact payload dedup: against state, then within batch
    val afterExactState =
      if (!haveState) decoded
      else {
        val stateKeys = readMarkedExactKeys(spark, stateDir, "audio",
          batchId,
          effBloomBits.map(m => (decoded.select("__md5"), m)))
        val hits = decoded.join(
            stateKeys.select(col("key").as("__md5"),
              col("id").as("__dup_of")), Seq("__md5"))
          .localCheckpoint(eager = true)
        rejectPiece(hits.select(col("id"), col("__dup_of")), "exact_dup")
        decoded.join(hits.select("id"), Seq("id"), "left_anti")
      }
    val keeper = afterExactState.groupBy("__md5")
      .agg(min(col("id")).as("__keep"))
    val withKeep = afterExactState.join(keeper, Seq("__md5"))
      .localCheckpoint(eager = true)
    rejectPiece(withKeep.filter(col("id") =!= col("__keep"))
      .select(col("id"), col("__keep").as("__dup_of")), "exact_dup")
    val exact = withKeep.filter(col("id") === col("__keep"))
      .select("id", "__md5").localCheckpoint(eager = true)
    stage("exact_dedup", exact.count())
    val exactFps = fps.join(exact.select("id"), Seq("id"), "left_semi")
      .localCheckpoint(eager = true)

    // fingerprint near-dup: against state, then within batch
    val afterOld =
      if (!haveState) exact
      else {
        val hits = graft.operators.Multimodal
          .audioSigsNearDupAgainstIndex(spark, s"$stateDir/audio",
            exactFps.select(col("id").as("id_new"), col("fp")),
            cfg.minMatchE4, cfg.maxFpDocFreq,
            excludeBatch = Some(batchId),
            bloomBits = effBloomBits)
          .groupBy("id_new").agg(min(col("id_old")).as("__dup_of"))
          .select(col("id_new").as("id"), col("__dup_of"))
          .localCheckpoint(eager = true)
        rejectPiece(hits, "near_dup")
        exact.join(hits.select("id"), Seq("id"), "left_anti")
          .localCheckpoint(eager = true)
      }
    // within-batch pairs from the SAME fingerprints (decode-once): the
    // audioNearDupPairs algebra on the survivor subset
    val sfps = exactFps.join(afterOld.select("id"), Seq("id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = sfps.groupBy("id").agg(count(lit(1)).as("nfp"))
    val keep = sfps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= cfg.maxFpDocFreq).select("fp")
    val fk = sfps.join(keep, Seq("fp"), "left_semi")
    val edges = fk.select(col("id").as("idA"), col("fp"))
      .join(fk.select(col("id").as("idB"), col("fp")), Seq("fp"))
      .filter(col("idA") < col("idB"))
      .groupBy("idA", "idB").agg(count(lit(1)).as("ninter"))
      .join(sizes.select(col("id").as("idA"), col("nfp").as("na")), "idA")
      .join(sizes.select(col("id").as("idB"), col("nfp").as("nb")), "idB")
      .filter(graft.core.Ops.fixedPoint(col("ninter") * lit(1.0) /
        (col("na") + col("nb") - col("ninter")), 4) >= cfg.minMatchE4)
      .select("idA", "idB")
    val compM = Dedup.connectedComponentsManaged(edges)
    val victims = compM.df.filter(col("id") =!= col("label"))
      .select(col("id"), col("label").as("__dup_of"))
      .localCheckpoint(eager = true)
    compM.close(); sfps.unpersist()
    rejectPiece(victims, "near_dup")
    val afterMh = afterOld
      .join(victims.select("id"), Seq("id"), "left_anti")
      .localCheckpoint(eager = true)
    stage("near_dup", afterMh.count())

    // ---- optional SEMANTIC stage: SemDeDup over pooled energy-profile
    // embeddings against a sem SUB-state (reads restricted to
    // audio-committed batches — the increment's one authoritative
    // marker), then within batch — the image increment's sem pattern,
    // audio modality (r16 #1)
    val semPieces = cfg.semDedupThresholdE4.map { th =>
      val semDir = s"$stateDir/sem"
      val haveSem = haveState && fs(spark, stateDir).exists(
        new org.apache.hadoop.fs.Path(s"$semDir/meta"))
      val (semCe, semNa) =
        if (!haveSem) (cfg.semCentroidEvery, cfg.semNassign)
        else {
          val (ce, na, pdim) = Curation.readSemMeta(spark, semDir)
          require(pdim == 0 || pdim == cfg.semDim,
            s"curateAudioIncrement: semDim ${cfg.semDim} " +
              s"!= pinned sem sub-state dim $pdim at $semDir")
          (ce, na)
        }
      // embed ONLY the surviving pool (never re-decode rejects)
      val survRecs = batch.toDF()
        .join(afterMh.select(col("id").as("media_id")), Seq("media_id"),
          "left_semi")
        .as[graft.operators.Multimodal.MediaRecord]
      val nonzero = graft.operators.Multimodal
        .audioEmbeddings(survRecs, cfg.semDim, cfg.windowFrames)
        .filter(expr("aggregate(v, 0D, (a, x) -> a + x * x)") > lit(0.0))
        .localCheckpoint(eager = true)
      val centroids =
        if (haveSem)
          spark.read.parquet(s"$semDir/centroids")
            .select(col("cid").as("id"), col("cv").as("v"))
        else Curation.semCentroidSample(nonzero.select("id", "v"),
          semCe).localCheckpoint(eager = true)
      val afterSemState =
        if (!haveSem) afterMh
        else {
          val restrict = spark.read.parquet(s"$stateDir/audio/meta")
            .select("batch_id").distinct()
          val hits = Curation.semNearDupAgainstIndex(spark, semDir,
              nonzero.select("id", "v"), th,
              excludeBatch = Some(batchId), restrictTo = Some(restrict),
              bloomBits = effBloomBits)
            .groupBy("id_new").agg(min(col("id_old")).as("__dup_of"))
            .select(col("id_new").as("id"), col("__dup_of"))
            .localCheckpoint(eager = true)
          rejectPiece(hits, "sem_dup")
          afterMh.join(hits.select("id"), Seq("id"), "left_anti")
            .localCheckpoint(eager = true)
        }
      val survNonzero = nonzero
        .join(afterSemState.select("id"), Seq("id"), "left_semi")
      val pm = graft.operators.Similarity.ivfNearDupPairsManaged(
        survNonzero.select("id", "v"), centroids, th / 10000.0, semNa)
      val cm = Dedup.connectedComponentsManaged(
        pm.df.select("idA", "idB"))
      val svict = cm.df.filter(col("id") =!= col("label"))
        .select(col("id"), col("label").as("__dup_of"))
        .localCheckpoint(eager = true)
      cm.close(); pm.close()
      rejectPiece(svict, "sem_dup")
      val adm = afterSemState
        .join(svict.select("id"), Seq("id"), "left_anti")
        .localCheckpoint(eager = true)
      stage("semantic", adm.count())
      (adm, nonzero, centroids, haveSem)
    }
    val admitted = semPieces.map(_._1).getOrElse(afterMh)
    led += admitted.select(col("id"), lit(true).as("admitted"),
        lit("admitted").as("reason"), col("id").as("dup_of"))
      .localCheckpoint(eager = true)

    // persist: keys → ledger → metrics → (sem sub-state) →
    // audio META (the marker)
    val ledger = led.reduce(_ unionByName _)
      .select(col("id"), col("admitted"), col("reason"), col("dup_of"))
      .localCheckpoint(eager = true)
    val nLed = ledger.count()
    require(nLed == counts.head._2,
      s"curateAudioIncrement: ledger rows $nLed != batch ${counts.head._2}")
    def writer(df: DataFrame, path: String): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic").parquet(path)
    if (haveState || admitted.head(1).nonEmpty) {
      writeExactKeyRows(admitted.select(col("__md5").as("key"), col("id")),
        s"$stateDir/exact", batchId)
      writer(ledger, s"$stateDir/ledger")
      writer(counts.toSeq.toDF("stage", "rows"), s"$stateDir/metrics")
      semPieces.foreach { case (_, nonzero, centroids, haveSem) =>
        val admNonzero = nonzero
          .join(admitted.select("id"), Seq("id"), "left_semi")
          .select("id", "v")
        if (haveSem)
          Curation.appendSemVectors(spark, s"$stateDir/sem", admNonzero,
            batchId)
        else
          Curation.writeSemIndex(admNonzero, centroids, s"$stateDir/sem",
            cfg.semCentroidEvery, cfg.semNassign, batchId)
      }
      val admFps = exactFps.join(admitted.select("id"), Seq("id"),
        "left_semi")
      if (haveState)
        graft.operators.Multimodal.appendAudioFps(spark,
          s"$stateDir/audio", admFps, batchId)
      else
        graft.operators.Multimodal.writeAudioFpIndex(spark, admFps,
          s"$stateDir/audio", cfg.windowFrames, cfg.k, cfg.stride,
          cfg.quantE4, batchId)
    }
    IncrementResult(ledger, admitted.select("id"), counts.toSeq)
  }

  // ---- the VIDEO twin: batch vs persisted keyframe + exact state ---------

  /** The video gate dials ([[graft.operators.Multimodal
    * .videoNearDupPairs]] parameters).
    */
  case class VideoIncrementConfig(maxHamming: Int = 3, nBands: Int = 4,
                                  minSimE4: Long = 5000L,
                                  // [[IncrementConfig.stateBloomBits]]:
                                  // prunes the exact-key and frame state
                                  // scans batch-proportional
                                  stateBloomBits: Option[Long] = None,
                                  // [[IncrementConfig.stateBloomAuto]]
                                  stateBloomAuto: Boolean = false,
                                  // optional SEMANTIC stage: SemDeDup
                                  // over pooled keyframe block-mean
                                  // embeddings ([[graft.operators
                                  // .Multimodal.videoEmbeddings]])
                                  // against a sem sub-state under the
                                  // video marker — the image
                                  // increment's sem pattern (r16 #1),
                                  // incl. enable-from-batch-N semantics.
                                  // Catches the RE-GRAINED re-encode
                                  // regime per-frame pHash misses.
                                  semDedupThresholdE4: Option[Long] = None,
                                  semGrid: Int = 8,
                                  semCentroidEvery: Int = 25,
                                  semNassign: Int = 2)

  /** Video state exists iff the keyframe index has its meta marker. */
  def videoStateExists(spark: SparkSession, stateDir: String): Boolean =
    fs(spark, stateDir).exists(
      new org.apache.hadoop.fs.Path(s"$stateDir/video/meta"))

  // ---- media sem backfill: [[semBackfill]]'s image/audio/video twins -----

  /** Retroactive semantic coverage for an IMAGE state whose earlier
    * increments ran without the semantic stage — [[semBackfill]]'s
    * image twin: embeds every already-admitted image from the supplied
    * payload corpus and seeds/completes the sem sub-state per
    * committed batch, so the next [[curateImageIncrement]] with
    * `semDedupThresholdE4` set dedups against the FULL history instead
    * of post-enablement batches only. Idempotent per batch (already-
    * present sem batches are skipped); a torn backfill completes on
    * rerun. Returns the number of vectors indexed.
    */
  def imageSemBackfill(spark: SparkSession, stateDir: String,
                       corpus: org.apache.spark.sql.Dataset[
                         graft.operators.Multimodal.MediaRecord],
                       cfg: ImageIncrementConfig = ImageIncrementConfig())
      : Long =
    mediaSemBackfill(spark, stateDir, "phash",
      recs => graft.operators.Multimodal.imageEmbeddings(recs,
        cfg.semGrid, maxPixels = cfg.maxPixels),
      cfg.semGrid * cfg.semGrid, cfg.semCentroidEvery, cfg.semNassign,
      corpus)

  /** [[imageSemBackfill]] for an AUDIO state (pooled energy-profile
    * embeddings, [[graft.operators.Multimodal.audioEmbeddings]]).
    */
  def audioSemBackfill(spark: SparkSession, stateDir: String,
                       corpus: org.apache.spark.sql.Dataset[
                         graft.operators.Multimodal.MediaRecord],
                       cfg: AudioIncrementConfig = AudioIncrementConfig())
      : Long =
    mediaSemBackfill(spark, stateDir, "audio",
      recs => graft.operators.Multimodal.audioEmbeddings(recs,
        cfg.semDim, cfg.windowFrames),
      cfg.semDim, cfg.semCentroidEvery, cfg.semNassign, corpus)

  /** [[imageSemBackfill]] for a VIDEO state (pooled keyframe block-mean
    * embeddings, [[graft.operators.Multimodal.videoEmbeddings]]).
    */
  def videoSemBackfill(spark: SparkSession, stateDir: String,
                       corpus: org.apache.spark.sql.Dataset[
                         graft.operators.Multimodal.MediaRecord],
                       cfg: VideoIncrementConfig = VideoIncrementConfig())
      : Long =
    mediaSemBackfill(spark, stateDir, "video",
      recs => graft.operators.Multimodal.videoEmbeddings(recs,
        cfg.semGrid),
      cfg.semGrid * cfg.semGrid, cfg.semCentroidEvery, cfg.semNassign,
      corpus)

  private def mediaSemBackfill(spark: SparkSession, stateDir: String,
      family: String,
      embed: org.apache.spark.sql.Dataset[
        graft.operators.Multimodal.MediaRecord] => DataFrame,
      semDim: Int, semCentroidEvery: Int, semNassign: Int,
      corpus: org.apache.spark.sql.Dataset[
        graft.operators.Multimodal.MediaRecord]): Long = {
    import spark.implicits._
    val pinned = readFamilySentinel(spark, stateDir)
    require(pinned.contains(family),
      s"mediaSemBackfill: state at $stateDir is " +
        s"'${pinned.getOrElse("<none>")}', expected '$family'")
    require(fs(spark, stateDir).exists(
        new org.apache.hadoop.fs.Path(s"$stateDir/$family/meta")),
      s"mediaSemBackfill: no committed $family state at $stateDir")
    val committed = spark.read.parquet(s"$stateDir/$family/meta")
      .select("batch_id").distinct()
    val admittedIds = spark.read.parquet(s"$stateDir/ledger")
      .filter(col("admitted"))
      .join(broadcast(committed), Seq("batch_id"), "left_semi")
      .select(col("id"), col("batch_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val ids = corpus.toDF().select(col("media_id").as("id"))
      val missing = admittedIds.join(ids, Seq("id"), "left_anti").count()
      require(missing == 0L,
        s"mediaSemBackfill: $missing admitted ids absent from the " +
          "supplied corpus — backfill needs the full admitted history")
      // dials: an existing (partial) sub-state pins them
      val (ce, na) =
        if (!fs(spark, stateDir).exists(
            new org.apache.hadoop.fs.Path(s"$stateDir/sem/meta")))
          (semCentroidEvery, semNassign)
        else {
          val (pce, pna, dim) = Curation.readSemMeta(spark,
            s"$stateDir/sem")
          require(dim == 0 || dim == semDim,
            s"mediaSemBackfill: semDim $semDim != pinned dim $dim")
          (pce, pna)
        }
      def haveSem = fs(spark, stateDir).exists(
        new org.apache.hadoop.fs.Path(s"$stateDir/sem/meta"))
      val nonzero = embed(corpus)
        .filter(expr("aggregate(v, 0D, (a, x) -> a + x * x)") > lit(0.0))
        .join(admittedIds, Seq("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        nonzero.count()
        // bounded: ledger batch ids (compaction keeps this small)
        val batches = admittedIds.select("batch_id").distinct()
          .as[String].collect().sorted
        val done: Set[String] =
          if (!haveSem) Set.empty
          else spark.read.parquet(s"$stateDir/sem/meta")
            .select("batch_id").distinct().as[String].collect().toSet
        var indexed = 0L
        batches.filterNot(done).foreach { b =>
          val vecs = nonzero.filter(col("batch_id") === b)
            .select("id", "v")
          if (!haveSem) {
            val cents = Curation.semCentroidSample(
              nonzero.select("id", "v"), ce)
            Curation.writeSemIndex(vecs, cents, s"$stateDir/sem", ce,
              na, batchId = b)
          } else Curation.appendSemVectors(spark, s"$stateDir/sem",
            vecs, b)
          indexed += vecs.count()
        }
        indexed
      } finally nonzero.unpersist()
    } finally admittedIds.unpersist()
  }

  /** The video increment — the FOURTH modality twin of
    * [[curateIncrement]]/[[curateImageIncrement]]/
    * [[curateAudioIncrement]], completing the batch-vs-accumulated-state
    * symmetry: parse + keyframe-hash ONCE, verdict order no_frames
    * (unparseable MP4 or zero decodable keyframes — such payloads can
    * never pair) → exact payload key vs state then within batch →
    * keyframe near-dup (temporal Jaccard over banded frame matches) vs
    * committed state with min-old-parent → within-batch pairs +
    * components; admitted frame rows append under `batchId` with the
    * video META partition as the increment's commit marker. Retry/torn
    * contracts as in the siblings: every against-state read excludes the
    * batch's own partitions (the pre-batch view), so a retry recomputes
    * identical verdicts and replaces its partitions bit-identically.
    */
  def curateVideoIncrement(batch: org.apache.spark.sql.Dataset[
        graft.operators.Multimodal.MediaRecord],
      stateDir: String, batchId: String,
      cfg: VideoIncrementConfig = VideoIncrementConfig())
      : IncrementResult = {
    require(batchId.nonEmpty && batchId != "base" &&
        batchId != "__HIVE_DEFAULT_PARTITION__",
      s"curateVideoIncrement: invalid batch id '$batchId'")
    val spark = batch.sparkSession
    requireBatchNotFolded(spark, stateDir, batchId, "curateVideoIncrement")
    import spark.implicits._
    writeFamilySentinel(spark, stateDir, "video")
    val haveState = videoStateExists(spark, stateDir)
    val counts = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val led = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def stage(name: String, c: Long): Unit = counts += ((name, c))
    def rejectPiece(ids: DataFrame, reason: String): Unit =
      led += ids.select(col("id").cast("long").as("id"),
          lit(false).as("admitted"), lit(reason).as("reason"),
          coalesce(col("__dup_of"), col("id")).cast("long").as("dup_of"))
        .localCheckpoint(eager = true)

    // one pass over payload bytes: md5 key + keyframe hashes
    val keys = batch.mapPartitions { it =>
        val d = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          d.reset()
          (r.media_id,
            d.digest(r.media).map(b => f"${b & 0xff}%02x").mkString)
        }
      }.toDF("id", "__md5").localCheckpoint(eager = true)
    stage("ingest", keys.count())
    // effective Bloom dial (manual bits win; see IncrementConfig)
    val effBloomBits = cfg.stateBloomBits.orElse(
      if (cfg.stateBloomAuto && haveState)
        decideStateBloom(spark, stateDir, counts.head._2)
      else None)
    val frames = graft.operators.Multimodal.videoKeyframePhash(batch).toDF()
      .filter(col("phash") =!= -1L && col("frame_idx") >= 0L)
      .select(col("media_id").as("id"), col("frame_idx"), col("phash"))
      .localCheckpoint(eager = true)
    val framed = frames.select("id").distinct()
    val decoded = keys.join(framed, Seq("id"), "left_semi")
      .localCheckpoint(eager = true)
    stage("keyframes", decoded.count())
    rejectPiece(keys.join(framed, Seq("id"), "left_anti")
      .select(col("id"), lit(null).cast("long").as("__dup_of")),
      "no_frames")

    // exact payload dedup: against state, then within batch
    val afterExactState =
      if (!haveState) decoded
      else {
        val stateKeys = readMarkedExactKeys(spark, stateDir, "video",
          batchId,
          effBloomBits.map(m => (decoded.select("__md5"), m)))
        val hits = decoded.join(
            stateKeys.select(col("key").as("__md5"),
              col("id").as("__dup_of")), Seq("__md5"))
          .localCheckpoint(eager = true)
        rejectPiece(hits.select(col("id"), col("__dup_of")), "exact_dup")
        decoded.join(hits.select("id"), Seq("id"), "left_anti")
      }
    val keeper = afterExactState.groupBy("__md5")
      .agg(min(col("id")).as("__keep"))
    val withKeep = afterExactState.join(keeper, Seq("__md5"))
      .localCheckpoint(eager = true)
    rejectPiece(withKeep.filter(col("id") =!= col("__keep"))
      .select(col("id"), col("__keep").as("__dup_of")), "exact_dup")
    val exact = withKeep.filter(col("id") === col("__keep"))
      .select("id", "__md5").localCheckpoint(eager = true)
    stage("exact_dedup", exact.count())
    val exactFrames = frames.join(exact.select("id"), Seq("id"), "left_semi")
      .localCheckpoint(eager = true)

    // keyframe near-dup: against state, then within batch
    val afterOld =
      if (!haveState) exact
      else {
        val hits = graft.operators.Multimodal
          .videoFramesNearDupAgainstIndex(spark, s"$stateDir/video",
            exactFrames.select(col("id").as("id_new"), col("frame_idx"),
              col("phash")),
            cfg.maxHamming, cfg.minSimE4, excludeBatch = Some(batchId),
            bloomBits = effBloomBits)
          .groupBy("id_new").agg(min(col("id_old")).as("__dup_of"))
          .select(col("id_new").as("id"), col("__dup_of"))
          .localCheckpoint(eager = true)
        rejectPiece(hits, "near_dup")
        exact.join(hits.select("id"), Seq("id"), "left_anti")
          .localCheckpoint(eager = true)
      }
    // within-batch pairs from the SAME frame hashes (decode-once): the
    // videoNearDupPairs algebra on the survivor subset
    val sframes = exactFrames
      .join(afterOld.select("id"), Seq("id"), "left_semi")
      .select(col("id").as("media_id"), col("frame_idx"), col("phash"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edges = graft.operators.Multimodal.videoFramesNearDupPairs(
        sframes, cfg.maxHamming, cfg.nBands, cfg.minSimE4)
      .select("idA", "idB")
    val compM = Dedup.connectedComponentsManaged(edges)
    val victims = compM.df.filter(col("id") =!= col("label"))
      .select(col("id"), col("label").as("__dup_of"))
      .localCheckpoint(eager = true)
    compM.close(); sframes.unpersist()
    rejectPiece(victims, "near_dup")
    val afterMh = afterOld
      .join(victims.select("id"), Seq("id"), "left_anti")
      .localCheckpoint(eager = true)
    stage("near_dup", afterMh.count())

    // ---- optional SEMANTIC stage: SemDeDup over pooled keyframe
    // block-mean embeddings against a sem SUB-state (reads restricted
    // to video-committed batches — the increment's one authoritative
    // marker), then within batch — the image increment's sem pattern,
    // video modality (r16 #1)
    val semPieces = cfg.semDedupThresholdE4.map { th =>
      val semDir = s"$stateDir/sem"
      val haveSem = haveState && fs(spark, stateDir).exists(
        new org.apache.hadoop.fs.Path(s"$semDir/meta"))
      val dim = cfg.semGrid * cfg.semGrid
      val (semCe, semNa) =
        if (!haveSem) (cfg.semCentroidEvery, cfg.semNassign)
        else {
          val (ce, na, pdim) = Curation.readSemMeta(spark, semDir)
          require(pdim == 0 || pdim == dim,
            s"curateVideoIncrement: semGrid ${cfg.semGrid} (dim $dim) " +
              s"!= pinned sem sub-state dim $pdim at $semDir")
          (ce, na)
        }
      // embed ONLY the surviving pool (never re-decode rejects)
      val survRecs = batch.toDF()
        .join(afterMh.select(col("id").as("media_id")), Seq("media_id"),
          "left_semi")
        .as[graft.operators.Multimodal.MediaRecord]
      val nonzero = graft.operators.Multimodal
        .videoEmbeddings(survRecs, cfg.semGrid)
        .filter(expr("aggregate(v, 0D, (a, x) -> a + x * x)") > lit(0.0))
        .localCheckpoint(eager = true)
      val centroids =
        if (haveSem)
          spark.read.parquet(s"$semDir/centroids")
            .select(col("cid").as("id"), col("cv").as("v"))
        else Curation.semCentroidSample(nonzero.select("id", "v"),
          semCe).localCheckpoint(eager = true)
      val afterSemState =
        if (!haveSem) afterMh
        else {
          val restrict = spark.read.parquet(s"$stateDir/video/meta")
            .select("batch_id").distinct()
          val hits = Curation.semNearDupAgainstIndex(spark, semDir,
              nonzero.select("id", "v"), th,
              excludeBatch = Some(batchId), restrictTo = Some(restrict),
              bloomBits = effBloomBits)
            .groupBy("id_new").agg(min(col("id_old")).as("__dup_of"))
            .select(col("id_new").as("id"), col("__dup_of"))
            .localCheckpoint(eager = true)
          rejectPiece(hits, "sem_dup")
          afterMh.join(hits.select("id"), Seq("id"), "left_anti")
            .localCheckpoint(eager = true)
        }
      val survNonzero = nonzero
        .join(afterSemState.select("id"), Seq("id"), "left_semi")
      val pm = graft.operators.Similarity.ivfNearDupPairsManaged(
        survNonzero.select("id", "v"), centroids, th / 10000.0, semNa)
      val cm = Dedup.connectedComponentsManaged(
        pm.df.select("idA", "idB"))
      val svict = cm.df.filter(col("id") =!= col("label"))
        .select(col("id"), col("label").as("__dup_of"))
        .localCheckpoint(eager = true)
      cm.close(); pm.close()
      rejectPiece(svict, "sem_dup")
      val adm = afterSemState
        .join(svict.select("id"), Seq("id"), "left_anti")
        .localCheckpoint(eager = true)
      stage("semantic", adm.count())
      (adm, nonzero, centroids, haveSem)
    }
    val admitted = semPieces.map(_._1).getOrElse(afterMh)
    led += admitted.select(col("id"), lit(true).as("admitted"),
        lit("admitted").as("reason"), col("id").as("dup_of"))
      .localCheckpoint(eager = true)

    // persist: keys → ledger → metrics → (sem sub-state) →
    // video META (the marker)
    val ledger = led.reduce(_ unionByName _)
      .select(col("id"), col("admitted"), col("reason"), col("dup_of"))
      .localCheckpoint(eager = true)
    val nLed = ledger.count()
    require(nLed == counts.head._2,
      s"curateVideoIncrement: ledger rows $nLed != batch ${counts.head._2}")
    def writer(df: DataFrame, path: String): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic").parquet(path)
    if (haveState || admitted.head(1).nonEmpty) {
      writeExactKeyRows(admitted.select(col("__md5").as("key"), col("id")),
        s"$stateDir/exact", batchId)
      writer(ledger, s"$stateDir/ledger")
      writer(counts.toSeq.toDF("stage", "rows"), s"$stateDir/metrics")
      semPieces.foreach { case (_, nonzero, centroids, haveSem) =>
        val admNonzero = nonzero
          .join(admitted.select("id"), Seq("id"), "left_semi")
          .select("id", "v")
        if (haveSem)
          Curation.appendSemVectors(spark, s"$stateDir/sem", admNonzero,
            batchId)
        else
          Curation.writeSemIndex(admNonzero, centroids, s"$stateDir/sem",
            cfg.semCentroidEvery, cfg.semNassign, batchId)
      }
      val admFrames = exactFrames.join(admitted.select("id"), Seq("id"),
        "left_semi")
      if (haveState)
        graft.operators.Multimodal.appendVideoFrames(spark,
          s"$stateDir/video", admFrames, batchId)
      else
        graft.operators.Multimodal.writeVideoFrameIndex(spark, admFrames,
          s"$stateDir/video", cfg.nBands, batchId)
    }
    IncrementResult(ledger, admitted.select("id"), counts.toSeq)
  }

  // ---- the EMBEDDING twin: batch vs persisted semantic state -------------

  /** The semantic gate dials ([[graft.operators.Curation
    * .semDedupVictimsFromVectorsManaged]] parameters).
    */
  case class EmbeddingIncrementConfig(thresholdE4: Long = 9000L,
                                      centroidEvery: Int = 25,
                                      nassign: Int = 2,
                                      // [[IncrementConfig.stateBloomBits]]:
                                      // prunes the exact-key state scan
                                      // batch-proportional
                                      stateBloomBits: Option[Long] = None,
                                      // [[IncrementConfig.stateBloomAuto]]
                                      stateBloomAuto: Boolean = false)

  /** Semantic state exists iff the sem index has its meta marker. */
  def semStateExists(spark: SparkSession, stateDir: String): Boolean =
    fs(spark, stateDir).exists(
      new org.apache.hadoop.fs.Path(s"$stateDir/sem/meta"))

  /** Retroactive semantic coverage for a text state whose earlier
    * increments ran WITHOUT the semantic stage: embeds every
    * already-admitted doc and seeds/completes the sem sub-state so the
    * next [[curateIncrement]] with `semDedupThresholdE4` set dedups
    * against the full history, not just post-enablement batches.
    *
    * The caller supplies the admitted corpus text (`admittedCorpus`:
    * the accumulated admitted output the state was built from — the
    * state itself stores only keys/shingles, never raw text); coverage
    * is LOUD: every admitted id in the committed ledger must appear, or
    * this throws. Vectors are appended under each doc's ORIGINAL ledger
    * batch id, so the serving-side restriction to minhash-committed
    * batches holds unchanged.
    *
    * Crash-safe and re-entrant: each batch commits via its own sem meta
    * partition (written last); a rerun skips already-committed batches
    * and finishes the rest. Centroids are drawn once from the FULL
    * admitted non-zero corpus by the replayable md5 rule, so a retried
    * bootstrap draws the identical set. Returns the number of vectors
    * indexed by THIS call.
    */
  /** Retroactive SUBSTRING-DEDUP coverage — [[semBackfill]]'s twin for
    * the `windows` claims table: embeds every already-admitted doc's
    * w-token window hashes under its ORIGINAL ledger batch id so the
    * next [[curateIncrement]] with `dedupWindowsW` set strips passages
    * of the full history, not just post-enablement batches. Coverage is
    * LOUD (every committed admitted id must appear in the supplied
    * corpus); idempotent and crash-rerunnable — every ledger batch's
    * claims rewrite under dynamic partition overwrite on each call, so
    * a torn backfill completes on rerun. The supplied text should be
    * the docs' FINAL admitted text (what entered the corpus). Returns
    * the number of claim rows written.
    */
  def windowBackfill(spark: SparkSession, stateDir: String,
                     admittedCorpus: DataFrame, idCol: String,
                     textCol: String, w: Int): Long = {
    require(stateExists(spark, stateDir),
      s"windowBackfill: no committed state at $stateDir")
    val committed = Dedup.minhashCommitted(spark, s"$stateDir/minhash")
    val admittedIds = spark.read.parquet(s"$stateDir/ledger")
      .filter(col("admitted"))
      .join(broadcast(committed), Seq("batch_id"), "left_semi")
      .select(col("id"), col("batch_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val corpus = graft.core.Ops.widen(admittedCorpus)
        .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      val missing = admittedIds.join(corpus, Seq("id"), "left_anti").count()
      require(missing == 0L,
        s"windowBackfill: $missing admitted ids absent from the supplied " +
          "corpus — backfill needs the full admitted history")
      val claims = Curation.windowClaims(
          corpus.join(admittedIds.select("id"), Seq("id"), "left_semi"),
          "id", "text", w)
        .join(admittedIds, Seq("id"))
        .select(col("id"), col("h"), col("batch_id"))
        .localCheckpoint(eager = true)
      claims.write.mode("overwrite").partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(s"$stateDir/windows")
      claims.count()
    } finally admittedIds.unpersist()
  }

  def semBackfill(spark: SparkSession, stateDir: String,
                  admittedCorpus: DataFrame, idCol: String, textCol: String,
                  semDim: Int = 64, semCentroidEvery: Int = 25,
                  semNassign: Int = 2): Long = {
    import spark.implicits._
    require(stateExists(spark, stateDir),
      s"semBackfill: no committed state at $stateDir")
    val committed = Dedup.minhashCommitted(spark, s"$stateDir/minhash")
    val admittedIds = spark.read.parquet(s"$stateDir/ledger")
      .filter(col("admitted"))
      .join(broadcast(committed), Seq("batch_id"), "left_semi")
      .select(col("id"), col("batch_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val corpus = graft.core.Ops.widen(admittedCorpus)
        .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      val missing = admittedIds.join(corpus, Seq("id"), "left_anti").count()
      require(missing == 0L,
        s"semBackfill: $missing admitted ids absent from the supplied " +
          s"corpus — backfill needs the full admitted history")
      // dials: an existing (partial) sub-state pins them
      val (ce, na) =
        if (!semStateExists(spark, stateDir))
          (semCentroidEvery, semNassign)
        else {
          val (pce, pna, dim) = Curation.readSemMeta(spark, s"$stateDir/sem")
          require(dim == 0 || dim == semDim,
            s"semBackfill: semDim $semDim != pinned dim $dim")
          (pce, pna)
        }
      val nonzero = TextStats.hashEmbedVectors(
          corpus.join(admittedIds.select("id"), Seq("id"), "left_semi"),
          "id", "text", semDim)
        .filter(expr("aggregate(v, 0D, (a, x) -> a + x * x)") > lit(0.0))
        .join(admittedIds, Seq("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        nonzero.count()
        // bounded: ledger batch ids (compaction keeps this small)
        val batches = admittedIds.select("batch_id").distinct()
          .as[String].collect().sorted
        val done: Set[String] =
          if (!semStateExists(spark, stateDir)) Set.empty
          else spark.read.parquet(s"$stateDir/sem/meta")
            .select("batch_id").distinct().as[String].collect().toSet
        var indexed = 0L
        batches.filterNot(done).foreach { b =>
          val vecs = nonzero.filter(col("batch_id") === b)
            .select("id", "v")
          if (!semStateExists(spark, stateDir)) {
            val cents = Curation.semCentroidSample(
              nonzero.select("id", "v"), ce)
            Curation.writeSemIndex(vecs, cents, s"$stateDir/sem", ce, na,
              batchId = b)
          } else Curation.appendSemVectors(spark, s"$stateDir/sem", vecs, b)
          indexed += vecs.count()
        }
        indexed
      } finally nonzero.unpersist()
    } finally admittedIds.unpersist()
  }

  /** The embedding increment — the FIFTH content twin of
    * [[curateIncrement]] and the modality siblings: a new snapshot of
    * (id, v) embedding rows curated against the accumulated semantic
    * state. Verdict order: exact dedup (vector identity at e6
    * fixed-point — vs state then within batch) → semantic near-dup
    * (cosine >= threshold within shared cells of the FROZEN
    * [[graft.operators.Curation.semCentroidSample]] centroid set — vs
    * committed state with min-old-parent, then within-batch components).
    * Zero-norm vectors pass the semantic stages (cosine undefined — they
    * can never pair) and are never indexed, but their exact keys ARE
    * state (identical zero vectors dedup exactly). Admitted non-zero
    * vectors append under `batchId` with the sem META partition as the
    * increment's commit marker; the first increment draws the centroid
    * set from its own exact-surviving non-zero vectors (the replayable
    * md5 rule) and pins it for every later batch. Retry/torn contracts
    * as in the siblings.
    */
  def curateEmbeddingIncrement(batch: DataFrame, stateDir: String,
      batchId: String,
      cfg: EmbeddingIncrementConfig = EmbeddingIncrementConfig())
      : IncrementResult = {
    require(batchId.nonEmpty && batchId != "base" &&
        batchId != "__HIVE_DEFAULT_PARTITION__",
      s"curateEmbeddingIncrement: invalid batch id '$batchId'")
    val spark = batch.sparkSession
    requireBatchNotFolded(spark, stateDir, batchId, "curateEmbeddingIncrement")
    import spark.implicits._
    writeFamilySentinel(spark, stateDir, "sem")
    val haveState = semStateExists(spark, stateDir)
    val counts = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val led = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def stage(name: String, c: Long): Unit = counts += ((name, c))
    def rejectPiece(ids: DataFrame, reason: String): Unit =
      led += ids.select(col("id").cast("long").as("id"),
          lit(false).as("admitted"), lit(reason).as("reason"),
          coalesce(col("__dup_of"), col("id")).cast("long").as("dup_of"))
        .localCheckpoint(eager = true)

    // exact key: e6 fixed-point canonical string of the vector (vector
    // identity at the documented resolution)
    val keyed = graft.core.Ops.widen(batch)
      .select(col("id").cast("long").as("id"), col("v"))
      .withColumn("__md5", md5(concat_ws(",",
        transform(col("v"),
          x => graft.core.Ops.fixedPoint(x, 6).cast("string")))))
      .localCheckpoint(eager = true)
    stage("ingest", keyed.count())
    // effective Bloom dial (manual bits win; see IncrementConfig)
    val effBloomBits = cfg.stateBloomBits.orElse(
      if (cfg.stateBloomAuto && haveState)
        decideStateBloom(spark, stateDir, counts.head._2)
      else None)

    // exact dedup: against state, then within batch
    val afterExactState =
      if (!haveState) keyed
      else {
        val stateKeys = readMarkedExactKeys(spark, stateDir, "sem",
          batchId,
          effBloomBits.map(m => (keyed.select("__md5"), m)))
        val hits = keyed.join(
            stateKeys.select(col("key").as("__md5"),
              col("id").as("__dup_of")), Seq("__md5"))
          .localCheckpoint(eager = true)
        rejectPiece(hits.select(col("id"), col("__dup_of")), "exact_dup")
        keyed.join(hits.select("id"), Seq("id"), "left_anti")
      }
    val keeper = afterExactState.groupBy("__md5")
      .agg(min(col("id")).as("__keep"))
    val withKeep = afterExactState.join(keeper, Seq("__md5"))
      .localCheckpoint(eager = true)
    rejectPiece(withKeep.filter(col("id") =!= col("__keep"))
      .select(col("id"), col("__keep").as("__dup_of")), "exact_dup")
    val exact = withKeep.filter(col("id") === col("__keep"))
      .select("id", "v", "__md5").localCheckpoint(eager = true)
    stage("exact_dedup", exact.count())
    val nonzero = exact
      .filter(expr("aggregate(v, 0D, (a, x) -> a + x * x)") > lit(0.0))
      .localCheckpoint(eager = true)

    // the frozen centroid rule: stored set, or (bootstrap) the md5
    // sample of this batch's exact-surviving non-zero vectors
    val centroids =
      if (haveState)
        spark.read.parquet(s"$stateDir/sem/centroids")
          .select(col("cid").as("id"), col("cv").as("v"))
      else
        Curation.semCentroidSample(nonzero.select("id", "v"),
          cfg.centroidEvery).localCheckpoint(eager = true)

    // semantic near-dup: against state, then within batch
    val afterOld =
      if (!haveState) exact
      else {
        val hits = Curation.semNearDupAgainstIndex(spark,
            s"$stateDir/sem",
            nonzero.select(col("id"), col("v")), cfg.thresholdE4,
            excludeBatch = Some(batchId),
            bloomBits = effBloomBits)
          .groupBy("id_new").agg(min(col("id_old")).as("__dup_of"))
          .select(col("id_new").as("id"), col("__dup_of"))
          .localCheckpoint(eager = true)
        rejectPiece(hits, "near_dup")
        exact.join(hits.select("id"), Seq("id"), "left_anti")
          .localCheckpoint(eager = true)
      }
    val survNonzero = nonzero.join(afterOld.select("id"), Seq("id"),
      "left_semi")
    val pairsM = graft.operators.Similarity.ivfNearDupPairsManaged(
      survNonzero.select("id", "v"), centroids,
      cfg.thresholdE4 / 10000.0, cfg.nassign)
    val compM = Dedup.connectedComponentsManaged(
      pairsM.df.select("idA", "idB"))
    val victims = compM.df.filter(col("id") =!= col("label"))
      .select(col("id"), col("label").as("__dup_of"))
      .localCheckpoint(eager = true)
    compM.close(); pairsM.close()
    rejectPiece(victims, "near_dup")
    val admitted = afterOld
      .join(victims.select("id"), Seq("id"), "left_anti")
      .localCheckpoint(eager = true)
    stage("near_dup", admitted.count())
    led += admitted.select(col("id"), lit(true).as("admitted"),
        lit("admitted").as("reason"), col("id").as("dup_of"))
      .localCheckpoint(eager = true)

    // persist: keys -> ledger -> metrics -> sem index (meta = marker)
    val ledger = led.reduce(_ unionByName _)
      .select(col("id"), col("admitted"), col("reason"), col("dup_of"))
      .localCheckpoint(eager = true)
    val nLed = ledger.count()
    require(nLed == counts.head._2,
      s"curateEmbeddingIncrement: ledger rows $nLed != " +
        s"batch ${counts.head._2}")
    def writer(df: DataFrame, path: String): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic").parquet(path)
    if (haveState || admitted.head(1).nonEmpty) {
      writeExactKeyRows(admitted.select(col("__md5").as("key"), col("id")),
        s"$stateDir/exact", batchId)
      writer(ledger, s"$stateDir/ledger")
      writer(counts.toSeq.toDF("stage", "rows"), s"$stateDir/metrics")
      val admNonzero = nonzero
        .join(admitted.select("id"), Seq("id"), "left_semi")
        .select("id", "v")
      if (haveState)
        Curation.appendSemVectors(spark, s"$stateDir/sem", admNonzero,
          batchId)
      else
        Curation.writeSemIndex(admNonzero, centroids, s"$stateDir/sem",
          cfg.centroidEvery, cfg.nassign, batchId)
    }
    IncrementResult(ledger, admitted.select("id"), counts.toSeq)
  }

  // ---- retraction (right-to-be-forgotten) --------------------------------

  private val RetractableTables = Seq(
    "exact/keys", "minhash/shingles", "minhash/bands", "sem/assigned",
    "windows", "phash/sigs", "audio/fps", "audio/sizes", "video/frames",
    "video/sizes")

  /** Remove documents/media from the ACCUMULATED increment state — the
    * deletion request a production corpus must honor (a retracted doc
    * must stop causing exact/near/semantic dup verdicts, and a
    * resubmission of the same content must admit fresh). Sweeps every
    * state sub-table present under `stateDir` (text, image, audio,
    * video, semantic — they share the id + batch_id-partition layout):
    * only the partitions actually holding the ids rewrite (dynamic
    * overwrite), partitions the retraction empties are deleted, and
    * everything else — including the commit markers — is untouched, so
    * batch visibility never changes. The LEDGER keeps its one-row-per-
    * submission accounting: retracted ids' rows flip to
    * (admitted = false, reason = "retracted") instead of vanishing.
    *
    * Contracts and caveats (documented, by design):
    *  - IDEMPOTENT and crash-rerunnable: a retraction that died mid-
    *    sweep reruns with the same ids to completion (each table's
    *    rewrite is independently idempotent).
    *  - `dup_of` audit pointers in OTHER docs' ledger rows may reference
    *    a retracted id — the verdict history is the record of what
    *    happened, not a live join target.
    *  - Docs REJECTED earlier as dups of a retracted doc are not
    *    resurrected (they were never admitted; their content re-enters
    *    by resubmission if wanted).
    */
  def retract(spark: SparkSession, stateDir: String,
              ids: DataFrame): Unit = {
    val idsN = ids.select(col(ids.columns.head).cast("long").as("id"))
      .distinct().localCheckpoint(eager = true)
    val f = fs(spark, stateDir)
    for (sub <- RetractableTables)
      retractRows(spark, f, s"$stateDir/$sub", idsN)
    // the frozen centroid set stores FULL embedding vectors of sampled
    // docs (cid = doc id) — a deletion request covers that derived copy
    // too. Dropping a centroid narrows future candidate routing (stored
    // vectors in its cell pair only through their OTHER cells) until a
    // semRetrain re-draws the set from the post-retraction corpus — run
    // one after retracting centroid members; correctness (no retracted
    // content served) holds immediately.
    val centPath = s"$stateDir/sem/centroids"
    if (f.exists(new org.apache.hadoop.fs.Path(centPath))) {
      val cents = spark.read.parquet(centPath)
      val hit = cents.join(idsN.select(col("id").as("cid")), Seq("cid"),
        "left_semi").limit(1).count() > 0
      if (hit) {
        val kept = cents.join(idsN.select(col("id").as("cid")),
            Seq("cid"), "left_anti")
          .localCheckpoint(eager = true)
        kept.write.mode("overwrite").parquet(centPath)
      }
    }
    markLedgerRetracted(spark, f, s"$stateDir/ledger", idsN)
  }

  /** Drop `ids` rows from one batch_id-partitioned state table IN
    * PLACE: rewrite only the partitions holding them, delete the ones
    * the retraction empties. The rewritten frame is eagerly
    * materialized BEFORE the overwrite (the write would otherwise
    * re-scan files it is replacing).
    */
  private def retractRows(spark: SparkSession,
                          f: org.apache.hadoop.fs.FileSystem,
                          path: String, ids: DataFrame): Unit = {
    if (!f.exists(new org.apache.hadoop.fs.Path(path))) return
    val tbl = spark.read.parquet(path)
    val affected = tbl.join(ids, Seq("id"), "left_semi")
      .select("batch_id").distinct().collect().map(_.getString(0))
    if (affected.isEmpty) return
    val rewritten = tbl
      .filter(col("batch_id").isInCollection(affected.toSeq))
      .join(ids, Seq("id"), "left_anti")
      .localCheckpoint(eager = true)
    val still = rewritten.select("batch_id").distinct()
      .collect().map(_.getString(0)).toSet
    rewritten.write.mode("overwrite").partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic").parquet(path)
    // a partition the retraction EMPTIES is not present in `rewritten`,
    // so dynamic overwrite leaves its old files live — replace it with a
    // zero-row schema-ful parquet (NOT a bare dir delete: an all-empty
    // table directory would fail schema inference on the next read)
    for (b <- affected if !still.contains(b))
      rewritten.drop("batch_id").limit(0)
        .write.mode("overwrite").parquet(s"$path/batch_id=$b")
  }

  private def markLedgerRetracted(spark: SparkSession,
                                  f: org.apache.hadoop.fs.FileSystem,
                                  path: String, ids: DataFrame): Unit = {
    if (!f.exists(new org.apache.hadoop.fs.Path(path))) return
    val tbl = spark.read.parquet(path)
    val affected = tbl.join(ids, Seq("id"), "left_semi")
      .select("batch_id").distinct().collect().map(_.getString(0))
    if (affected.isEmpty) return
    val rewritten = tbl
      .filter(col("batch_id").isInCollection(affected.toSeq))
      .join(ids.withColumn("__r", lit(true)), Seq("id"), "left_outer")
      .select(col("id"),
        when(col("__r"), lit(false)).otherwise(col("admitted"))
          .as("admitted"),
        when(col("__r"), lit("retracted")).otherwise(col("reason"))
          .as("reason"),
        when(col("__r"), col("id")).otherwise(col("dup_of")).as("dup_of"),
        col("batch_id"))
      .localCheckpoint(eager = true)
    rewritten.write.mode("overwrite").partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic").parquet(path)
  }

  /** Per-family heavy data tables an increment state accumulates one
    * batch_id partition per increment in — the compaction targets.
    */
  private def foldTables(family: String): Seq[String] = family match {
    case "minhash" => Seq("exact/keys", "windows", "minhash/bands",
      "minhash/shingles")
    case "phash" => Seq("exact/keys", "phash/sigs")
    case "audio" => Seq("exact/keys", "audio/fps", "audio/sizes")
    case "video" => Seq("exact/keys", "video/frames", "video/sizes")
    case "sem" => Seq("exact/keys", "sem/assigned")
    case other => throw new IllegalArgumentException(
      s"compactStateTo: unknown state family '$other'")
  }

  /** Per-family trees compaction copies VERBATIM (audit tables keep
    * their batch ids; a text funnel's `sem/` SUB-state serves through
    * its own meta ∩ the marker's committed set, both preserved; an
    * embedding root's centroid table is unpartitioned; the `decontam/`
    * benchmark family owns its OWN meta marker and its batch ids are
    * eval-set registrations, not increments — folding them would
    * destroy the per-benchmark retraction provenance).
    */
  private def copyTrees(family: String): Seq[String] = family match {
    // text/image/audio/video funnel states can carry a sem SUB-state
    // (its own meta ∩ the marker's committed set governs serving — both
    // survive because the dest marker keeps every original batch id)
    case "minhash" | "phash" | "audio" | "video" =>
      Seq("ledger", "metrics", "sem", "decontam")
    case "sem" => Seq("ledger", "metrics", "sem/centroids", "decontam")
    case _ => Seq("ledger", "metrics", "decontam")
  }

  /** Compact an increment state: after N increments every data table
    * holds N small batch_id partitions, and each new batch's state scan
    * opens all of them. This writes a fresh state at `destDir` with the
    * committed rows of every heavy table folded into ONE `base`
    * partition, preserving serving semantics exactly:
    *
    *  - heavy tables (exact keys, window claims, minhash bands/shingles,
    *    pHash sigs, audio fps/sizes, video frames/sizes per the family)
    *    fold committed-batch rows under batch_id `base`;
    *  - `ledger/` and `metrics/` copy VERBATIM — the audit trail and the
    *    per-batch funnel time series keep their original batch ids;
    *  - a `sem/` sub-state (text funnel) copies verbatim too: its own
    *    meta ∩ the marker's committed set governs its serving, and both
    *    survive because the dest marker keeps every original batch id;
    *  - the marker meta is written LAST, carrying the original committed
    *    rows PLUS a `base` row with the same pinned payload — a crash
    *    anywhere earlier leaves `destDir` without its marker, which
    *    `*stateExists` reads as no-state (loud at the orchestration
    *    layer, never a silently-empty serve), and a rerun overwrites
    *    everything idempotently.
    *
    * Folded batch ids are recorded in a `_folded` sentinel at `destDir`;
    * the increment entry points refuse a retry of a folded id (its rows
    * live under `base`, so the excludeBatch pre-batch view cannot hide
    * them — the rerun would self-dup the whole batch, ADVICE r16).
    *
    * Torn batches in `srcDir` (data without a marker row) are dropped by
    * the committed semi join — compaction is also the physical-erasure
    * completion point for retracted rows' emptied partitions. Run it
    * offline (no concurrent increment against `srcDir`); afterwards
    * point the ingest at `destDir` and decommission the old root.
    */
  def compactStateTo(spark: SparkSession, srcDir: String,
                     destDir: String): Unit = {
    val family = stateFamily(spark, srcDir).getOrElse(
      throw new IllegalArgumentException(
        s"compactStateTo: $srcDir has no _family sentinel — not an " +
          "increment state root"))
    val f = fs(spark, destDir)
    val metaRel = s"$family/meta"
    require(!f.exists(new org.apache.hadoop.fs.Path(s"$destDir/$metaRel")),
      s"compactStateTo: $destDir already has a committed state")
    val meta = spark.read.parquet(s"$srcDir/$metaRel")
    val committed = meta.select("batch_id").distinct()
      .localCheckpoint(eager = true)
    writeFamilySentinel(spark, destDir, family)
    for (rel <- foldTables(family)
         if fs(spark, srcDir).exists(
           new org.apache.hadoop.fs.Path(s"$srcDir/$rel"))) {
      spark.read.parquet(s"$srcDir/$rel")
        .join(broadcast(committed), Seq("batch_id"), "left_semi")
        .drop("batch_id").withColumn("batch_id", lit("base"))
        .write.mode("overwrite").partitionBy("batch_id")
        .parquet(s"$destDir/$rel")
    }
    for (rel <- copyTrees(family)
         if fs(spark, srcDir).exists(
           new org.apache.hadoop.fs.Path(s"$srcDir/$rel"))) {
      val src = new org.apache.hadoop.fs.Path(s"$srcDir/$rel")
      val dst = new org.apache.hadoop.fs.Path(s"$destDir/$rel")
      if (f.exists(dst)) f.delete(dst, true) // idempotent rerun
      org.apache.hadoop.fs.FileUtil.copy(fs(spark, srcDir), src, f, dst,
        false, spark.sparkContext.hadoopConfiguration)
    }
    // folded-batch sentinel BEFORE the marker: the ids whose rows now
    // live under `base` (plus any ids already folded in the source by a
    // prior compaction) — the entry points refuse retries of these
    import scala.jdk.CollectionConverters._
    val foldedIds = (committed.select("batch_id").as[String](
        org.apache.spark.sql.Encoders.STRING)
      .collectAsList().asScala.toSeq.filter(_ != "base") ++
      readFoldedSentinel(spark, srcDir)).distinct
    writeFoldedSentinel(spark, destDir, foldedIds)
    // marker LAST: original committed rows verbatim + the base row. The
    // payload (banding / nBands / dials) is pinned identical across
    // batches by the append paths, so the base row reuses it.
    val payload = meta.drop("batch_id").distinct()
    require(payload.count() == 1L,
      s"compactStateTo: inconsistent meta payload across batches in " +
        s"$srcDir/$metaRel")
    val destMeta = meta
      .unionByName(payload.withColumn("batch_id", lit("base")))
      .localCheckpoint(eager = true)
    destMeta.write.mode("overwrite").partitionBy("batch_id")
      .parquet(s"$destDir/$metaRel")
  }
}
