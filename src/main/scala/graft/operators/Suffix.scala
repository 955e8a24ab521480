package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Ops

/** EXACT any-length substring dedup via distributed suffix ranks — the
  * real Lee et al. 2022 ("Deduplicating Training Data Makes Language
  * Models Better") ExactSubstr semantics that
  * [[Curation.duplicateWindowsMulti]] only approximates at window
  * granularity: a position is duplicated text iff SOME substring of
  * length ≥ `minLen` tokens through it occurs elsewhere in the corpus,
  * with exact (token-granular) repeat boundaries.
  *
  * The single-node reference implementation builds a suffix array; the
  * distributed re-expression is PREFIX DOUBLING (the Manber–Myers
  * construction, the textbook log-round suffix ranking for
  * shared-nothing engines):
  *
  *  1. The corpus becomes one global token stream (per-doc unique
  *     sentinel tokens stop every match at document boundaries), global
  *     positions via the range-partitioned [[Ops.globalRank]].
  *  2. log₂(cap) doubling rounds: round k ranks each suffix by the pair
  *     (rank of first 2ᵏ tokens, rank of next 2ᵏ tokens) — one
  *     self-equi-join on the shifted position plus one dense re-rank
  *     (globalRank over the DISTINCT pairs, joined back, so equal
  *     prefixes share a rank). Each round localCheckpoints — the
  *     [[Dedup.connectedComponents]] iterative-plan discipline.
  *  3. Suffixes sort by their final (cap-token) rank; the classic
  *     suffix-array property says every suffix's best-LCP partner is
  *     ADJACENT in that order, so only n−1 neighbor pairs need LCP —
  *     computed exactly by binary descent over the retained per-round
  *     rank tables (2 equi joins per level: ranks at offset `acc` into
  *     both suffixes; equal → acc += 2ᵏ).
  *  4. Every position with neighbor-LCP ≥ `minLen` marks the interval
  *     [pos, pos+lcp); per-doc merged-interval coverage is the same
  *     islands arithmetic as the windowed family.
  *
  * LCP values saturate at cap−1, but COVERAGE is exact for any
  * `minLen ≤ cap−1`: each position inside a long repeat heads its own
  * ≥-minLen suffix match, so the union of saturated intervals equals
  * the union of true intervals (the overlap-chain argument; spec-pinned
  * against brute force).
  *
  * Cost model, honestly: ~log₂(cap) rounds × (1 shifted self-join + 1
  * distinct + 2 rank shuffles) + log₂(cap) × 2 descent joins — ~40
  * hash/range exchanges over n = corpus-token rows, every one
  * key-partitioned (zero single-partition stages, plan-pinned). That is
  * the price of EXACT boundaries; the one-scan windowed family remains
  * the cheap screen, this is the precise instrument. At 100 TB, run it
  * per shard (repeats across shards are then caught by the windowed
  * screen) or on the post-screen survivor corpus.
  */
object Suffix {

  /** Sentinel token terminating each doc inside the global stream:
    * NUL-prefixed doc id — [[Dedup.normalizeWords]] output is
    * `[a-z0-9]+` only (never contains a NUL), so no real token
    * collides and no two docs share a sentinel (every cross-doc match
    * stops at the boundary). Written as the `\u0000` ESCAPE, not a raw
    * byte — a raw NUL makes git/grep treat the whole source file as
    * binary (caught in review).
    */
  private def withSentinel(idCol: String): Column =
    concat(col("__ws"),
      array(concat(lit("\u0000"), col(idCol).cast("string"))))

  /** (g, doc, pos, tok): the corpus as one globally-indexed token
    * stream, `g` contiguous 1-based over (doc, pos), sentinels included.
    */
  private def tokenStream(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val toks = Ops.widen(docs)
      .select(col(idCol).as("__doc"),
        Dedup.normalizeWords(coalesce(col(textCol), lit(""))).as("__ws"))
      .select(col("__doc"),
        posexplode(withSentinel("__doc")).as(Seq("pos", "tok")))
    Ops.globalRank(toks, Seq(col("__doc"), col("pos")), "g",
      pinned = true)
      .select(col("g"), col("__doc").as("doc"), col("pos"), col("tok"))
  }

  /** Per-position maximum LCP with any OTHER suffix, saturated at
    * cap−1: (g, doc, pos, maxcp), sentinel rows excluded. The prefix-
    * doubling + neighbor-descent pipeline above; `cap` must be a power
    * of two.
    */
  def suffixMaxLcp(docs: DataFrame, idCol: String, textCol: String,
                   cap: Int = 512): DataFrame = {
    require(cap >= 2 && (cap & (cap - 1)) == 0,
      s"suffixMaxLcp: cap ($cap) must be a power of two >= 2")
    val st = tokenStream(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // rank of the 1-token prefix: dense over the (bounded) vocabulary
      val r0 = Ops.globalRank(st.select("tok").distinct(),
        Seq(col("tok")), "r", pinned = true)
      var r = st.join(r0, Seq("tok")).select(col("g"), col("r"))
        .localCheckpoint(true)
      var width = 1L
      val levels = scala.collection.mutable.ArrayBuffer[(Long, DataFrame)]()
      levels += ((width, r))
      val n = st.count()
      var done = false
      while (width < cap && !done) {
        val shifted = r.select((col("g") - lit(width)).as("g"),
          col("r").as("r2"))
        val paired = r.join(shifted, Seq("g"), "left_outer")
          .select(col("g"), col("r"),
            coalesce(col("r2"), lit(0L)).as("r2")) // past-end sorts first
        val dp = paired.select("r", "r2").distinct()
          .localCheckpoint(true) // feeds both the rank and the stop test
        val dr = Ops.globalRank(dp, Seq(col("r"), col("r2")), "nr",
          pinned = true)
        r = paired.join(dr, Seq("r", "r2"))
          .select(col("g"), col("nr").as("r"))
          .localCheckpoint(true) // cut the per-round lineage growth
        width *= 2
        levels += ((width, r))
        // Manber–Myers termination: all ranks distinct ⇒ no two
        // suffixes share a width-token prefix ⇒ every LCP < width and
        // deeper levels cannot refine anything
        done = dp.count() == n
      }
      // neighbor pairs in final suffix order (rank, g tiebreak for the
      // cap-prefix ties — those pairs saturate in the descent anyway)
      val ord = Ops.globalRank(r, Seq(col("r"), col("g")), "s", pinned = true)
        .select(col("g"), col("s"))
      var pairs = ord.select(col("g").as("ga"), col("s"))
        .join(ord.select(col("g").as("gb"), (col("s") - 1).as("s")),
          Seq("s"))
        .select(col("ga"), col("gb"))
        .withColumn("acc", lit(0L))
      // binary LCP descent, largest width first
      for ((w, rk) <- levels.init.reverse) {
        val ra = rk.select(col("g").as("__gra"), col("r").as("__ra"))
        val rb = rk.select(col("g").as("__grb"), col("r").as("__rb"))
        pairs = pairs
          .join(ra, col("__gra") === col("ga") + col("acc"), "left_outer")
          .join(rb, col("__grb") === col("gb") + col("acc"), "left_outer")
          .withColumn("acc",
            when(col("__ra").isNotNull && col("__ra") === col("__rb"),
              col("acc") + lit(w)).otherwise(col("acc")))
          .drop("__gra", "__ra", "__grb", "__rb")
          // materialize per level: without the barrier CollapseProject
          // inlines the accumulated `acc` expression into the next
          // level's join keys and the plan (and its codegen) grows
          // multiplicatively per level — measured as minutes of
          // planning on a 50k-token corpus
          .localCheckpoint(true)
      }
      val maxcp = pairs.select(col("ga").as("g"), col("acc"))
        .unionByName(pairs.select(col("gb").as("g"), col("acc")))
        .groupBy("g").agg(max(col("acc")).as("maxcp"))
      st.filter(!col("tok").startsWith("\u0000"))
        .join(maxcp, Seq("g"), "left_outer")
        .select(col("g"), col("doc"), col("pos"),
          coalesce(col("maxcp"), lit(0L)).as("maxcp"))
        .localCheckpoint(true) // the levels/pairs lineage ends here
    } finally st.unpersist()
  }

  /** Per-doc duplicated-text coverage under the EXACT criterion:
    * (idCol, n_tokens, dup_tokens) where `dup_tokens` counts tokens
    * inside some ≥ `minLen`-token substring that occurs elsewhere
    * (anywhere in the corpus, other docs or the same doc). The
    * merged-interval islands arithmetic of [[Curation.duplicateWindows]]
    * over the [pos, pos+maxcp) marks.
    */
  def suffixDuplicateStats(docs: DataFrame, idCol: String, textCol: String,
                           minLen: Int = 50, cap: Int = 512): DataFrame = {
    require(minLen >= 1 && minLen <= cap - 1,
      s"suffixDuplicateStats: need 1 <= minLen ($minLen) <= cap-1 " +
        s"(${cap - 1}) — saturated LCPs must still clear the threshold")
    statsFromMarks(normalizedBase(docs, idCol, textCol),
      globalMarks(docs, idCol, textCol, minLen, cap), idCol)
  }

  /** (idCol, __ws) — the normalized-token frame both mark consumers
    * project from.
    */
  private def normalizedBase(docs: DataFrame, idCol: String,
                             textCol: String): DataFrame =
    Ops.widen(docs).select(col(idCol),
      Dedup.normalizeWords(coalesce(col(textCol), lit(""))).as("__ws"))

  /** The single-stream mark set (doc, pos 1-based, len) — one
    * [[suffixMaxLcp]] pipeline (its contract leaves the LCP frame
    * localCheckpointed, so several consumers share the expensive part).
    */
  private def globalMarks(docs: DataFrame, idCol: String, textCol: String,
                          minLen: Int, cap: Int): DataFrame =
    suffixMaxLcp(docs, idCol, textCol, cap)
      .filter(col("maxcp") >= minLen)
      .select(col("doc"), (col("pos") + 1).as("pos"), // 1-based like windows
        col("maxcp").as("len"))

  /** Coverage stats from a mark set: union interval arithmetic per doc
    * (ordered marks, running covered-end), summed to `dup_tokens` —
    * shared by the single-stream, sharded, and combined-report forms.
    */
  private def statsFromMarks(base: DataFrame, marks: DataFrame,
                             idCol: String): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy("pos", "len")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val stats = marks
      .select(col("doc"), col("pos").cast("long").as("pos"),
        col("len").cast("long").as("len"))
      .withColumn("__pe", max(col("pos") + col("len")).over(byDoc))
      .withColumn("__cov", greatest(lit(0L),
        col("pos") + col("len") -
          greatest(col("pos"), coalesce(col("__pe"), lit(0L)))))
      .groupBy("doc")
      .agg(sum("__cov").as("dup_tokens"))
    base
      .select(col(idCol), size(col("__ws")).cast("long").as("n_tokens"))
      .join(stats.withColumnRenamed("doc", idCol), Seq(idCol), "left_outer")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).cast("long").as("dup_tokens"))
  }

  /** Cleaned text from a mark set: drop every covered token position,
    * rebuild the normalized stream — shared by the same three forms.
    */
  private def cleanFromMarks(base: DataFrame, marks: DataFrame,
                             idCol: String): DataFrame = {
    val spans = marks
      .select(col("doc"), col("pos").cast("int").as("pos"),
        col("len").cast("int").as("len"))
      .groupBy("doc")
      .agg(sort_array(collect_list(struct(col("pos"), col("len"))))
        .as("__ps"))
    base.select(col(idCol), col("__ws"))
      .join(spans.withColumnRenamed("doc", idCol), Seq(idCol), "left_outer")
      .withColumn("__ps", coalesce(col("__ps"),
        expr("CAST(array() AS array<struct<pos:int,len:int>>)")))
      .withColumn("__kept", expr(
        "filter(transform(__ws, (t, i) -> struct(t AS t, i + 1 AS i)), " +
          "s -> NOT exists(__ps, p -> s.i >= p.pos AND s.i < p.pos + p.len))"))
      .select(col(idCol),
        expr("array_join(transform(__kept, s -> s.t), ' ')")
          .as("cleaned_text"),
        (size(col("__ws")) - size(col("__kept"))).cast("long")
          .as("n_removed_tokens"))
  }

  /** BOTH consumers of the single-stream pipeline from ONE
    * [[suffixMaxLcp]] run: (idCol, n_tokens, dup_tokens, cleaned_text,
    * n_removed_tokens). The stats and cleaner tails are doc-bounded
    * projections of the shared checkpointed mark set — callers that
    * need both ([[suffixDuplicateStats]] + [[removeDuplicateSpansExact]])
    * pay the ~40-round suffix descent once instead of twice (the
    * ADVICE-r13 probe-suite finding, generalized to the operator).
    */
  def suffixDuplicateReport(docs: DataFrame, idCol: String,
                            textCol: String, minLen: Int = 50,
                            cap: Int = 512): DataFrame = {
    require(minLen >= 1 && minLen <= cap - 1,
      s"suffixDuplicateReport: need 1 <= minLen ($minLen) <= cap-1")
    val base = normalizedBase(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val marks = globalMarks(docs, idCol, textCol, minLen, cap)
    val out = statsFromMarks(base, marks, idCol)
      .join(cleanFromMarks(base, marks, idCol), Seq(idCol))
      .localCheckpoint(eager = true)
    base.unpersist()
    out
  }

  /** [[suffixDuplicateReport]] over the SHARDED mark set — one
    * [[withShardedMarks]] pipeline, both outputs.
    */
  def shardedDuplicateReport(docs: DataFrame, idCol: String,
                             textCol: String, minLen: Int = 50,
                             cap: Int = 512, numShards: Int = 4,
                             shardConcurrency: Int = 4): DataFrame =
    withShardedMarks(docs, idCol, textCol, minLen, cap, numShards,
        shardConcurrency) { (sharded, marks0) =>
      // two consumers: pin the union mark set (the shard passes are
      // already checkpointed; this stops the screen running twice)
      val marks = marks0.localCheckpoint(eager = true)
      statsFromMarks(sharded, marks, idCol)
        .join(cleanFromMarks(sharded, marks, idCol), Seq(idCol))
    }

  /** SHARDED exact-substring coverage — the 100 TB deployment shape of
    * [[suffixDuplicateStats]] (the Lee et al. production layout): the
    * corpus splits into `numShards` content-defined doc shards
    * (xxhash64 of the text, so byte-identical docs co-shard and their
    * full-length repeats stay inside ONE precise pass), the suffix-rank
    * pipeline runs per shard as INDEPENDENT job chains (each over n/S
    * tokens — the ~40 bounded global shuffles of the single-stream form
    * shrink by the shard factor and the chains overlap via concurrent
    * submission), and repeats WHOSE OCCURRENCES STRADDLE SHARDS — the
    * only thing a per-shard pass can miss — are caught by one
    * corpus-global window screen at w = `minLen` with ALL-occurrence
    * semantics (hash groups spanning ≥ 2 shards mark every occurrence;
    * the keep-first canonical rule of [[Curation.duplicateWindows]]
    * would leave the first instance uncovered and break parity).
    *
    * Coverage is IDENTICAL to the single-stream form, not merely ⊇
    * (spec-pinned): a position the global form covers sits inside a
    * duplicated ≥ minLen span, so some minLen-window through it repeats
    * elsewhere — same-shard partner ⇒ the shard's exact pass covers
    * the span; cross-shard partner ⇒ the screen marks the window. Both
    * mark sources are corpus repeats ≥ minLen, so nothing over-marks.
    * (The union's interval arithmetic absorbs double marks.)
    *
    * Scale shape: the screen is one window explode + one hash aggregate
    * + one 1:N join (the [[Curation.duplicateWindows]] plan — corpus-
    * linear, no all-pairs); the per-shard passes are the honest
    * parallel axis — at 1000 executors, S ~ O(100) shards run their
    * bounded rounds side by side instead of one n-row stream paying
    * 40 sequential global barriers.
    */
  def suffixDuplicateStatsSharded(docs: DataFrame, idCol: String,
                                  textCol: String, minLen: Int = 50,
                                  cap: Int = 512, numShards: Int = 4,
                                  shardConcurrency: Int = 4): DataFrame =
    withShardedMarks(docs, idCol, textCol, minLen, cap, numShards,
        shardConcurrency) { (sharded, marks) =>
      statsFromMarks(sharded, marks, idCol)
    }

  /** The sharded CLEANER — [[removeDuplicateSpansExact]]'s semantics
    * over the sharded mark set: the coverage IDENTITY argument above
    * makes the covered-token set equal to the single-stream form's, so
    * dropping covered tokens yields the SAME cleaned text (spec-pinned;
    * q151 runs against q144's oracle). Output:
    * (idCol, cleaned_text, n_removed_tokens), every input doc once.
    */
  def removeDuplicateSpansExactSharded(docs: DataFrame, idCol: String,
                                       textCol: String, minLen: Int = 50,
                                       cap: Int = 512, numShards: Int = 4,
                                       shardConcurrency: Int = 4): DataFrame =
    withShardedMarks(docs, idCol, textCol, minLen, cap, numShards,
        shardConcurrency) { (sharded, marks) =>
      cleanFromMarks(sharded, marks, idCol)
    }

  /** Shared sharded-marks scaffolding: builds the persisted
    * (idCol, __text, __ws, __shard) frame, runs the per-shard suffix
    * passes concurrently and the cross-shard screen, hands
    * `finish(sharded, marks)` the union mark set (doc, pos 1-based int,
    * len long), and eagerly localCheckpoints its result so the persist
    * and thread pool can be torn down on return.
    */
  private def withShardedMarks(docs: DataFrame, idCol: String,
                               textCol: String, minLen: Int, cap: Int,
                               numShards: Int, shardConcurrency: Int)(
      finish: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    require(minLen >= 1 && minLen <= cap - 1,
      s"sharded suffix dedup: need 1 <= minLen ($minLen) <= cap-1")
    require(numShards >= 1 && shardConcurrency >= 1,
      "sharded suffix dedup: numShards/shardConcurrency >= 1")
    val sharded = Ops.widen(docs)
      .select(col(idCol), coalesce(col(textCol), lit("")).as("__text"),
        Dedup.normalizeWords(coalesce(col(textCol), lit(""))).as("__ws"),
        pmod(xxhash64(coalesce(col(textCol), lit(""))), lit(numShards))
          .as("__shard"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(shardConcurrency)
    try {
      // per-shard EXACT passes: independent corpora (each tokenStream
      // builds its own sentinel-bounded stream), submitted concurrently
      // — Spark schedules their bounded jobs side by side. Each pass
      // ends localCheckpointed (suffixMaxLcp's contract), so awaiting
      // the future materializes the shard's marks.
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val shardMarks = (0 until numShards).map { sId =>
        scala.concurrent.Future {
          suffixMaxLcp(
              sharded.filter(col("__shard") === sId)
                .select(col(idCol), col("__text")),
              idCol, "__text", cap)
            .filter(col("maxcp") >= minLen)
            .select(col("doc"), (col("pos") + 1).as("pos"),
              col("maxcp").as("len"))
        }
      }.map(scala.concurrent.Await
        .result(_, scala.concurrent.duration.Duration.Inf))
      // cross-shard screen: minLen-windows whose content occurs in ≥ 2
      // shards, every occurrence marked (len = minLen exactly — the
      // window IS a ≥ minLen corpus repeat, so marks stay sound)
      val wins = sharded.filter(size(col("__ws")) >= minLen)
        .select(col(idCol), col("__shard"), explode(expr(
          s"transform(sequence(1, size(__ws) - $minLen + 1), " +
            s"i -> struct(i AS pos, " +
            s"md5(array_join(slice(__ws, i, $minLen), ' ')) AS h))"))
          .as("e"))
        .select(col(idCol), col("__shard"), col("e.pos").as("pos"),
          col("e.h").as("h"))
      val crossH = wins.groupBy("h")
        .agg(min(col("__shard")).as("__mn"), max(col("__shard")).as("__mx"))
        .filter(col("__mn") =!= col("__mx"))
        .select("h")
      val screen = wins.join(crossH, Seq("h"))
        .select(col(idCol).as("doc"), col("pos"),
          lit(minLen.toLong).as("len"))
      val marks = (shardMarks :+ screen)
        .map(_.select(col("doc"), col("pos").cast("int").as("pos"),
          col("len").cast("long").as("len")))
        .reduce(_ unionByName _)
      finish(sharded, marks)
        .localCheckpoint(true) // sharded unpersists when we return
    } finally {
      pool.shutdown()
      sharded.unpersist()
    }
  }

  /** The cleaner: drop every token covered by an exact ≥ `minLen`-token
    * repeat and rebuild the normalized stream — Lee et al.'s released
    * semantics (ALL occurrences of duplicated text are removed; the
    * suffix formulation has no per-instance canonical, unlike the
    * windowed cleaner which keeps one copy). Output:
    * (idCol, cleaned_text, n_removed_tokens), every input doc once.
    */
  def removeDuplicateSpansExact(docs: DataFrame, idCol: String,
                                textCol: String, minLen: Int = 50,
                                cap: Int = 512): DataFrame = {
    require(minLen >= 1 && minLen <= cap - 1,
      s"removeDuplicateSpansExact: need 1 <= minLen ($minLen) <= cap-1")
    cleanFromMarks(normalizedBase(docs, idCol, textCol),
      globalMarks(docs, idCol, textCol, minLen, cap), idCol)
  }
}
