package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenization (Kudo 2018; the SentencePiece
  * training objective): pieces carry LIKELIHOODS, not just frequencies —
  * the third tokenizer family beside [[Bpe]] (learned merges) and
  * [[Subword]] (frequency + longest-match). Training seeds a substring
  * candidate vocabulary, runs a distributed E-step (segment the
  * vocabulary-bounded WORD table under the current piece costs, count
  * freq-weighted piece usage), and a driver-local prune/re-estimate
  * (keep every single character for completeness + the top multi-char
  * pieces by usage; add-one smoothed costs) — the [[Bpe]] shape: the
  * corpus explodes once into word frequencies, every round after that
  * touches only vocabulary-bounded tables, and the model is localized
  * under an explicit cap.
  *
  * Decoding is likelihood-greedy: at each position take the matching
  * piece with the LOWEST cost per character (cost·10⁶ fixed-point of
  * −ln p, double ratio — identical arithmetic both engines), ties to the
  * longer piece; unknown characters fall back to themselves, exactly
  * [[Subword.wordPieceEncode]]'s fallback. [[viterbiEncode]] is the
  * exact min-total-cost DP twin (the SentencePiece `--nbest 1` serving
  * rule) — spec-pinned optimal against brute-force enumeration; the
  * greedy form is the oracle-replayable default (its LATERAL probe is
  * SQL-expressible where a min-cost lattice DP is not).
  */
object Unigram {

  /** Candidate seed vocabulary: EVERY single character of the vocabulary
    * words (encoding completeness) plus the top `multiPieces` multi-char
    * substrings by (weighted freq DESC, piece ASC) — the
    * [[Subword.substringCounts]] explode, vocabulary-bounded.
    */
  def seedPieces(wordFreqs: DataFrame, multiPieces: Int,
                 maxPieceLen: Int = 8): DataFrame = {
    require(multiPieces >= 0)
    val chars = Subword.substringCounts(wordFreqs, 1, 1)
    val multi = Subword.substringCounts(wordFreqs, 2, maxPieceLen)
      .orderBy(col("wfreq").desc, col("piece").asc)
      .limit(multiPieces)
    chars.unionByName(multi)
  }

  /** (piece, wfreq) → (piece, cost) with cost = ⌊−ln(wfreq/Σwfreq)·10⁶ +
    * 0.5⌋ — the e6 fixed-point negative log-likelihood every later
    * compare uses.
    */
  def pieceCosts(pieces: DataFrame): DataFrame = {
    val total = broadcast(pieces.agg(
      sum(col("wfreq")).cast("double").as("__tot")))
    pieces.crossJoin(total)
      .select(col("piece"),
        floor(-log(col("wfreq").cast("double") / col("__tot")) * lit(1e6)
          + lit(0.5)).cast("long").as("cost"))
  }

  /** Collected serving model (the bounded-model contract of
    * [[TextStats.KnModel]] / [[Subword.WpModel]]): piece → e6 cost.
    */
  case class UniModel(costs: Map[String, Long], maxPieceLen: Int)

  def collectUniModel(costs: DataFrame, maxPieceLen: Int = 8,
                      maxEntries: Int = 1 << 20): UniModel = {
    val rows = costs.select(col("piece"), col("cost").cast("long"))
      .limit(maxEntries + 1).collect()
    require(rows.length <= maxEntries,
      s"collectUniModel: vocabulary > $maxEntries pieces")
    UniModel(rows.map(r => r.getString(0) -> r.getLong(1)).toMap, maxPieceLen)
  }

  /** Per-length piece-cost sub-maps — see [[Subword.lenMaps]] (the one
    * definition of the probe-partitioning trick both tokenizer families
    * share).
    */
  private def lenMaps(costs: Map[String, Long]): Map[Int, Column] =
    Subword.lenMaps(costs)

  private def probeLen(maps: Map[Int, Column], piece: Column,
                       l: Int): Column =
    Subword.probeLen(maps, piece, l)

  /** The likelihood-greedy segmentation of one word under a broadcast
    * model, as a pure Column fold (the [[Subword.wordPieceEncode]]
    * skeleton with the match rule swapped): per position, among matching
    * pieces minimize cost/len (double ratio), ties to the longer piece;
    * no match → the single character itself. At most `maxWordIters`
    * steps (each consumes ≥ 1 char; cap mirrored in the oracle).
    */
  private def encodeWordGreedy(model: UniModel, maxWordIters: Int)
      : Column => Column = w => {
    val vmaps = lenMaps(model.costs)
    val cs = Bpe.charSymbols(w)
    def pieceAt(pos: Column, l: Int): Column =
      array_join(slice(cs, pos, lit(l)), "")
    val init = struct(lit(1).as("p"),
      array().cast("array<string>").as("acc"))
    aggregate(
      sequence(lit(1), lit(maxWordIters)),
      init,
      (st, _) => {
        val pos = st.getField("p")
        // candidates as an ARRAY of (ratio, -len) structs; array_min
        // skips the null (non-matching) slots and struct ordering is
        // lexicographic — min ratio first, then -len asc = longest of
        // the tied. (An accumulator-fold formulation duplicates the
        // accumulated when-chain 4× per length level — 4^maxPieceLen
        // expression nodes, a driver OOM at analysis time, measured.)
        val cands = array((1 to model.maxPieceLen).map { l =>
          val c = probeLen(vmaps, pieceAt(pos, l), l)
          // boundary guard: slice CLAMPS at the word end, so without it
          // a length-l probe past the end re-matches the tail piece and
          // claims l's (better) ratio — measured, not hypothetical
          when(pos + lit(l - 1) <= size(cs) && c.isNotNull,
            struct((c.cast("double") / lit(l.toDouble)).as("r"),
              lit(-l).as("nl")))
        }: _*)
        val best = array_min(cands)
        val mlen = when(best.isNotNull, -best.getField("nl"))
          .otherwise(lit(1)) // unknown char fallback
        when(pos > size(cs), st).otherwise(struct(
          (pos + mlen).as("p"),
          concat(st.getField("acc"),
            array(array_join(slice(cs, pos, mlen), ""))).as("acc")))
      },
      st => st.getField("acc"))
  }

  /** Distributed E-step: segment every vocabulary WORD under `model`
    * (one fold per word over the vocabulary-bounded table — never the
    * corpus) and sum freq-weighted piece usage. During training every
    * emitted piece exists in the model (its single chars seed from the
    * same words), so usage covers all emissions.
    */
  def pieceUsage(wordFreqs: DataFrame, model: UniModel,
                 maxWordIters: Int = 32): DataFrame =
    wordFreqs
      .select(col("freq"),
        explode(encodeWordGreedy(model, maxWordIters)(col("w"))).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("usage"))

  /** The log-semiring ⊕ in e6 cost space: −ln(e^(−a/10⁶) + e^(−x/10⁶))·10⁶
    * re-rounded to e6 — the softmin every forward/backward combine uses,
    * rounded PER COMBINE so the whole lattice trajectory is
    * integer-exact and oracle-replayable (the e6 discipline). Spelled
    * `ln(1 + exp(·))` literally (not log1p) so the DuckDB twin runs the
    * identical double arithmetic.
    */
  private def combineE6(a: Column, x: Column): Column = {
    val m = least(a, x)
    val d = (greatest(a, x) - m).cast("double")
    m - floor(log(lit(1.0) + exp(-d / lit(1e6))) * lit(1e6) + lit(0.5))
      .cast("long")
  }

  /** Per-word lattice forward–backward: every segmentation edge
    * (position, piece) with its posterior-expected count as e6 fixed
    * point — Kudo 2018's ACTUAL E-step quantity (the greedy
    * [[pieceUsage]] counts only the single best-ratio path and starves
    * every piece that path skips). Forward α and backward β are the
    * [[viterbiEncode]] DP with softmin ([[combineE6]]) in place of min;
    * an edge starting at s with length l has posterior
    * e^(−(α(s−1) + cost + β(s−1+l) − α(N))/10⁶), rounded to e6 per
    * edge. Candidates fold through lambda-bound array aggregates (one
    * `element_at` per reference — the 4^depth accumulator-duplication
    * blowup documented in [[encodeWordGreedy]] never forms). Output:
    * array<struct<piece, cnt_e6>>.
    */
  private def softminOf(cands: Column): Column =
    aggregate(filter(cands, c => c.isNotNull), lit(null).cast("long"),
      (s, c) => when(s.isNull, c).otherwise(combineE6(s, c)))

  private def stepCostOf(vmaps: Map[Int, Column], cs: Column, unkCost: Long)(
      pos: Column, l: Int): Column = {
    val piece = array_join(slice(cs, pos, lit(l)), "")
    if (l == 1) coalesce(probeLen(vmaps, piece, 1), lit(unkCost))
    else probeLen(vmaps, piece, l)
  }

  /** Forward softmin DP over one word: acc(i+1) = α(i), the marginal
    * −ln Σ-over-segmentations cost of chars [1, i] in e6.
    */
  private def forwardArr(model: UniModel, unkCost: Long)
      : Column => Column = w => {
    val vmaps = lenMaps(model.costs)
    val cs = Bpe.charSymbols(w)
    val stepCost = stepCostOf(vmaps, cs, unkCost) _
    aggregate(sequence(lit(1), size(cs)), array(lit(0L)),
      (acc, i) => concat(acc, array(softminOf(array(
        (1 to model.maxPieceLen).map { l =>
          when(i >= lit(l) && stepCost(i - lit(l) + 1, l).isNotNull,
            element_at(acc, i - lit(l) + 1) + stepCost(i - lit(l) + 1, l))
        }: _*)))))
  }

  /** Corpus marginal negative log-likelihood (e6): Σ_w freq(w)·α_w(N)
    * — the EM objective [[trainUnigramEM]] descends (UnigramSpec pins
    * the descent and the EM-vs-greedy comparison on an ambiguous
    * vocabulary). One fold per vocabulary word, one bounded sum.
    */
  def corpusMarginalCostE6(wordFreqs: DataFrame, model: UniModel,
                           unkCost: Long = 100L * 1000000L): Long = {
    val f = forwardArr(model, unkCost)(col("w"))
    wordFreqs
      .select((col("freq") * element_at(f, size(Bpe.charSymbols(col("w")))
        + lit(1))).as("c"))
      .agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
  }

  private def latticeEdgeCounts(model: UniModel, unkCost: Long)
      : Column => Column = w => {
    val vmaps = lenMaps(model.costs)
    val cs = Bpe.charSymbols(w)
    def stepCost(pos: Column, l: Int): Column =
      stepCostOf(vmaps, cs, unkCost)(pos, l)
    def softmin(cands: Column): Column = softminOf(cands)
    // acc(i+1) = α(i): softmin path cost of chars [1, i]
    val fwd = forwardArr(model, unkCost)(w)
    // acc(j+1) = β(N−j), stored back-to-front: β(N−j) folds pieces
    // STARTING at N−j+1 with length l ≤ j into β(N−j+l) = acc(j−l+1)
    val bwd = aggregate(sequence(lit(1), size(cs)), array(lit(0L)),
      (acc, j) => concat(acc, array(softmin(array((1 to model.maxPieceLen)
        .map { l =>
          when(j >= lit(l) &&
              stepCost(size(cs) - j + lit(1), l).isNotNull,
            element_at(acc, j - lit(l) + 1) +
              stepCost(size(cs) - j + lit(1), l))
        }: _*)))))
    // bind both DP tables as lambda variables (each edge reads them ~3×)
    val edges = transform(array(struct(fwd.as("f"), bwd.as("b"))), fb => {
      val f = fb.getField("f")
      val b = fb.getField("b")
      val n = size(cs)
      val z = element_at(f, n + 1)
      // lengths statically unrolled (1..maxPieceLen literals instead of a
      // sequence lambda variable) so each probe hits its per-length
      // sub-map; the out-of-range guard replaces the sequence bound and
      // the same isNotNull filter drops exactly the same slots
      flatten(transform(sequence(lit(1), n), s =>
        filter(
          array((1 to model.maxPieceLen).map { lvi =>
            val lv = lit(lvi)
            val piece = array_join(slice(cs, s, lv), "")
            val c =
              if (lvi == 1) coalesce(probeLen(vmaps, piece, 1), lit(unkCost))
              else probeLen(vmaps, piece, lvi)
            when(lv <= n - s + lit(1) && c.isNotNull,
              struct(piece.as("piece"),
                floor(exp(-(element_at(f, s) + c +
                    element_at(b, n - s - lv + lit(2)) - z).cast("double") /
                  lit(1e6)) * lit(1e6) + lit(0.5)).cast("long").as("cnt_e6")))
          }: _*),
          e => e.isNotNull)))
    })
    element_at(edges, 1)
  }

  /** Distributed FULL-EM E-step: lattice forward–backward expected
    * piece counts over the vocabulary-bounded word table —
    * `usage_e6(p) = Σ_w freq(w) · E[#p in w's segmentation] · 10⁶`.
    * Unlike [[pieceUsage]]'s greedy counts, a piece on a competitive
    * but non-best path still accrues its posterior mass, so ambiguous
    * vocabularies re-estimate toward the likelihood optimum instead of
    * freezing the greedy path's choices (UnigramSpec pins both the
    * posterior algebra and the quality win). Same scale shape as
    * [[pieceUsage]]: one fold per WORD (never the corpus), one
    * hash-partitioned aggregate.
    */
  def pieceUsageExpected(wordFreqs: DataFrame, model: UniModel,
                         unkCost: Long = 100L * 1000000L): DataFrame =
    wordFreqs
      .select(col("freq"),
        explode(latticeEdgeCounts(model, unkCost)(col("w"))).as("e"))
      .select(col("freq"), col("e.piece").as("piece"),
        col("e.cnt_e6").as("cnt_e6"))
      .groupBy("piece")
      .agg(sum(col("freq") * col("cnt_e6")).as("usage_e6"))

  /** Best segmentation cost of `p`'s OWN string under `model`
    * EXCLUDING `p` itself — what the corpus would pay per occurrence if
    * `p` were pruned (driver-local Viterbi over a ≤ maxPieceLen-char
    * string; the vocabulary-bounded localize discipline).
    */
  private def altSegCost(p: String, model: UniModel,
                         unkCost: Long = 100L * 1000000L): Long = {
    val n = p.length
    val best = Array.fill(n + 1)(Long.MaxValue / 4)
    best(0) = 0L
    for (i <- 1 to n; l <- 1 to math.min(model.maxPieceLen, i)) {
      val piece = p.substring(i - l, i)
      if (piece != p) {
        val c = model.costs.get(piece)
          .orElse(if (l == 1) Some(unkCost) else None)
        c.foreach { cc =>
          if (best(i - l) + cc < best(i)) best(i) = best(i - l) + cc
        }
      }
    }
    best(n)
  }

  /** Full-EM training — [[trainUnigram]]'s exact skeleton (seed →
    * E-step → driver-local prune + add-one re-estimate per round) with
    * [[pieceUsageExpected]] lattice counts in place of the greedy
    * segmentation counts; add-one smoothing is +10⁶ in the e6 unit (the
    * normalizing total cancels the scale inside [[pieceCosts]]).
    *
    * `pruneBy = "usage"` ranks multi-char pieces by expected count (the
    * [[trainUnigram]] rule); `"loss"` ranks by Kudo §3.2's actual
    * criterion — the likelihood the corpus LOSES if the piece is
    * removed, `usage(p) · (altCost(p) − cost(p))` with [[altSegCost]]
    * as the re-segmentation price. The difference bites on
    * compositional vocabularies: a high-usage piece whose pieces are
    * cheap (removal nearly free) prunes before a lower-usage piece with
    * no good alternative (UnigramSpec pins the flip and the marginal-
    * cost win). Loss ranking localizes the multi-piece usage table
    * (bounded by the seed size) for the driver-side DP.
    */
  def trainUnigramEM(wordFreqs: DataFrame, vocabSize: Int, rounds: Int = 1,
                     seedMultiplier: Int = 4, maxPieceLen: Int = 8,
                     maxEntries: Int = 1 << 20,
                     pruneBy: String = "usage"): DataFrame = {
    require(vocabSize >= 1 && rounds >= 1 && seedMultiplier >= 1)
    require(pruneBy == "usage" || pruneBy == "loss",
      s"trainUnigramEM: pruneBy must be usage|loss, got '$pruneBy'")
    val spark = wordFreqs.sparkSession
    import spark.implicits._
    // the word table feeds every training action (char seed, candidate
    // seed, one E-step per round) — persist it once instead of replaying
    // the corpus explode+aggregate per action; the returned vocab is
    // checkpoint-detached below so the unpersist can't strand a consumer
    val wf = wordFreqs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val chars = Subword.substringCounts(wf, 1, 1)
      .select("piece").as[String].collect().toSet // bounded: alphabet size
    var model = collectUniModel(
      pieceCosts(seedPieces(wf, seedMultiplier * vocabSize,
        maxPieceLen)),
      maxPieceLen, maxEntries)
    var kept: DataFrame = null
    for (_ <- 1 to rounds) {
      val usage = pieceUsageExpected(wf, model)
      val charRows = chars.toSeq.sorted.toDF("piece")
        .join(usage, Seq("piece"), "left_outer")
        .select(col("piece"),
          coalesce(col("usage_e6"), lit(0L)).as("usage_e6"))
      val nMulti = math.max(0, vocabSize - chars.size)
      val multiAll = usage.filter(length(col("piece")) >= 2)
      val multi =
        if (pruneBy == "usage")
          multiAll.orderBy(col("usage_e6").desc, col("piece").asc)
            .limit(nMulti)
        else {
          val m0 = model
          val ranked = multiAll.select("piece", "usage_e6")
            .as[(String, Long)].collect() // bounded: ≤ seed size
            .map { case (p, u) =>
              val own = m0.costs.getOrElse(p, Long.MaxValue / 4)
              val loss = BigInt(u) *
                BigInt(math.max(0L, altSegCost(p, m0) - own))
              (p, u, loss)
            }
            .sortBy { case (p, _, l) => (-l, p) }
            .take(nMulti)
          ranked.toSeq.map(t => (t._1, t._2)).toDF("piece", "usage_e6")
        }
      kept = charRows.unionByName(multi)
        .select(col("piece"), (col("usage_e6") + lit(1000000L)).as("wfreq"))
      model = collectUniModel(pieceCosts(kept), maxPieceLen, maxEntries)
    }
    // vocab-bounded (≤ vocabSize rows): detach from the word-table
    // lineage so the finally-unpersist can't force a corpus replay on
    // the caller's consuming action
    pieceCosts(kept).localCheckpoint(eager = true)
    } finally { wf.unpersist(blocking = false); () }
  }

  /** Train: seed → per-round (distributed E-step → driver-local prune +
    * add-one re-estimate). Final vocabulary = every seed character +
    * the top (`vocabSize` − nChars) multi-char pieces by (usage DESC,
    * piece ASC); costs from smoothed usage (usage+1 over the kept set —
    * a kept-but-unused char keeps a finite cost). Returns the
    * (piece, cost) table; localize with [[collectUniModel]] to serve.
    */
  def trainUnigram(wordFreqs: DataFrame, vocabSize: Int, rounds: Int = 1,
                   seedMultiplier: Int = 4, maxPieceLen: Int = 8,
                   maxWordIters: Int = 32,
                   maxEntries: Int = 1 << 20): DataFrame = {
    require(vocabSize >= 1 && rounds >= 1 && seedMultiplier >= 1)
    val spark = wordFreqs.sparkSession
    import spark.implicits._
    // same word-table persist + checkpoint-detach as [[trainUnigramEM]]
    val wf = wordFreqs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val chars = Subword.substringCounts(wf, 1, 1)
      .select("piece").as[String].collect().toSet // bounded: alphabet size
    var model = collectUniModel(
      pieceCosts(seedPieces(wf, seedMultiplier * vocabSize,
        maxPieceLen)),
      maxPieceLen, maxEntries)
    var kept: DataFrame = null
    for (_ <- 1 to rounds) {
      val usage = pieceUsage(wf, model, maxWordIters)
      val charRows = chars.toSeq.sorted.toDF("piece")
        .join(usage, Seq("piece"), "left_outer")
        .select(col("piece"), coalesce(col("usage"), lit(0L)).as("usage"))
      val nMulti = math.max(0, vocabSize - chars.size)
      val multi = usage.filter(length(col("piece")) >= 2)
        .orderBy(col("usage").desc, col("piece").asc)
        .limit(nMulti)
      kept = charRows.unionByName(multi)
        .select(col("piece"), (col("usage") + lit(1L)).as("wfreq"))
      model = collectUniModel(pieceCosts(kept), maxPieceLen, maxEntries)
    }
    pieceCosts(kept).localCheckpoint(eager = true)
    } finally { wf.unpersist(blocking = false); () }
  }

  /** Likelihood-greedy document encoding under a trained model: output
    * (idCol, n_pieces, enc) — the [[Subword.wordPieceEncode]] surface
    * with the unigram match rule. Pure per-row HOF arithmetic over the
    * broadcast model; no shuffle, no UDF.
    */
  def unigramEncode(docs: DataFrame, idCol: String, textCol: String,
                    model: UniModel, maxWordIters: Int = 32): DataFrame = {
    val words = Dedup.normalizeWords(col(textCol))
    graft.core.Ops.widen(docs)
      .select(col(idCol),
        flatten(transform(words,
          encodeWordGreedy(model, maxWordIters))).as("__ps"))
      .select(col(idCol), size(col("__ps")).cast("long").as("n_pieces"),
        array_join(col("__ps"), "|").as("enc"))
  }

  /** Subword-regularization sampling encode (Kudo 2018 §4; SentencePiece
    * `--nbest_size -1 --alpha`): segment each word by SAMPLING from the
    * posterior over segmentations, P(seg) ∝ exp(−α·C(seg)) — the
    * augmentation that exposes a model to many tokenizations of the same
    * text instead of freezing the single best one. α (`alphaE4`/10⁴) is
    * the temperature: large α concentrates on the Viterbi path
    * (spec-pinned equal at high α), α→0 flattens toward uniform over
    * segmentations.
    *
    * Mechanics — forward-filtering backward-sampling, integer-exact and
    * oracle-replayable end to end:
    *
    *  1. α is applied by scaling every piece cost DRIVER-SIDE
    *     (`c·alphaE4 div 10⁴` — exact long arithmetic, no per-row
    *     scaling expression), so at the default `alphaE4 = 10000` the
    *     lattice runs the unscaled model bit-for-bit.
    *  2. Forward: [[forwardArr]]'s softmin DP (the [[combineE6]]
    *     log-semiring, e6 re-round per combine) under the scaled costs.
    *  3. Backward, from the word end: each candidate edge (length l
    *     ending at boundary i) weighs
    *     `⌊exp(−(α(i−l) + c − α(i))/10⁶)·10⁶ + 0.5⌋` — its e6-rounded
    *     posterior; the draw is the repo's seedless-uniform convention
    *     (first 8 md5 hex nibbles of `word:widx:i:seed`, mod 10⁶; widx =
    *     1-based word position, so repeated words in a document sample
    *     independently) and the pick walks candidates in ascending-l
    *     order until the cumulative weight exceeds
    *     `⌊u·Σw/10⁶⌋` — thresholding against the ACTUAL weight total, so
    *     per-edge rounding can never strand a draw.
    *
    * Same output surface as [[viterbiEncode]]; same scale shape (pure
    * per-row HOF folds over the broadcast model — no shuffle, no UDF).
    * Determinism: a fixed (model, seed, alphaE4) gives one fixed
    * segmentation per (word, position) — reproducible training data,
    * replayable oracle; vary `seed` per epoch for fresh samples.
    */
  def sampleEncode(docs: DataFrame, idCol: String, textCol: String,
                   model: UniModel, seed: Long, alphaE4: Long = 10000L,
                   maxWordLen: Int = 32,
                   unkCost: Long = 100L * 1000000L): DataFrame = {
    require(alphaE4 >= 1, s"sampleEncode: alphaE4 must be >= 1, got $alphaE4")
    val m2 = UniModel(
      model.costs.map { case (p, c) => p -> c * alphaE4 / 10000L },
      model.maxPieceLen)
    val unk2 = unkCost * alphaE4 / 10000L
    val vmaps = lenMaps(m2.costs)
    val words = Dedup.normalizeWords(col(textCol))
    val encodeWord: (Column, Column) => Column = (w, widx0) => {
      val cs = Bpe.charSymbols(w)
      val stepCost = stepCostOf(vmaps, cs, unk2) _
      val fwd = forwardArr(m2, unk2)(w)
      // bind the DP table as a lambda variable (read ~3x per step)
      val sampled = transform(array(fwd), f => {
        val init = struct(size(cs).as("p"),
          array().cast("array<string>").as("acc"))
        aggregate(
          sequence(lit(1), lit(maxWordLen)),
          init,
          (st, _) => {
            val i = st.getField("p")
            val cands = filter(array((1 to m2.maxPieceLen).map { l =>
              val c = stepCost(i - lit(l) + 1, l)
              when(i >= lit(l) && c.isNotNull,
                struct(lit(l).as("l"),
                  floor(exp(-(element_at(f, i - lit(l) + 1) + c -
                      element_at(f, i + 1)).cast("double") / lit(1e6))
                    * lit(1e6) + lit(0.5)).cast("long").as("wt")))
            }: _*), e => e.isNotNull)
            // bind the candidate array too: total, threshold, and the
            // cumulative pick all re-read it
            val picked = transform(array(cands), ca => {
              val tot = aggregate(ca, lit(0L),
                (s2, e) => s2 + e.getField("wt"))
              val u = pmod(
                conv(substring(md5(concat_ws(":", w,
                  (widx0 + lit(1)).cast("string"), i.cast("string"),
                  lit(seed.toString))), 1, 8), 16, 10).cast("long"),
                lit(1000000L))
              val ut = u * tot
              val t = ((ut - pmod(ut, lit(1000000L))) / lit(1000000L))
                .cast("long")
              val pick = aggregate(ca,
                struct(lit(0L).as("cum"), lit(null).cast("int").as("l")),
                (s2, e) => when(s2.getField("l").isNotNull, s2)
                  .otherwise(when(
                    s2.getField("cum") + e.getField("wt") > t,
                    struct(s2.getField("cum").as("cum"),
                      e.getField("l").as("l")))
                  .otherwise(struct(
                    (s2.getField("cum") + e.getField("wt")).as("cum"),
                    lit(null).cast("int").as("l")))),
                s2 => s2.getField("l"))
              coalesce(pick, element_at(ca, -1).getField("l"))
            })
            val mlen = element_at(picked, 1)
            when(i <= 0, st).otherwise(struct(
              (i - mlen).as("p"),
              concat(array(array_join(slice(cs, i - mlen + 1, mlen), "")),
                st.getField("acc")).as("acc")))
          },
          st => st.getField("acc"))
      })
      element_at(sampled, 1)
    }
    graft.core.Ops.widen(docs)
      .select(col(idCol),
        flatten(transform(words, encodeWord)).as("__ps"))
      .select(col(idCol), size(col("__ps")).cast("long").as("n_pieces"),
        array_join(col("__ps"), "|").as("enc"))
  }

  /** Exact Viterbi decoding: the segmentation minimizing TOTAL e6 cost
    * (unknown characters priced at `unkCost`), ties broken toward the
    * segmentation that is lexicographically-greatest in piece lengths
    * scanned left to right (i.e. at equal total cost the EARLIER
    * boundary prefers the LONGER piece — matches the backtrace rule
    * below). Two folds per word: a forward DP building best-cost per
    * boundary (integer-exact long arithmetic), then a backtrace
    * reconstructing pieces. UnigramSpec pins optimality against
    * brute-force enumeration on short words.
    */
  def viterbiEncode(docs: DataFrame, idCol: String, textCol: String,
                    model: UniModel, maxWordLen: Int = 32,
                    unkCost: Long = 100L * 1000000L): DataFrame = {
    val vmaps = lenMaps(model.costs)
    val words = Dedup.normalizeWords(col(textCol))
    val encodeWord: Column => Column = w => {
      val cs = Bpe.charSymbols(w)
      def pieceAt(pos: Column, l: Int): Column =
        array_join(slice(cs, pos, lit(l)), "")
      // cost of the piece starting at pos with length l (1-based pos);
      // single chars fall back to unkCost when absent
      def stepCost(pos: Column, l: Int): Column =
        if (l == 1) coalesce(probeLen(vmaps, pieceAt(pos, 1), 1), lit(unkCost))
        else probeLen(vmaps, pieceAt(pos, l), l)
      // forward DP: best(i) = min cost of encoding chars [1, i]; acc is
      // the growing array [best(0)=0, best(1), …]
      val fwd = aggregate(
        sequence(lit(1), size(cs)),
        array(lit(0L)),
        (acc, i) => {
          val cand = (1 to model.maxPieceLen).map { l =>
            val prev = element_at(acc, i - lit(l) + 1) // best(i-l), 1-based
            when(i >= lit(l),
              when(stepCost(i - lit(l) + 1, l).isNotNull,
                prev + stepCost(i - lit(l) + 1, l)))
          }
          concat(acc, array(least(cand: _*)))
        })
      // backtrace from the end: at boundary i choose the LONGEST l with
      // best(i-l) + cost(piece) == best(i). The DP table is BOUND as a
      // lambda variable (transform over a 1-element array) so the
      // backtrace's ~9 references per step read a variable instead of
      // re-evaluating the forward aggregate each time.
      val backtraced = transform(array(fwd), f => {
        val init = struct(size(cs).as("p"),
          array().cast("array<string>").as("acc"))
        aggregate(
          sequence(lit(1), lit(maxWordLen)),
          init,
          (st, _) => {
            val i = st.getField("p")
            val bi = element_at(f, i + 1)
            val mlen = (1 to model.maxPieceLen).foldLeft(lit(0)) { (b, l) =>
              val start = i - lit(l) + 1
              val ok = i >= lit(l) && stepCost(start, l).isNotNull &&
                element_at(f, i - lit(l) + 1) + stepCost(start, l) === bi
              when(ok, lit(l)).otherwise(b) // ascending fold: longest wins
            }
            when(i <= 0, st).otherwise(struct(
              (i - mlen).as("p"),
              concat(array(array_join(slice(cs, i - mlen + 1, mlen), "")),
                st.getField("acc")).as("acc")))
          },
          st => st.getField("acc"))
      })
      element_at(backtraced, 1)
    }
    graft.core.Ops.widen(docs)
      .select(col(idCol),
        flatten(transform(words, encodeWord)).as("__ps"))
      .select(col(idCol), size(col("__ps")).cast("long").as("n_pieces"),
        array_join(col("__ps"), "|").as("enc"))
  }
}
