package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Curate, CurateConfig}

/** End-to-end curation pipeline: the composed funnel on fixture docs whose
  * ground truth is constructed stage by stage, plus the composition-level
  * plan audit (cartesians / single-partition exchanges) that individual
  * operator specs cannot see.
  */
class CurateSpec extends SparkSpec {
  import spark.implicits._

  // 25+ words with stopwords → passes the quality gate; alpha-profile
  // markers dominate → lang = alpha; the body tokens are salt-derived so
  // DIFFERENT salts give genuinely unrelated documents (shared shingles
  // only at the fixed 5-word head/2-word tail — far below the 0.8 gate)
  private def goodText(salt: String): String =
    s"the table row scan key " +
      (1 to 24).map(i => s"$salt$i").mkString(" ") + " the a"

  test("Curate.run: funnel counts match stage-by-stage ground truth") {
    val docs = Seq(
      1L -> goodText("one"),
      2L -> goodText("one"),        // exact dup of 1 (same text) → dropped
      3L -> goodText("two"),
      4L -> (goodText("two") + " appended"), // near-dup of 3 → dropped
      5L -> "short low quality!!!", // fails the quality gate
      6L -> (goodText("three") +    // contaminated: carries the bench 8-gram
        " benchmark gram alpha beta gamma delta epsilon zeta"),
      7L -> goodText("four")
    ).toDF("doc_id", "text")
    val benchmark = Seq(
      "benchmark gram alpha beta gamma delta epsilon zeta").toDF("btext")

    val res = Curate.run(docs, "doc_id", "text", benchmark, "btext",
      CurateConfig(minQualityE4 = 5000, chunkTokens = 16, chunkOverlap = 4,
        packBudget = 32))
    val funnel = res.stageCounts.toMap
    // 7 docs: quality drops 5; exact dedup folds {1,2}→1 → 5 remain
    assert(funnel("exact_dedup") == 5L, res.stageCounts.toString)
    // near-dup folds {3,4}→3 → 4 remain
    assert(funnel("near_dup") == 4L, res.stageCounts.toString)
    // decontamination drops 6 → 3 remain
    assert(funnel("decontaminated") == 3L, res.stageCounts.toString)
    val chunks = res.chunks
    val ids = chunks.select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 7L))
    // chunk coverage: ~30 words at stride 12 → 3 chunks per doc
    assert(funnel("chunks") == chunks.count())
    assert(chunks.count() >= 9)
    // shard/pack columns present and sane: pack offsets start at 0 within
    // each shard, chunk token counts never exceed the chunk budget
    assert(chunks.filter(col("n_tokens") > 16).count() == 0)
    assert(chunks.groupBy("shard").agg(min("pack").as("p"))
      .filter(col("p") =!= 0L).count() == 0)
    res.chunks.unpersist()
  }

  test("Curate.run with packBestFit: every chunk packed exactly once and " +
      "NO pack exceeds the budget (the invariant greedy trades away)") {
    // greedy's contiguous cut lets a straddling chunk OVERFLOW its pack
    // (pad-free but over-budget); best-fit's contract is the reverse —
    // fills never exceed budget when items fit it, padding is the cost.
    // The padding-vs-overflow economics are measured, not asserted:
    // the --pack sweep rows in SCALE.md.
    val docs = (1L to 12L).map(i => i -> goodText(s"doc$i"))
      .toDF("doc_id", "text")
    val bench = Seq("nothing matches this").toDF("btext")
    val res = Curate.run(docs, "doc_id", "text", bench, "btext",
      graft.pipeline.CurateConfig(minQualityE4 = 5000, chunkTokens = 16,
        chunkOverlap = 4, packBudget = 32, packBestFit = true))
    val nChunks = res.chunks.count()
    assert(nChunks == res.stageCounts.toMap.apply("chunks"))
    // exactly one (shard, pack) assignment per chunk
    assert(res.chunks.select("doc_id", "chunk_id").distinct().count()
      == nChunks)
    val per = res.chunks.groupBy("shard", "pack")
      .agg(sum("n_tokens").as("fill"))
    val over = per.filter(col("fill") > 32L).count()
    assert(over == 0L, s"$over best-fit packs exceed the budget")
    // packs are 0-based and contiguous enough to start at 0 per shard
    assert(res.chunks.groupBy("shard").agg(min("pack").as("p"))
      .filter(col("p") =!= 0L).count() == 0)
    res.chunks.unpersist()
  }

  test("Curate.run with dedupWindowsW: repeated cross-doc passages drop " +
      "before exact dedup sees the docs") {
    // docs 1 and 2 differ ONLY by a shared 12-token passage appended to
    // both (doc 2's copy is the duplicate); once the window stage strips
    // it, doc 2's remainder equals doc 1's remainder's... no — bodies
    // differ, so both survive exact dedup; the assertion is the passage
    // is GONE from the survivor corpus (no chunk contains it twice)
    val passage = "shared passage tokens alpha beta gamma delta epsilon " +
      "zeta eta theta iota"
    val docs = Seq(
      1L -> (goodText("one") + " " + passage),
      2L -> (goodText("two") + " " + passage),
      3L -> goodText("three")
    ).toDF("doc_id", "text")
    val benchmark = Seq("unrelated bench text").toDF("btext")
    val res = Curate.run(docs, "doc_id", "text", benchmark, "btext",
      CurateConfig(minQualityE4 = 5000, dedupWindowsW = Some(8),
        chunkTokens = 16, chunkOverlap = 4, packBudget = 32))
    val funnel = res.stageCounts.toMap
    assert(funnel("window_dedup") == 3L, res.stageCounts.toString)
    assert(funnel("exact_dedup") == 3L, res.stageCounts.toString)
    // the passage survives exactly once across the chunked corpus: its
    // distinctive token appears in doc 1's chunks (canonical) only
    val withTheta = res.chunks.filter(col("chunk_text").contains("theta"))
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(withTheta == Set(1L), withTheta.toString)
    res.chunks.unpersist()
  }

  test("Curate.run with dsirTarget: selection keeps the target-like half " +
      "of the pool, reproducibly") {
    // pool: 4 docs near the target domain (body words drawn from the
    // target exemplar) + 4 far docs; target = two exemplar docs. With
    // keep-frac 5000 (half), DSIR must pick the 4 target-like ones.
    def targetish(salt: Int): String =
      "the table row scan key " + (1 to 24)
        .map(i => s"tok${(i * 7 + salt) % 30}").mkString(" ") + " the a"
    val docs = (
      (1 to 4).map(i => i.toLong -> targetish(i)) ++
      (5 to 8).map(i => i.toLong -> goodText(s"far$i"))
    ).toDF("doc_id", "text")
    val target = Seq(10L -> targetish(11), 11L -> targetish(12))
      .toDF("doc_id", "text")
    val benchmark = Seq("unrelated bench text").toDF("btext")
    // temperature 0: pure top-k by importance weight — the margin between
    // target-like and far docs is structural (every far bigram is unseen
    // in the target model), so the selection is exact; the Gumbel-noise
    // path is covered by the operator spec and probe q97
    def funnel(seed: Long, tempE4: Long) = Curate.run(docs, "doc_id",
      "text", benchmark, "btext",
      CurateConfig(minQualityE4 = 5000, dsirSeed = seed,
        dsirTemperatureE4 = tempE4,
        chunkTokens = 16, chunkOverlap = 4, packBudget = 32),
      dsirTarget = Some(target))
    val res = funnel(0L, 0L)
    assert(res.stageCounts.toMap.apply("dsir_select") == 4L,
      res.stageCounts.toString)
    val picked = res.chunks.select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(picked == Set(1L, 2L, 3L, 4L), picked.toString)
    // same seed → same selection under Gumbel noise (the determinism
    // contract; the chosen set may differ from the temp-0 one)
    val a = funnel(7L, 10000L).chunks.select("doc_id").distinct()
      .as[Long].collect().toSet
    val b = funnel(7L, 10000L).chunks.select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(a == b)
    res.chunks.unpersist()
  }

  test("Curate.run classifier gate drops the docs the trained model " +
      "rejects and keeps the rest") {
    // pool: docs 1-3 speak the positive vocabulary, 4-6 the negative one
    // (both pass the quality/lang gates — goodText's stopword frame);
    // the model is trained on held-out exemplars of the same two
    // vocabularies, so the gate is the deciding stage.
    // distinct per-doc body vocabulary (goodText salt) so the pool docs
    // are NOT near-duplicates of each other; the class signal is the
    // repeated marker phrase
    def posText(i: Int) = goodText(s"aur$i") +
      " aurora borealis signal" * 3
    def negText(i: Int) = goodText(s"sta$i") +
      " static noise junk" * 3
    val docs = ((1 to 3).map(i => i.toLong -> posText(i)) ++
      (4 to 6).map(i => i.toLong -> negText(i))).toDF("doc_id", "text")
    val exemplars = ((10 to 14).map(i => i.toLong -> (posText(i), 1)) ++
      (20 to 24).map(i => i.toLong -> (negText(i), 0)))
      .map { case (id, (t, y)) => (id, t, y) }.toDF("doc_id", "text", "y")
    val model = graft.operators.Classifier.train(
      exemplars, "doc_id", "text", "y", dim = 32, iters = 10,
      lrE6 = 2000000L)
    val benchmark = Seq("unrelated bench text").toDF("btext")
    val res = Curate.run(docs, "doc_id", "text", benchmark, "btext",
      CurateConfig(minQualityE4 = 5000),
      classifierModel = Some(model))
    assert(res.stageCounts.toMap.apply("classifier_gate") == 3L,
      res.stageCounts.toString)
    val picked = res.chunks.select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(picked == Set(1L, 2L, 3L), picked.toString)
    res.chunks.unpersist()
  }

  test("Curate.run with EVERY optional stage on composes and plans in " +
      "bounded time (the analysis-blowup regression)") {
    // Each optional gate references its input several times; before the
    // localCheckpoint barriers, composing all five blew the driver heap
    // INSIDE the optimizer (no job ever ran). This spec is the
    // composition canary: it must finish, and every stage must appear in
    // the funnel in order.
    // three sentence-lines per doc so the C4 stage (terminal punct, ≥5
    // words, ≥3 sentences) passes everything through unchanged
    def c4Good(salt: String): String =
      Seq("a", "b", "c").map(s => goodText(salt + s) + ".").mkString("\n")
    val docs = (1 to 12).map(i => i.toLong -> c4Good(s"s$i"))
      .toDF("doc_id", "text")
    val target = Seq(100L -> c4Good("s1")).toDF("doc_id", "text")
    val benchmark = Seq("unrelated bench text").toDF("btext")
    // a permissive trained model: bias-only positive weights keep all
    // docs — the stage must RUN (and appear in the funnel) without
    // shrinking the pool this canary audits
    val labeled = docs.withColumn("y", lit(1) - (col("doc_id") % 2).cast("int"))
    val model = graft.operators.Classifier.train(
      labeled, "doc_id", "text", "y", dim = 8, iters = 1, lrE6 = 100000L)
    val res = Curate.run(docs, "doc_id", "text", benchmark, "btext",
      CurateConfig(c4Clean = true,
        minQualityE4 = 5000,
        gopherRules = Some(graft.operators.TextStats.GopherConfig(
          minWords = 5, minStopHits = 1, minMeanLenE4 = 10000)),
        maxSelfXentE4 = Some(500000L),
        // permissive bound: the reference-model gate runs (and appears
        // in the funnel) without shrinking the canary pool
        maxArpaE4 = Some(100000000L),
        // all three buckets kept: the stage runs (and appears in the
        // funnel) without shrinking the pool this canary audits
        pplBucketsKeep = Some(Set("head", "middle", "tail")),
        dedupLinesWithinDocs = true,
        dedupWindowsW = Some(8),
        // distinct salted docs: cosine < 1 everywhere, the stage runs
        // (and appears in the funnel) without shrinking the pool
        semDedupThresholdE4 = Some(9999L),
        dsirKeepFracE4 = 10000L, // keep all: the stage runs, drops none
        minClassifierPE6 = 0L,   // keep all: ditto
        chunkTokens = 16, chunkOverlap = 4, packBudget = 32),
      dsirTarget = Some(target),
      classifierModel = Some(model),
      arpaModel = Some(graft.operators.TextStats.parseArpa(
        "\\data\\\nngram 1=2\nngram 2=1\n\n\\1-grams:\n-1.0 the -0.3\n" +
          "-3.0 <unk>\n\n\\2-grams:\n-0.5 the a\n\n\\end\\\n")))
    assert(res.stageCounts.map(_._1) == Seq("c4_clean", "classifier_gate",
      "lm_gate", "arpa_gate", "ppl_buckets", "dsir_select", "window_dedup",
      "exact_dedup", "near_dup", "band_bucket_max", "sem_dedup",
      "decontaminated", "chunks"),
      res.stageCounts.toString)
    assert(res.stageCounts.toMap.apply("exact_dedup") == 12L,
      res.stageCounts.toString)
    res.chunks.unpersist()
  }

  test("Curate.run with maxArpaE4: the external reference model drops the " +
      "doc IT considers disfluent, independent of the pool") {
    import graft.operators.TextStats
    // reference model: bigrams over the goodText head words are cheap;
    // everything else pays <unk> mass. Doc 2's body is pool-common (the
    // self-train gate would love it) but the REFERENCE model has never
    // seen its tokens → high arpa_e4.
    val m = TextStats.parseArpa(
      "\\data\\\nngram 1=6\nngram 2=4\n\n\\1-grams:\n" +
        "-0.7 the -0.2\n-0.9 table -0.2\n-0.9 row -0.2\n-0.9 scan\n" +
        "-0.9 key\n-2.0 <unk>\n\n\\2-grams:\n" +
        "-0.3 the table\n-0.3 table row\n-0.3 row scan\n-0.3 scan key\n" +
        "\n\\end\\\n")
    val fluent = "the table row scan key " +
      Seq.fill(12)("the table row scan key").flatMap(_.split(" "))
        .mkString(" ") + " the a"
    val docs = Seq(1L -> fluent, 2L -> goodText("one"),
      3L -> (fluent + " extra the")).toDF("doc_id", "text")
    val benchmark = Seq("unrelated bench text").toDF("btext")
    // bound between the fluent docs' scores (~0.3–2.0 log10 ≈ low e4)
    // and goodText's unk-dominated score
    val res = Curate.run(docs, "doc_id", "text", benchmark, "btext",
      CurateConfig(minQualityE4 = 0, maxArpaE4 = Some(30000L),
        chunkTokens = 16, chunkOverlap = 4, packBudget = 32),
      arpaModel = Some(m))
    val funnel = res.stageCounts.toMap
    assert(funnel("arpa_gate") == 2L, res.stageCounts.toString)
    val survivors = res.chunks.select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(survivors == Set(1L, 3L), survivors.toString)
    res.chunks.unpersist()
  }

  test("Curate.run with semDedupThresholdE4: a word-permuted twin survives " +
      "lexical near-dup but falls to the semantic stage") {
    val base = goodText("one")
    // same BAG of words, reversed order: 3-shingle Jaccard ≈ 0 (lexical
    // near-dup blind) but the hash embedding is IDENTICAL (cosine = 1)
    val permuted = base.split(" ").reverse.mkString(" ")
    val docs = Seq(1L -> base, 2L -> permuted, 3L -> goodText("two"))
      .toDF("doc_id", "text")
    val benchmark = Seq("unrelated bench text").toDF("btext")
    val res = Curate.run(docs, "doc_id", "text", benchmark, "btext",
      CurateConfig(minQualityE4 = 5000,
        semDedupThresholdE4 = Some(9500L),
        semDedupCentroidEvery = 1, // every doc a centroid: full recall
        chunkTokens = 16, chunkOverlap = 4, packBudget = 32))
    val funnel = res.stageCounts.toMap
    assert(funnel("near_dup") == 3L, res.stageCounts.toString)
    assert(funnel("sem_dedup") == 2L, res.stageCounts.toString)
    // min-id canonical survives: doc 2 (the permutation) is the victim
    val survivors = res.chunks.select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(survivors == Set(1L, 3L), survivors.toString)
    res.chunks.unpersist()
  }

  test("semDedupVictims: empty centroid sample falls back LAZILY to the " +
      "min-id single centroid (one cell = exact all-pairs)") {
    // centroidEvery far above the pool size: no id hashes into the
    // sample, so the plan-level fallback (equi anti join on a constant
    // key — no eager isEmpty action) must supply the min-id centroid
    val base = goodText("one")
    val docs = Seq(1L -> base, 2L -> (base + " tail"),
      3L -> goodText("two")).toDF("doc_id", "text")
    val victims = graft.operators.Curation.semDedupVictims(docs,
        "doc_id", "text", dim = 16, thresholdE4 = 9000L,
        centroidEvery = 1000000, nassign = 1)
      .as[(Long, Long)].collect().toSeq
    assert(victims == Seq((2L, 1L)), victims.toString)
  }

  test("Curate.run with dedupLinesWithinDocs: repeated-line docs collapse " +
      "to exact dups and fold in the dedup stage") {
    // docs 1 and 2 differ ONLY by a repeated line — line dedup makes them
    // byte-identical, so the exact-dedup stage folds them; with the knob
    // off they both survive
    val body = goodText("five")
    val docs = Seq(
      1L -> body,
      2L -> (body + "\n" + body),  // duplicate line of 1
      3L -> goodText("six")
    ).toDF("doc_id", "text")
    val benchmark = Seq("no contamination here").toDF("btext")
    val off = Curate.run(docs, "doc_id", "text", benchmark, "btext",
      CurateConfig(minQualityE4 = 0))
    val on = Curate.run(docs, "doc_id", "text", benchmark, "btext",
      CurateConfig(minQualityE4 = 0, dedupLinesWithinDocs = true))
    assert(off.stageCounts.toMap.apply("exact_dedup") == 3L)
    assert(on.stageCounts.toMap.apply("exact_dedup") == 2L)
    off.chunks.unpersist(); on.chunks.unpersist()
  }

  test("Curate.run with exactSubstrMinLen: a long cross-doc repeated " +
      "passage vanishes from EVERY occurrence with token-exact " +
      "boundaries; distinct content survives the stage untouched") {
    // docs 1 and 2 share an 8-token passage inside otherwise-distinct
    // bodies — below the window screen's radar at w=50, exactly what the
    // suffix stage exists to catch. Lee et al. semantics: BOTH copies go.
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      1L -> (goodText("one") + " " + shared),
      2L -> (shared + " " + goodText("two")),
      3L -> goodText("three")
    ).toDF("doc_id", "text")
    val benchmark = Seq("no contamination here").toDF("btext")
    val res = Curate.run(docs, "doc_id", "text", benchmark, "btext",
      CurateConfig(minQualityE4 = 0, exactSubstrMinLen = Some(8),
        exactSubstrCap = 16))
    assert(res.stageCounts.toMap.apply("exact_substr") == 3L)
    // the shared passage is gone from the surviving chunk text of BOTH
    // docs; doc 3's tokens all survive
    val texts = res.chunks.groupBy("doc_id")
      .agg(concat_ws(" ", collect_list(col("chunk_text"))).as("t"))
      .as[(Long, String)].collect().toMap
    Seq(1L, 2L).foreach { id =>
      assert(!texts(id).contains("alpha beta gamma"), texts(id)) }
    assert(texts(3L).contains("three1"), texts(3L))
    res.chunks.unpersist()
  }

  test("Curate.run with exactSubstrShards: the sharded stage yields the " +
      "same funnel and the same cleaned chunks as the single-stream form") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      1L -> (goodText("one") + " " + shared),
      2L -> (shared + " " + goodText("two")),
      3L -> goodText("three")
    ).toDF("doc_id", "text")
    val benchmark = Seq("no contamination here").toDF("btext")
    def run(shards: Int) = {
      val res = Curate.run(docs, "doc_id", "text", benchmark, "btext",
        CurateConfig(minQualityE4 = 0, exactSubstrMinLen = Some(8),
          exactSubstrCap = 16, exactSubstrShards = shards))
      val chunks = res.chunks
        .select("doc_id", "chunk_id", "chunk_text", "n_tokens", "shard",
          "pack")
        .as[(Long, Long, String, Long, Int, Long)].collect().toSet
      res.chunks.unpersist()
      (res.stageCounts, chunks)
    }
    val (fSingle, cSingle) = run(0)
    val (fSharded, cSharded) = run(3)
    assert(fSharded == fSingle, s"$fSharded vs $fSingle")
    assert(cSharded == cSingle)
  }

  test("Curate.run with gopherRules: the rule gate drops short docs the " +
      "composite score alone admits") {
    import graft.operators.TextStats
    val docs = Seq(
      1L -> goodText("nine"),                       // 31 words, passes both
      2L -> "the a table row scan key word word"    // 8 words: quality-ok,
    ).toDF("doc_id", "text")                        // gopher minWords fails
    val benchmark = Seq("nothing here").toDF("btext")
    val without = Curate.run(docs, "doc_id", "text", benchmark, "btext",
      CurateConfig(minQualityE4 = 0))
    val withRules = Curate.run(docs, "doc_id", "text", benchmark, "btext",
      CurateConfig(minQualityE4 = 0,
        gopherRules = Some(TextStats.GopherConfig(minWords = 20L))))
    assert(without.stageCounts.toMap.apply("exact_dedup") == 2L)
    assert(withRules.stageCounts.toMap.apply("exact_dedup") == 1L)
    without.chunks.unpersist(); withRules.chunks.unpersist()
  }

  test("Curate.run with maxSelfXentE4: the LM gate drops the gibberish " +
      "outlier the other gates admit") {
    // 9 docs share a common phrase vocabulary (low self-perplexity); one
    // doc is unique-token gibberish — every bigram unseen elsewhere, so
    // its cross-entropy is the corpus outlier
    val common = (1 to 9).map(i =>
      i.toLong -> ("the table row scan key " +
        (1 to 24).map(j => s"tok$j").mkString(" ") + s" the a tail$i"))
    val gibberish = Seq(10L ->
      ("the a " + (1 to 27).map(j => s"zq${j}x$j q$j").mkString(" ")))
    val docs = (common ++ gibberish).toDF("doc_id", "text")
    val benchmark = Seq("nothing here").toDF("btext")
    val open = Curate.run(docs, "doc_id", "text", benchmark, "btext",
      CurateConfig(minQualityE4 = 0))
    assert(open.stageCounts.toMap.apply("exact_dedup") == 10L)
    // bound: halfway between the common docs' scores and the outlier's
    import graft.operators.TextStats
    val scores = TextStats.lmCrossEntropy(docs, "doc_id", "text",
        TextStats.bigramCounts(docs, "text"), 1000L)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val bound = (common.map(c => scores(c._1)).max + scores(10L)) / 2
    assert(common.forall(c => scores(c._1) < bound) && scores(10L) > bound,
      scores.toString)
    val gated = Curate.run(docs, "doc_id", "text", benchmark, "btext",
      CurateConfig(minQualityE4 = 0, maxSelfXentE4 = Some(bound)))
    val funnel = gated.stageCounts.toMap
    assert(funnel("lm_gate") == 9L, gated.stageCounts.toString)
    assert(!gated.chunks.select("doc_id").as[Long].collect().contains(10L))
    open.chunks.unpersist(); gated.chunks.unpersist()
  }

  test("Curate.run with pplBucketsKeep: per-language tail bucket drops; " +
      "stage equals the operator-level composition") {
    import graft.operators.{Curation, Dedup, TextStats}
    // two predicted languages (alpha/beta marker vocabularies), six docs
    // each with increasing shares of unique tokens → increasing KN
    // self-perplexity within each language
    def doc(markers: String, salt: String, odd: Int): String =
      s"the $markers " +
        (1 to 24).map(i => if (i <= odd) s"$salt$i" else s"shared$i")
          .mkString(" ")
    val docs = ((1 to 6).map(i =>
        i.toLong -> doc("table row scan key", s"a$i", i * 4)) ++
      (1 to 6).map(i =>
        (10L + i) -> doc("join merge window batch", s"b$i", i * 4)))
      .toDF("doc_id", "text")
    val benchmark = Seq("nothing here").toDF("btext")
    val res = Curate.run(docs, "doc_id", "text", benchmark, "btext",
      CurateConfig(minQualityE4 = 0,
        pplBucketsKeep = Some(Set("head", "middle"))))
    val funnel = res.stageCounts.toMap
    assert(res.stageCounts.map(_._1).contains("ppl_buckets"))

    // expected = the operator-level composition over the same pool
    val scored = TextStats.selfKnCrossEntropy(docs, "doc_id", "text", 1000L)
    var lp = docs.withColumn("__w", Dedup.normalizeWords(col("text")))
    for ((name, markers) <- TextStats.LangProfiles)
      lp = lp.withColumn(s"s_$name",
        TextStats.profileScore(col("__w"), markers).cast("long"))
    val langs = lp.withColumn("__lang", TextStats.langPredict)
      .select(col("doc_id"), col("__lang"))
    val expected = Curation.perplexityBuckets(
        scored.join(langs, Seq("doc_id")), "__lang", "kn_e4")
      .filter(col("bucket").isin("head", "middle"))
      .select("doc_id").as[Long].collect().toSet
    assert(funnel("ppl_buckets") == expected.size.toLong,
      s"funnel $funnel vs expected $expected")
    // both languages must have lost their own tail (per-group split, not
    // one corpus-wide threshold)
    assert(expected.exists(_ < 10L) && expected.exists(_ > 10L))
    assert((1 to 6).exists(i => !expected.contains(i.toLong)))
    assert((1 to 6).exists(i => !expected.contains(10L + i)))
    val kept = res.chunks.select("doc_id").as[Long].collect().toSet
    assert(kept.subsetOf(expected), s"$kept not in $expected")
    res.chunks.unpersist()
  }

  test("Curate.run composition: no cartesian product, no single-partition " +
      "exchange anywhere in the composed job") {
    val docs = (1L to 40L).map(i => (i, goodText(s"doc$i"))).toDF("doc_id", "text")
    val benchmark = Seq("benchmark gram alpha beta gamma delta epsilon zeta")
      .toDF("btext")
    val res = Curate.run(docs, "doc_id", "text", benchmark, "btext")
    val p = res.chunks.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("Exchange SinglePartition"), p.take(3000))
    // the packing window must be shard-partitioned, not global
    val offenders = p.linesIterator.filter(l =>
      l.contains("Window ") && l.contains("ORDER BY") &&
        !l.contains("PARTITION BY")).toList
    assert(offenders.isEmpty, offenders.mkString("\n"))
    res.chunks.unpersist()
  }

  test("Curate.run repetition gate: n-gram-repetitive docs drop with " +
      "ledger reason 'repetition', clean docs survive") {
    // doc 3 is goodText repeated back-to-back: its dup n-gram char
    // fractions saturate while quality/lang still pass
    val docs = Seq(
      1L -> goodText("one"),
      2L -> goodText("two"),
      3L -> (goodText("rep") + " " + goodText("rep"))
    ).toDF("doc_id", "text")
    val benchmark = Seq("no contamination here").toDF("btext")
    val res = Curate.run(docs, "doc_id", "text", benchmark, "btext",
      CurateConfig(minQualityE4 = 1000, chunkTokens = 16,
        chunkOverlap = 4, packBudget = 32, emitLedger = true,
        repetitionRules =
          Some(graft.operators.TextStats.RepetitionConfig())))
    assert(res.stageCounts.toMap.apply("repetition") == 2L)
    val led = res.ledger.get
      .filter(col("reason") === "repetition")
      .select("id").as[Long].collect().toSeq
    assert(led == Seq(3L))
    res.chunks.unpersist()
  }

  test("Curate.run stage checkpoints: a killed funnel resumes from " +
      "committed stages to IDENTICAL counts, ledger, and chunks — " +
      "provably without recomputing them") {
    val docs = Seq(
      1L -> goodText("one"),
      2L -> goodText("one"),
      3L -> goodText("two"),
      4L -> (goodText("two") + " appended"),
      5L -> "short low quality!!!",
      6L -> (goodText("three") +
        " benchmark gram alpha beta gamma delta epsilon zeta"),
      7L -> goodText("four")
    ).toDF("doc_id", "text")
    val benchmark = Seq(
      "benchmark gram alpha beta gamma delta epsilon zeta").toDF("btext")
    val cfg = CurateConfig(minQualityE4 = 5000, chunkTokens = 16,
      chunkOverlap = 4, packBudget = 32, maxSelfXentE4 = Some(100000L),
      emitLedger = true)
    def summarize(r: graft.pipeline.CurateResult) = {
      val out = (r.stageCounts,
        r.ledger.get.select("id", "admitted", "reason", "dup_of")
          .as[(Long, Boolean, String, Long)].collect().toSet,
        r.chunks.select("doc_id", "chunk_id", "chunk_text", "n_tokens",
            "shard", "pack")
          .collect().map(_.toString).toSet)
      r.chunks.unpersist()
      out
    }
    val ref = summarize(
      Curate.run(docs, "doc_id", "text", benchmark, "btext", cfg))
    val wh = java.nio.file.Files
      .createTempDirectory("graft_curate_ck").toString
    val ckCfg = cfg.copy(stageCheckpointDir = Some(wh))
    val first = summarize(
      Curate.run(docs, "doc_id", "text", benchmark, "btext", ckCfg))
    assert(first == ref, "checkpointed run diverged from in-memory run")
    // simulate a kill after exact_dedup committed: drop the LATER stages'
    // commit markers (exactly what a crash leaves — data dirs may exist,
    // markers do not)
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (db <- Seq("stage_near_dup", "ledger_near_dup",
        "stage_decontaminated", "ledger_decontaminated", "stage_chunks"))
      fs.delete(new org.apache.hadoop.fs.Path(wh, s"$db.commit"), false)
    // resume with POISONED input (zero docs): identical outputs prove the
    // committed prefix was READ from the store, not recomputed — any
    // re-run of quality/lm/exact_dedup on the empty frame would zero the
    // funnel
    val resumed = summarize(Curate.run(docs.limit(0), "doc_id", "text",
      benchmark, "btext", ckCfg.copy(resume = true, runToken = "1")))
    assert(resumed == ref, "resumed run diverged from the reference")
    // config fingerprint guard: a resume under a DIFFERENT stage-relevant
    // config fails loudly instead of silently reading stale stage frames
    val drifted = intercept[IllegalArgumentException] {
      Curate.run(docs, "doc_id", "text", benchmark, "btext",
        ckCfg.copy(resume = true, runToken = "2", minQualityE4 = 1000))
    }
    assert(drifted.getMessage.contains("DIFFERENT config"))
    // resume/runToken are run mechanics, not semantics — they never
    // perturb the fingerprint (the resume above already proved token "1")
    // ... and a store with no fingerprint at all refuses to resume
    val bare = java.nio.file.Files
      .createTempDirectory("graft_curate_nofp").toString
    val noFp = intercept[IllegalArgumentException] {
      Curate.run(docs, "doc_id", "text", benchmark, "btext",
        ckCfg.copy(stageCheckpointDir = Some(bare), resume = true))
    }
    assert(noFp.getMessage.contains("no config fingerprint"))
  }

  test("exportStageMetrics builds a committed funnel time series; a " +
      "retried export replaces its run") {
    val docs = Seq(1L -> goodText("one"), 2L -> goodText("one"),
      3L -> goodText("two"), 5L -> "short junk!!!").toDF("doc_id", "text")
    val bench = Seq.empty[(Long, String)].toDF("doc_id", "btext")
    val r = Curate.run(docs, "doc_id", "text", bench, "btext",
      CurateConfig(chunkTokens = 16, packBudget = 32))
    r.chunks.unpersist()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_funnel_ts").toString
    Curate.exportStageMetrics(spark, r, dir, "day1")
    Curate.exportStageMetrics(spark, r, dir, "day2")
    Curate.exportStageMetrics(spark, r, dir, "day2") // retry replaces
    val got = Curate.readStageMetrics(spark, dir)
    assert(got.select("run_id").distinct().count() == 2)
    val day1 = got.filter(col("run_id") === "day1")
      .orderBy("ord").select("stage", "rows")
      .as[(String, Long)].collect().toSeq
    assert(day1 == r.stageCounts, s"$day1 vs ${r.stageCounts}")
    assert(got.filter(col("run_id") === "day2").count() ==
      r.stageCounts.size)
    // empty store reads as an empty series, not an error
    val bare = java.nio.file.Files
      .createTempDirectory("graft_funnel_bare").toString
    assert(Curate.readStageMetrics(spark, bare).count() == 0)
  }
}
