package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.CurateStream

/** The composed streaming curation gate: every input doc gets exactly one
  * verdict, the right stage decides it, and lineage pointers match the
  * batch funnel semantics (min-id representative).
  */
class CurateStreamSpec extends SparkSpec {
  import spark.implicits._

  // the CurateSpec fixture shape: 25+ words, alpha-dominant, salt-derived
  // bodies so different salts are genuinely unrelated
  private def goodText(salt: String): String =
    s"the table row scan key " +
      (1 to 24).map(i => s"$salt$i").mkString(" ") + " the a"

  test("gate: one verdict per doc; quality, exact-dup, near-dup and " +
      "admitted all routed to the right stage with min-id lineage") {
    val input = MemoryStream[(Long, String)](spark)
    val q = CurateStream.gate(input.toDF().toDF("id", "text"), "id", "text")
      .writeStream.format("memory").queryName("curate_gate")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        1L -> goodText("one"),
        5L -> "short junk!!!")            // fails the quality gate
      q.processAllAvailable()
      input.addData(
        2L -> goodText("one"),            // exact dup of 1 (same text)
        3L -> goodText("two"))
      q.processAllAvailable()
      input.addData(
        4L -> (goodText("two") + " appended"), // near-dup of 3
        7L -> goodText("four"))
      q.processAllAvailable()
      val got = spark.table("curate_gate")
        .as[CurateStream.GateVerdict].collect()
        .map(v => v.id -> ((v.admitted, v.reason, v.dup_of))).toMap
      assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L, 7L)) // ledger complete
      assert(got(1L) === ((true, "admitted", 1L)))
      assert(got(5L) === ((false, "quality", 5L)))
      assert(got(2L) === ((false, "exact_dup", 1L)))
      assert(got(3L) === ((true, "admitted", 3L)))
      assert(got(4L) === ((false, "near_dup", 3L)))
      assert(got(7L) === ((true, "admitted", 7L)))
    } finally q.stop()
  }

  test("gate with repetition: n-gram-repetitive docs reject with reason " +
      "'repetition', matching the batch repetitionRules stage") {
    val corpus = Seq(
      1L -> goodText("one"),
      3L -> (goodText("rep") + " " + goodText("rep")), // dup-gram saturated
      7L -> goodText("four"))
    val cfg = CurateStream.GateConfig(minQualityE4 = 1000,
      repetition = Some(graft.operators.TextStats.RepetitionConfig()))
    val input = MemoryStream[(Long, String)](spark)
    val q = CurateStream.gate(input.toDF().toDF("id", "text"), "id",
        "text", cfg)
      .writeStream.format("memory").queryName("curate_rep")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(corpus: _*)
      q.processAllAvailable()
      val got = spark.table("curate_rep")
        .as[CurateStream.GateVerdict].collect()
        .map(v => v.id -> ((v.admitted, v.reason))).toMap
      assert(got.keySet === Set(1L, 3L, 7L))
      assert(got(3L) === ((false, "repetition")))
      assert(got(1L) === ((true, "admitted")))
      assert(got(7L) === ((true, "admitted")))
      // batch parity: the batch funnel's repetition stage rejects the
      // same doc for the same reason
      val batch = graft.pipeline.Curate.run(corpus.toDF("doc_id", "text"),
        "doc_id", "text", Seq("nothing shared").toDF("btext"), "btext",
        graft.pipeline.CurateConfig(minQualityE4 = 1000, chunkTokens = 16,
          chunkOverlap = 4, packBudget = 32, emitLedger = true,
          repetitionRules =
            Some(graft.operators.TextStats.RepetitionConfig())))
      val batchRep = batch.ledger.get
        .filter(org.apache.spark.sql.functions.col("reason") === "repetition")
        .select("id").as[Long].collect().toSeq
      assert(batchRep == Seq(3L))
      batch.chunks.unpersist()
    } finally q.stop()
  }

  test("batch rejection ledger (Curate.run emitLedger) ≡ stream " +
      "GateVerdicts on the same corpus; funnel counts derive from it") {
    val corpus = Seq(
      1L -> goodText("one"),
      2L -> goodText("one"),                 // exact dup of 1
      3L -> goodText("two"),
      4L -> (goodText("two") + " appended"), // near-dup of 3
      5L -> "short junk!!!",                 // quality reject
      7L -> goodText("four"))
    // batch: the full funnel with an empty benchmark (decontamination
    // rejects nothing → the shared-stage reason vocabulary is exercised)
    val res = graft.pipeline.Curate.run(corpus.toDF("doc_id", "text"),
      "doc_id", "text",
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "text",
      cfg = graft.pipeline.CurateConfig(emitLedger = true))
    val batch = res.ledger.get.as[CurateStream.GateVerdict].collect()
      .map(v => v.id -> ((v.admitted, v.reason, v.dup_of))).toMap
    // stream: same corpus in arrival order (near-dup fed after its
    // canonical so first-arrival state matches batch min-id lineage)
    val input = MemoryStream[(Long, String)](spark)
    val q = CurateStream.gate(input.toDF().toDF("id", "text"), "id", "text")
      .writeStream.format("memory").queryName("curate_gate_ledger")
      .outputMode(OutputMode.Append()).start()
    val stream =
      try {
        input.addData(1L -> corpus.toMap.apply(1L),
          2L -> corpus.toMap.apply(2L), 3L -> corpus.toMap.apply(3L),
          5L -> corpus.toMap.apply(5L))
        q.processAllAvailable()
        input.addData(4L -> corpus.toMap.apply(4L),
          7L -> corpus.toMap.apply(7L))
        q.processAllAvailable()
        spark.table("curate_gate_ledger")
          .as[CurateStream.GateVerdict].collect()
          .map(v => v.id -> ((v.admitted, v.reason, v.dup_of))).toMap
      } finally q.stop()
    assert(batch.size == corpus.size, s"ledger incomplete: $batch")
    assert(batch == stream, s"batch $batch vs stream $stream")
    // funnel counts are derivable from the ledger
    val counts = res.stageCounts.toMap
    val byReason = batch.values.toSeq.groupBy(_._2)
      .view.mapValues(_.size.toLong).toMap
    assert(counts("exact_dedup") ==
      corpus.size - byReason.getOrElse("quality", 0L) -
        byReason.getOrElse("exact_dup", 0L))
    assert(counts("near_dup") ==
      counts("exact_dedup") - byReason.getOrElse("near_dup", 0L))
    assert(counts("decontaminated") == byReason("admitted"))
  }

  test("gate: same-batch exact dups resolve to the smallest id (batch " +
      "funnel parity)") {
    val input = MemoryStream[(Long, String)](spark)
    val q = CurateStream.gate(input.toDF().toDF("id", "text"), "id", "text")
      .writeStream.format("memory").queryName("curate_gate_batchdup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        12L -> goodText("seven"),
        10L -> goodText("seven"),
        11L -> goodText("seven"))
      q.processAllAvailable()
      val got = spark.table("curate_gate_batchdup")
        .as[CurateStream.GateVerdict].collect()
        .map(v => v.id -> ((v.admitted, v.reason, v.dup_of))).toMap
      assert(got(10L) === ((true, "admitted", 10L)))
      assert(got(11L) === ((false, "exact_dup", 10L)))
      assert(got(12L) === ((false, "exact_dup", 10L)))
    } finally q.stop()
  }

  test("gate with c4Clean + classifier: the stateless stages route their " +
      "rejects, downstream states see CLEANED text (batch-funnel order)") {
    // classifier trained on separable marker vocabularies (the
    // CurateSpec fixture shape); c4 text = three proper sentences
    def posText(i: Int) = Seq("a", "b", "c")
      .map(s => goodText(s"p$i$s") + " aurora borealis signal beacon.")
      .mkString("\n")
    def negText(i: Int) = Seq("a", "b", "c")
      .map(s => goodText(s"n$i$s") + " static noise junk clutter.")
      .mkString("\n")
    val exemplars = ((10 to 14).map(i => (i.toLong, posText(i), 1)) ++
      (20 to 24).map(i => (i.toLong, negText(i), 0)))
      .toDF("doc_id", "text", "y")
    val model = graft.operators.Classifier.train(
      exemplars, "doc_id", "text", "y", dim = 32, iters = 10,
      lrE6 = 2000000L)
    val input = MemoryStream[(Long, String)](spark)
    val q = CurateStream.gate(input.toDF().toDF("id", "text"), "id", "text",
        CurateStream.GateConfig(c4Clean = true, classifier = Some(model)))
      .writeStream.format("memory").queryName("curate_gate_c4cls")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        1L -> posText(1),                            // admitted
        2L -> negText(2),                            // classifier reject
        3L -> (posText(3) + "\nlorem ipsum dolor sit amet today."), // c4 page reject
        // c4-CLEANED exact dup of 1: same kept lines once the
        // no-terminal-punct banner is stripped — proves dedup runs on
        // cleaned text
        4L -> (posText(1) + "\nbanner line without punctuation"))
      q.processAllAvailable()
      val got = spark.table("curate_gate_c4cls")
        .as[CurateStream.GateVerdict].collect()
        .map(v => v.id -> ((v.admitted, v.reason, v.dup_of))).toMap
      assert(got.keySet === Set(1L, 2L, 3L, 4L))
      assert(got(1L) === ((true, "admitted", 1L)))
      assert(got(2L) === ((false, "classifier", 2L)))
      assert(got(3L) === ((false, "c4", 3L)))
      assert(got(4L) === ((false, "exact_dup", 1L)))
    } finally q.stop()
  }

  test("gate with EVERY stateless stage on: c4 + classifier + ppl compose " +
      "in batch-funnel order (the stream composition canary)") {
    import graft.operators.TextStats
    def posText(i: Int) = Seq("a", "b", "c")
      .map(s => goodText(s"p$i$s") + " aurora borealis signal beacon.")
      .mkString("\n")
    def negText(i: Int) = Seq("a", "b", "c")
      .map(s => goodText(s"n$i$s") + " static noise junk clutter.")
      .mkString("\n")
    val exemplars = ((10 to 14).map(i => (i.toLong, posText(i), 1)) ++
      (20 to 24).map(i => (i.toLong, negText(i), 0)))
      .toDF("doc_id", "text", "y")
    val model = graft.operators.Classifier.train(
      exemplars, "doc_id", "text", "y", dim = 32, iters = 10,
      lrE6 = 2000000L)
    // permissive KN cut trained on the positive exemplars: everything
    // that reaches the ppl stage passes (the canary audits ORDER, the
    // dedicated ppl test audits the cut itself)
    val grams = TextStats.bigramCounts(
      exemplars.select("doc_id", "text"), "text")
    val kn = TextStats.collectKnModel(grams, vocabSize = 1000L)
    val input = MemoryStream[(Long, String)](spark)
    val q = CurateStream.gate(input.toDF().toDF("id", "text"), "id", "text",
        CurateStream.GateConfig(c4Clean = true, classifier = Some(model),
          ppl = Some(CurateStream.PplGate(kn,
            Map("alpha" -> Long.MaxValue)))))
      .writeStream.format("memory").queryName("curate_gate_all")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        1L -> posText(1),                                 // admitted
        2L -> negText(2),                                 // classifier
        3L -> (posText(3) + "\nlorem ipsum dolor sit amet today."), // c4
        4L -> posText(1))                                 // exact dup of 1
      q.processAllAvailable()
      val got = spark.table("curate_gate_all")
        .as[CurateStream.GateVerdict].collect()
        .map(v => v.id -> ((v.admitted, v.reason))).toMap
      assert(got(1L) === ((true, "admitted")))
      assert(got(2L) === ((false, "classifier"))) // classifier BEFORE ppl
      assert(got(3L) === ((false, "c4")))
      assert(got(4L) === ((false, "exact_dup")))
    } finally q.stop()
  }

  test("gate with ppl: batch-learned cuts reject high-perplexity docs; " +
      "unjudged languages pass") {
    import graft.operators.TextStats
    // reference model: one alpha-language sentence repeated (every bigram
    // well-attested)
    val refText = "the table row scan key value store disk cache page"
    val ref = (1 to 5).map(i => (i.toLong, refText)).toDF("doc_id", "text")
    val grams = TextStats.bigramCounts(ref, "text")
    val model = TextStats.collectKnModel(grams, vocabSize = 1000L)
    // threshold: midpoint between the fluent and gibberish batch scores
    val fluent = refText
    val gibberish = "the table row scan key zq1a zq2b zq3c zq4d zq5e zq6f"
    val probe = Seq((1L, fluent), (2L, gibberish)).toDF("doc_id", "text")
    val scores = TextStats.knCrossEntropy(probe, "doc_id", "text", grams,
        vocabSize = 1000L, bigramTypes = model.types)
      .select("doc_id", "kn_e4").as[(Long, Long)].collect().toMap
    assert(scores(1L) < scores(2L))
    val cut = (scores(1L) + scores(2L)) / 2

    val input = MemoryStream[(Long, String)](spark)
    val q = CurateStream.gate(input.toDF().toDF("id", "text"), "id", "text",
        CurateStream.GateConfig(minQualityE4 = 0,
          ppl = Some(CurateStream.PplGate(model, Map("alpha" -> cut)))))
      .writeStream.format("memory").queryName("curate_gate_ppl")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        1L -> fluent,                                   // alpha, under cut
        2L -> gibberish,                                // alpha, over cut
        // beta-language doc: no trained cut for beta → passes unjudged
        3L -> "the join merge window batch qq1 qq2 qq3 qq4 qq5")
      q.processAllAvailable()
      val got = spark.table("curate_gate_ppl")
        .as[CurateStream.GateVerdict].collect()
        .map(v => v.id -> ((v.admitted, v.reason))).toMap
      assert(got(1L) === ((true, "admitted")))
      assert(got(2L) === ((false, "ppl")))
      assert(got(3L) === ((true, "admitted")))
    } finally q.stop()
  }

  test("gate with arpa: the file-shipped reference model rejects docs " +
      "over the bound with stream scores bit-identical to batch") {
    import graft.operators.TextStats
    val m = TextStats.parseArpa(
      "\\data\\\nngram 1=6\nngram 2=4\n\n\\1-grams:\n" +
        "-0.7 the -0.2\n-0.9 table -0.2\n-0.9 row -0.2\n-0.9 scan\n" +
        "-0.9 key\n-2.0 <unk>\n\n\\2-grams:\n" +
        "-0.3 the table\n-0.3 table row\n-0.3 row scan\n-0.3 scan key\n" +
        "\n\\end\\\n")
    val fluent = ("the table row scan key " * 13).trim + " the a"
    val alien = goodText("one") // pool-plausible, reference-disfluent
    // bound from the BATCH operator's scores (parity is the point)
    val (uni, bi) = TextStats.arpaTables(spark, m)
    val scores = TextStats.arpaCrossEntropy(
        Seq((1L, fluent), (2L, alien)).toDF("doc_id", "text"),
        "doc_id", "text", uni, bi, m.unkLp)
      .select("doc_id", "arpa_e4").as[(Long, Long)].collect().toMap
    assert(scores(1L) < scores(2L))
    val cut = (scores(1L) + scores(2L)) / 2

    val input = MemoryStream[(Long, String)](spark)
    val q = CurateStream.gate(input.toDF().toDF("id", "text"), "id", "text",
        CurateStream.GateConfig(minQualityE4 = 0,
          arpa = Some(CurateStream.ArpaGate(m, cut))))
      .writeStream.format("memory").queryName("curate_gate_arpa")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(1L -> fluent, 2L -> alien)
      q.processAllAvailable()
      val got = spark.table("curate_gate_arpa")
        .as[CurateStream.GateVerdict].collect()
        .map(v => v.id -> ((v.admitted, v.reason))).toMap
      assert(got(1L) === ((true, "admitted")))
      assert(got(2L) === ((false, "arpa")))
    } finally q.stop()
  }

  test("gate with an ORDER-3 arpa model: the stream gate scores through " +
      "the generalized fold, bit-identical to the batch order-n ladder") {
    import graft.operators.TextStats
    val m = TextStats.parseArpa(
      "\\data\\\nngram 1=6\nngram 2=4\nngram 3=2\n\n\\1-grams:\n" +
        "-0.7 the -0.2\n-0.9 table -0.2\n-0.9 row -0.2\n-0.9 scan -0.2\n" +
        "-0.9 key\n-2.0 <unk>\n\n\\2-grams:\n" +
        "-0.3 the table -0.1\n-0.3 table row -0.1\n-0.3 row scan -0.1\n" +
        "-0.3 scan key\n\n\\3-grams:\n" +
        "-0.15 the table row\n-0.15 table row scan\n\n\\end\\\n")
    assert(m.order == 3)
    val fluent = ("the table row scan key " * 13).trim + " the a"
    val alien = goodText("one")
    val docs = Seq((1L, fluent), (2L, alien)).toDF("doc_id", "text")
    val scores = TextStats.arpaCrossEntropyN(docs, "doc_id", "text",
        TextStats.arpaTablesN(spark, m), m.unkLp)
      .select("doc_id", "arpa_e4").as[(Long, Long)].collect().toMap
    assert(scores(1L) < scores(2L))
    // fold-vs-ladder bit parity at order 3 on the gate's own inputs
    val foldScores = docs.select(
        org.apache.spark.sql.functions.col("doc_id"),
        TextStats.arpaScoreExpr(
          org.apache.spark.sql.functions.col("text"), m).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(foldScores == scores, s"$foldScores vs $scores")
    val cut = (scores(1L) + scores(2L)) / 2
    val input = MemoryStream[(Long, String)](spark)
    val q = CurateStream.gate(input.toDF().toDF("id", "text"), "id", "text",
        CurateStream.GateConfig(minQualityE4 = 0,
          arpa = Some(CurateStream.ArpaGate(m, cut))))
      .writeStream.format("memory").queryName("curate_gate_arpa3")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(1L -> fluent, 2L -> alien)
      q.processAllAvailable()
      val got = spark.table("curate_gate_arpa3")
        .as[CurateStream.GateVerdict].collect()
        .map(v => v.id -> ((v.admitted, v.reason))).toMap
      assert(got(1L) === ((true, "admitted")))
      assert(got(2L) === ((false, "arpa")))
    } finally q.stop()
  }

  test("gate with ppl: a zero-bigram doc is judged by admitUnscored, not " +
      "its defaulted score of 0") {
    import graft.operators.TextStats
    val refText = "the table row scan key value store disk cache page"
    val ref = (1 to 5).map(i => (i.toLong, refText)).toDF("doc_id", "text")
    val model = TextStats.collectKnModel(
      TextStats.bigramCounts(ref, "text"), vocabSize = 1000L)
    // a single-word doc has zero bigrams → knScoreExpr coalesces to 0,
    // which is <= any cut; the gate must NOT read that as fluent
    def run(admitUnscored: Boolean, name: String): Map[Long, (Boolean, String)] = {
      val input = MemoryStream[(Long, String)](spark)
      val q = CurateStream.gate(input.toDF().toDF("id", "text"), "id", "text",
          CurateStream.GateConfig(minQualityE4 = 0,
            keepLangs = Set("alpha", "beta", "gamma", "und"),
            ppl = Some(CurateStream.PplGate(model, Map("und" -> 1L),
              admitUnscored = admitUnscored))))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(7L -> "table")
        q.processAllAvailable()
        spark.table(name).as[CurateStream.GateVerdict].collect()
          .map(v => v.id -> ((v.admitted, v.reason))).toMap
      } finally q.stop()
    }
    // lang of a 1-word doc may be anything; cut map judges "und" at 1
    // but the zero-bigram branch fires FIRST either way
    val strict = run(admitUnscored = false, "curate_gate_ppl_unscored0")
    assert(strict(7L) === ((false, "ppl")))
    val lax = run(admitUnscored = true, "curate_gate_ppl_unscored1")
    assert(lax(7L) === ((true, "admitted")))
  }

  test("gate with gopherRules + decontam: gopher folds into the quality " +
      "verdict, eval-gram overlap rejects BEFORE dedup (a twin of a " +
      "contaminated doc admits — the pinned ordering divergence)") {
    import org.apache.spark.sql.functions.col
    val passage = (1 to 10).map(i => s"ev$i").mkString(" ")
    val bench = Seq("bench prelude " + passage).toDF("btext")
    val cfg = CurateStream.GateConfig(minQualityE4 = 0,
      gopherRules = Some(graft.operators.TextStats.GopherConfig(
        minWords = 5, minStopHits = 1, minMeanLenE4 = 10000)),
      decontam = Some(CurateStream.DecontamGate
        .fromBenchmark(bench, "btext", 8)))
    val input = MemoryStream[(Long, String)](spark)
    val q = CurateStream.gate(input.toDF().toDF("id", "text"),
        "id", "text", cfg)
      .writeStream.format("memory").queryName("curate_gate_decon")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        1L -> goodText("one"),                      // admitted
        2L -> "zz yy xx",                           // gopher → quality
        3L -> (goodText("two") + " " + passage))    // contaminated
      q.processAllAvailable()
      input.addData(
        // near-twin of the CONTAMINATED doc 3: in the batch funnel doc 3
        // would be its dedup canonical; the stream never let 3 into the
        // dedup state, so 4 admits — the documented divergence
        4L -> (goodText("two") + " freshtail"))
      q.processAllAvailable()
      val got = spark.table("curate_gate_decon")
        .as[CurateStream.GateVerdict].collect()
        .map(v => v.id -> ((v.admitted, v.reason))).toMap
      assert(got(1L) === ((true, "admitted")))
      assert(got(2L) === ((false, "quality")))
      assert(got(3L) === ((false, "decontaminated")))
      assert(got(4L) === ((true, "admitted")))
    } finally q.stop()
  }
}
