package graft

import org.apache.spark.sql.functions._
import graft.operators.Unigram

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def model(costs: (String, Long)*): Unigram.UniModel =
    Unigram.UniModel(costs.toMap, maxPieceLen = 8)

  private def enc(m: Unigram.UniModel, text: String): String =
    Unigram.unigramEncode(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", m)
      .select("enc").as[String].head()

  private def vit(m: Unigram.UniModel, text: String): String =
    Unigram.viterbiEncode(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", m)
      .select("enc").as[String].head()

  test("greedy: likelihood beats length — a cheap short piece wins over " +
      "an expensive long one; unknown chars fall back") {
    // "ab" ratio 10/2 = 5; "abc" ratio 18/3 = 6 → greedy takes "ab" even
    // though longest-match (WordPiece) would take "abc"
    val m = model("ab" -> 10L, "abc" -> 18L, "c" -> 4L,
      "a" -> 9L, "b" -> 9L)
    assert(enc(m, "abc") == "ab|c")
    // flip the economics: "abc" ratio 9/3 = 3 beats "ab"'s 5
    val m2 = model("ab" -> 10L, "abc" -> 9L, "c" -> 4L)
    assert(enc(m2, "abc") == "abc")
    // equal ratio → longer piece ("aa" 8/2 == "a" 4/1)
    val m3 = model("a" -> 4L, "aa" -> 8L)
    assert(enc(m3, "aaa") == "aa|a")
    // unknown char: emitted as itself
    assert(enc(m, "axb") == "a|x|b")
  }

  test("viterbi: globally optimal where greedy is not; matches brute " +
      "force on every segmentation of short words") {
    // greedy takes "ab" (ratio 1) then pays "c"+"d" (20) = 22;
    // viterbi finds "a"+"bcd" = 12
    val m = model("ab" -> 2L, "a" -> 6L, "bcd" -> 6L,
      "c" -> 10L, "d" -> 10L, "b" -> 10L)
    assert(enc(m, "abcd") == "ab|c|d")
    assert(vit(m, "abcd") == "a|bcd")

    // brute force: enumerate all segmentations, min total cost (unk =
    // the operator's default), compare to the viterbi pick
    val unk = 100L * 1000000L
    def cost(piece: String): Long =
      m.costs.getOrElse(piece,
        if (piece.length == 1) unk else Long.MaxValue / 4)
    def best(w: String): Long =
      if (w.isEmpty) 0L
      else (1 to math.min(8, w.length)).map { l =>
        val c = cost(w.take(l))
        if (c >= Long.MaxValue / 4) Long.MaxValue / 2
        else c + best(w.drop(l))
      }.min
    for (w <- Seq("abcd", "abab", "bcdbcd", "axbcd", "dcba", "aabcdd")) {
      val got = vit(m, w)
      assert(got.split('|').mkString("") == w, s"$w → $got not a segmentation")
      val gotCost = got.split('|').map(cost).sum
      assert(gotCost == best(w), s"$w: viterbi $gotCost vs optimal ${best(w)}")
    }
  }

  test("trainUnigram: chars always kept, usage-ranked multi pieces, " +
      "finite smoothed costs; encode round-trips the corpus") {
    val docs = Seq.tabulate(20)(i =>
      (i.toLong, "sparky sparks sparkle the the spar")).toDF("doc_id", "text")
    val wf = graft.operators.Bpe.wordFreqs(docs, "text")
    val vocab = Unigram.trainUnigram(wf, vocabSize = 12)
    val pieces = vocab.select("piece").as[String].collect().toSet
    val alphabet = "sparkyletbh".toSet.map((c: Char) => c.toString) ++ Set()
    // every char of the corpus vocabulary present
    val corpusChars = "sparkysparksparklethespar".toSet.map((c: Char) => c.toString)
    assert(corpusChars.subsetOf(pieces), s"$pieces missing chars")
    // costs all finite/positive
    val costs = vocab.select("cost").as[Long].collect()
    assert(costs.forall(c => c > 0L && c < 100L * 1000000L))
    // encoding under the trained model reconstructs every word exactly
    val m = Unigram.collectUniModel(vocab)
    val encs = Unigram.unigramEncode(docs, "doc_id", "text", m)
      .select("enc").as[String].collect()
    assert(encs.forall(e =>
      e.split('|').mkString("") == "sparkysparkssparklethethespar"))
  }

  // the operator's e6 softmin, replicated for hand-checks
  private def comb(a: Long, x: Long): Long = {
    val m = math.min(a, x); val d = (math.max(a, x) - m).toDouble
    m - math.floor(math.log(1.0 + math.exp(-d / 1e6)) * 1e6 + 0.5).toLong
  }
  private def post(pathCost: Long, z: Long): Long =
    math.floor(math.exp(-(pathCost - z).toDouble / 1e6) * 1e6 + 0.5).toLong

  test("pieceUsageExpected: hand-computed two-path posterior on 'ab'; " +
      "greedy starves the non-best path, EM does not") {
    // pieces a, b, ab all at cost ln2·1e6: paths [a][b] (2·ln2) and
    // [ab] (ln2) → posteriors 1/3 and 2/3
    val ln2 = 693147L
    val m = model("a" -> ln2, "b" -> ln2, "ab" -> ln2)
    val wf = Seq(("ab", 5L)).toDF("w", "freq")
    val z = comb(2 * ln2, ln2)
    val got = Unigram.pieceUsageExpected(wf, m)
      .orderBy("piece").as[(String, Long)].collect().toSeq
    val pLow = post(2 * ln2, z)  // ≈ 333333 (1/3)
    val pHigh = post(ln2, z)     // ≈ 666667 (2/3)
    assert(got == Seq(("a", 5L * pLow), ("ab", 5L * pHigh),
      ("b", 5L * pLow)), s"$got (pLow=$pLow pHigh=$pHigh)")
    // the greedy E-step gives the losing path ZERO mass
    val greedy = Unigram.pieceUsage(wf, m)
      .orderBy("piece").as[(String, Long)].collect().toSeq
    assert(greedy == Seq(("ab", 5L)))
  }

  test("pieceUsageExpected: posterior mass conservation — expected " +
      "piece-lengths sum to word length within per-edge rounding") {
    val m = model("a" -> 400000L, "b" -> 500000L, "c" -> 600000L,
      "ab" -> 700000L, "bc" -> 650000L, "abc" -> 900000L, "cab" -> 800000L)
    for (w <- Seq("abc", "abcabc", "cababc", "aabbcc")) {
      val rows = Unigram.pieceUsageExpected(
          Seq((w, 1L)).toDF("w", "freq"), m)
        .as[(String, Long)].collect()
      val massE6 = rows.map { case (p, u) => p.length * u }.sum
      val edges = rows.length
      assert(math.abs(massE6 - w.length * 1000000L) <= 4L * edges,
        s"$w: $massE6 vs ${w.length * 1000000L} over $edges pieces")
    }
  }

  test("trainUnigramEM descends the marginal likelihood and beats " +
      "greedy-count training on an ambiguous vocabulary") {
    // corpus where 'ab'/'bc'/'cb' compete inside overlapping words:
    // greedy counting locks onto one path per word and starves the
    // competing pieces; EM splits posterior mass and re-estimates
    // toward the marginal-likelihood optimum (its actual objective)
    val docs = Seq.tabulate(30)(i => (i.toLong,
      "abc abd cbc abcd bcbc abab bcd acb")).toDF("doc_id", "text")
    val wf = graft.operators.Bpe.wordFreqs(docs, "text")
      .persist()
    def mdl(vocab: org.apache.spark.sql.DataFrame) =
      Unigram.collectUniModel(vocab, maxPieceLen = 4)
    // vocabSize 60 ≥ the seed set: no pruning — the clean EM setting
    // where each round must not increase Σ freq·α_N (add-one smoothing
    // and per-combine e6 rounding allow a whisker of slack)
    val em1 = Unigram.corpusMarginalCostE6(wf,
      mdl(Unigram.trainUnigramEM(wf, vocabSize = 60, rounds = 1,
        maxPieceLen = 4)))
    val em2 = Unigram.corpusMarginalCostE6(wf,
      mdl(Unigram.trainUnigramEM(wf, vocabSize = 60, rounds = 2,
        maxPieceLen = 4)))
    val em3 = Unigram.corpusMarginalCostE6(wf,
      mdl(Unigram.trainUnigramEM(wf, vocabSize = 60, rounds = 3,
        maxPieceLen = 4)))
    val slack = 5000L // e6: 0.005 nats across the corpus
    assert(em2 <= em1 + slack && em3 <= em2 + slack,
      s"EM trajectory not descending: $em1 → $em2 → $em3")
    // and the EM fixed point scores the corpus at least as well as the
    // greedy-count fixed point under the SAME objective
    val gr3 = Unigram.corpusMarginalCostE6(wf,
      mdl(Unigram.trainUnigram(wf, vocabSize = 60, rounds = 3,
        maxPieceLen = 4)))
    assert(em3 <= gr3, s"EM $em3 should not lose to greedy $gr3")
    wf.unpersist()
  }

  test("sampleEncode: deterministic per seed, seed-sensitive, and " +
      "Viterbi-degenerate at high temperature-inverse alpha") {
    import graft.operators.Unigram.UniModel
    // ambiguous word: 'ab' as one piece costs 3e6, as 'a'+'b' costs 4e6
    val model = UniModel(Map("a" -> 2000000L, "b" -> 2000000L,
      "ab" -> 3000000L), maxPieceLen = 2)
    val docs = Seq((1L, Seq.fill(50)("ab").mkString(" ")))
      .toDF("doc_id", "text")
    def enc(seed: Long, alphaE4: Long): String =
      Unigram.sampleEncode(docs, "doc_id", "text", model, seed, alphaE4)
        .select("enc").as[String].head()
    assert(enc(7L, 10000L) == enc(7L, 10000L), "same seed must replay")
    assert(enc(7L, 10000L) != enc(8L, 10000L),
      "different seeds should re-sample an ambiguous corpus")
    // alpha -> inf: every suboptimal edge weight rounds to zero and the
    // sample IS the Viterbi segmentation
    val vit = Unigram.viterbiEncode(docs, "doc_id", "text", model)
      .select("enc").as[String].head()
    assert(enc(7L, 10000000L) == vit, "high alpha must degenerate to Viterbi")
    // unknown chars fall back to themselves at unkCost
    val unkDocs = Seq((1L, "axb")).toDF("doc_id", "text")
    val e = Unigram.sampleEncode(unkDocs, "doc_id", "text", model, 7L)
      .select("enc").as[String].head()
    assert(e == "a|x|b", e)
  }

  test("sampleEncode: empirical one-piece rate over independent word " +
      "positions matches the lattice posterior") {
    import graft.operators.Unigram.UniModel
    val model = UniModel(Map("a" -> 2000000L, "b" -> 2000000L,
      "ab" -> 3000000L), maxPieceLen = 2)
    val n = 300
    val docs = Seq((1L, Seq.fill(n)("ab").mkString(" ")))
      .toDF("doc_id", "text")
    // P(one piece) = e^-3 / (e^-3 + e^-4) = 1/(1+e^-1) ~ 0.731; each of
    // the n word positions draws independently (widx enters the hash)
    val nPieces = Unigram.sampleEncode(docs, "doc_id", "text", model, 5L)
      .select("n_pieces").as[Long].head()
    val onePiece = 2 * n - nPieces // x singles + y=n-x pairs, pieces=x+2y
    val rate = onePiece.toDouble / n
    assert(rate > 0.65 && rate < 0.81,
      s"one-piece rate $rate vs posterior ~0.731")
  }

  test("pruneBy=loss keeps the irreplaceable piece usage ranking drops, " +
      "and scores the corpus at least as well") {
    // 'ab' is high-usage but its chars are cheap (removal nearly free);
    // 'qw' is lower-usage but q/w appear ONLY inside it (expensive
    // chars → removal costs the corpus dearly). With room for ONE
    // multi-char piece, usage ranking keeps 'ab', loss ranking keeps
    // the piece the corpus actually needs.
    val docs = (Seq.fill(40)("a b ab") ++ Seq.fill(8)("qw"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val wf = graft.operators.Bpe.wordFreqs(docs, "text").persist()
    val nChars = 4 // a, b, q, w
    def kept(pruneBy: String): Set[String] =
      Unigram.trainUnigramEM(wf, vocabSize = nChars + 1, rounds = 1,
          maxPieceLen = 2, pruneBy = pruneBy)
        .select("piece").as[String].collect().toSet
    val byUsage = kept("usage")
    val byLoss = kept("loss")
    assert(byUsage.contains("ab") && !byUsage.contains("qw"), byUsage)
    assert(byLoss.contains("qw") && !byLoss.contains("ab"), byLoss)
    // and the loss-kept vocabulary prices the corpus no worse
    def cost(pruneBy: String): Long =
      Unigram.corpusMarginalCostE6(wf, Unigram.collectUniModel(
        Unigram.trainUnigramEM(wf, vocabSize = nChars + 1, rounds = 1,
          maxPieceLen = 2, pruneBy = pruneBy), maxPieceLen = 2))
    val (cu, cl) = (cost("usage"), cost("loss"))
    assert(cl <= cu, s"loss-pruned $cl vs usage-pruned $cu")
    wf.unpersist()
  }
}
