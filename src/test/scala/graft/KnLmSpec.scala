package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, TextStats}

/** Kneser–Ney bigram LM + CCNet perplexity buckets. The KN vectors are
  * hand-derived from the Chen & Goodman interpolated form with D = 0.75
  * and the engine's smoothed continuation (N1l+1)/(T+V); the bucket
  * tests pin the tercile-threshold arithmetic and the group isolation.
  */
class KnLmSpec extends SparkSpec {
  import spark.implicits._

  private def le6(p: Double): Long =
    math.floor(-math.log(p) * 1e6 + 0.5).toLong

  private def meanE4(costs: Seq[Long]): Long =
    math.floor(costs.sum / (costs.size * 100.0) + 0.5).toLong

  test("self-train KN matches the hand-computed worked example") {
    // corpus: "a b a b" + "a c" → grams (a b):2 (b a):1 (a c):1, T=3
    // ctx(a)=3 n1r(a)=2; ctx(b)=1 n1r(b)=1; n1l: a=1 b=1 c=1; V=1000
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextStats.selfKnCrossEntropy(docs, "doc_id", "text",
        vocabSize = 1000L)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq

    val pc = (n1l: Long) => (n1l + 1.0) / (3 + 1000.0)
    val pAB = (math.max(2 - 0.75, 0.0) + 0.75 * 2 * pc(1)) / 3
    val pBA = (math.max(1 - 0.75, 0.0) + 0.75 * 1 * pc(1)) / 1
    val pAC = (math.max(1 - 0.75, 0.0) + 0.75 * 2 * pc(1)) / 3
    val d1 = meanE4(Seq(le6(pAB), le6(pBA), le6(pAB)))
    val d2 = meanE4(Seq(le6(pAC)))
    assert(got == Seq((1L, 3L, d1), (2L, 1L, d2)))
  }

  test("cross-model scoring exercises every smoothing path") {
    // model trained on "a b" only: grams (a b):1, T=1, ctx(a)=1 n1r(a)=1,
    // n1l(b)=1; V=1000
    val train = Seq((0L, "a b")).toDF("doc_id", "text")
    val grams = TextStats.bigramCounts(train, "text")
    // scored doc hits: seen gram (a b), unseen gram with seen w1 and
    // seen-continuation w2 (a a? no — "a x": unseen w2), unseen w1 ("x y")
    val docs = Seq((1L, "a b"), (2L, "a x"), (3L, "x b"), (4L, "z"))
      .toDF("doc_id", "text")
    val got = TextStats.knCrossEntropy(docs, "doc_id", "text", grams,
        vocabSize = 1000L, bigramTypes = 1L)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq

    val pcB = (1 + 1.0) / (1 + 1000.0)  // b continues 1 context
    val pcX = (0 + 1.0) / (1 + 1000.0)  // x never continues
    val pAB = (math.max(1 - 0.75, 0.0) + 0.75 * 1 * pcB) / 1 // seen gram
    val pAX = (0.0 + 0.75 * 1 * pcX) / 1                     // unseen gram, seen w1
    val pXB = pcB                                            // unseen w1 → continuation
    assert(got == Seq(
      (1L, 1L, meanE4(Seq(le6(pAB)))),
      (2L, 1L, meanE4(Seq(le6(pAX)))),
      (3L, 1L, meanE4(Seq(le6(pXB)))),
      (4L, 0L, 0L))) // <2 words: zero bigrams, kept with 0 score
  }

  test("KN ranks an attested collocation above an equal-count novel pairing") {
    // "san francisco" seen 3×; "francisco" only ever follows "san", while
    // "the" follows many contexts. Under KN, p(francisco | new-context)
    // stays LOW (one continuation context) while p(the | new-context) is
    // higher — the property add-one smoothing cannot express.
    val train = Seq(
      (0L, "san francisco san francisco san francisco"),
      (1L, "in the house on the hill by the sea")).toDF("doc_id", "text")
    val grams = TextStats.bigramCounts(train, "text")
    val t = grams.count()
    val docs = Seq((1L, "city francisco"), (2L, "city the"))
      .toDF("doc_id", "text")
    val got = TextStats.knCrossEntropy(docs, "doc_id", "text", grams,
        vocabSize = 1000L, bigramTypes = t)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    // both are unseen-w1 → pure continuation: "the" (3 contexts) must be
    // cheaper than "francisco" (1 context)
    assert(got(1)._3 < got(0)._3,
      s"p(the|city) should beat p(francisco|city): ${got.toSeq}")
  }

  test("knScoreExpr matches the batch join form bit-for-bit (serving " +
       "parity, every smoothing path + empty doc)") {
    val train = Seq((0L, "a b a b"), (1L, "a c b a")).toDF("doc_id", "text")
    val grams = TextStats.bigramCounts(train, "text")
    val model = TextStats.collectKnModel(grams, vocabSize = 1000L)
    val docs = Seq((1L, "a b"), (2L, "a x"), (3L, "x b"), (4L, "z"),
      (5L, ""), (6L, "a b c x b a")).toDF("doc_id", "text")
    val batch = TextStats.knCrossEntropy(docs, "doc_id", "text", grams,
        vocabSize = 1000L, bigramTypes = model.types)
      .orderBy("doc_id").select("doc_id", "kn_e4")
      .as[(Long, Long)].collect().toSeq
    val served = docs.select(col("doc_id"),
        TextStats.knScoreExpr(col("text"), model).as("kn_e4"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(served == batch)
  }

  test("collectKnModel refuses a vocabulary past maxEntries") {
    val train = Seq((0L, "a b c d e f")).toDF("doc_id", "text")
    val grams = TextStats.bigramCounts(train, "text") // 5 grams
    intercept[IllegalArgumentException] {
      TextStats.collectKnModel(grams, vocabSize = 1000L, maxEntries = 3)
    }
  }

  test("perplexityBuckets splits each group into exact terciles") {
    val df = (
      (1 to 6).map(i => ("en", i.toLong * 100, i.toLong * 10)) ++
      (1 to 3).map(i => ("fr", 1000L + i, i.toLong))
    ).toDF("lang", "doc_id", "score")
    val got = Curation.perplexityBuckets(df, "lang", "score")
      .select("lang", "score", "bucket")
      .as[(String, Long, String)].collect().toSet
    // en: n=6, pos=5/3→t1=20·(2−5/3)+30·(5/3−1)=26.67; pos=10/3→t2=43.33
    assert(got.filter(_._1 == "en") == Set(
      ("en", 10L, "head"), ("en", 20L, "head"),
      ("en", 30L, "middle"), ("en", 40L, "middle"),
      ("en", 50L, "tail"), ("en", 60L, "tail")))
    // fr: n=3, pos=2/3→t1 between 1 and 2; pos=4/3→t2 between 1 and 2
    assert(got.filter(_._1 == "fr") == Set(
      ("fr", 1L, "head"), ("fr", 2L, "middle"), ("fr", 3L, "tail")))
  }

  test("perplexityBuckets unscoredWhen: defaulted-zero rows get their own " +
      "bucket and do NOT drag the tercile cuts") {
    // 6 genuine scores 10..60 plus 6 defaulted zeros. Without the
    // predicate the zeros are all labeled head AND pull t1/t2 to 20/40
    // (pushing 30 into tail-territory); with it the genuine rows split
    // exactly as in the clean-tercile test above.
    val df = ((1 to 6).map(i => ("en", i.toLong, i.toLong * 10, 3L)) ++
      (7 to 12).map(i => ("en", i.toLong, 0L, 0L)))
      .toDF("lang", "doc_id", "score", "n_bigrams")
    val got = Curation.perplexityBuckets(df, "lang", "score",
        unscoredWhen = Some($"n_bigrams" === 0L))
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert((1 to 6).map(i => got(i.toLong)) ==
      Seq("head", "head", "middle", "middle", "tail", "tail"))
    assert((7 to 12).forall(i => got(i.toLong) == "unscored"))
    // a group that is ALL unscored still labels (left join, no cut row)
    val solo = Seq(("fr", 100L, 0L, 0L)).toDF("lang", "doc_id", "score", "n_bigrams")
    val g2 = Curation.perplexityBuckets(solo, "lang", "score",
        unscoredWhen = Some($"n_bigrams" === 0L))
      .select("bucket").as[String].collect().toSeq
    assert(g2 == Seq("unscored"))
  }

  test("perplexityBuckets: ties share a bucket; a 1-row group is head") {
    val df = (Seq.fill(9)(("en", 5L)) ++ Seq(("solo", 7L)))
      .zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) }
      .toDF("lang", "doc_id", "score")
    val got = Curation.perplexityBuckets(df, "lang", "score")
      .select("lang", "bucket").as[(String, String)].collect()
    // all-equal scores: one tie group must land in ONE bucket (the
    // threshold compare cannot split equal values), deterministically
    assert(got.filter(_._1 == "en").map(_._2).distinct.length == 1)
    // a 1-row group: pos = 0 exactly, threshold = the value → head
    assert(got.filter(_._1 == "solo").map(_._2).toSeq == Seq("head"))
  }

  test("perplexityBuckets thresholds are group-local (no cross-lang leak)") {
    // en scores 10-60, fr scores 1000-6000: if thresholds leaked across
    // groups every en row would be head and every fr row tail
    val df = ((1 to 6).map(i => ("en", i.toLong, i.toLong * 10)) ++
      (1 to 6).map(i => ("fr", 100L + i, i.toLong * 1000)))
      .toDF("lang", "doc_id", "score")
    val counts = Curation.perplexityBuckets(df, "lang", "score")
      .groupBy("lang", "bucket").count()
      .as[(String, String, Long)].collect().toSet
    for (l <- Seq("en", "fr"); b <- Seq("head", "middle", "tail"))
      assert(counts.contains((l, b, 2L)), s"missing ($l, $b, 2): $counts")
  }

  private val arpaFixture =
    """\data\
      |ngram 1=4
      |ngram 2=2
      |
      |\1-grams:
      |-1.0 the -0.30103
      |-1.5 table -0.2
      |-2.0 row
      |-3.0 <unk>
      |
      |\2-grams:
      |-0.5 the table
      |-0.8 table row
      |
      |\end\
      |""".stripMargin
      .replace("\n", "\n") // (explicit: fixture travels with \n lines)

  test("parseArpa: fields, optional backoff, <unk>, order caps") {
    import graft.operators.TextStats
    val m = TextStats.parseArpa(arpaFixture)
    assert(m.order == 2 && m.malformedSkipped == 0L)
    assert(m.unigrams.toSet == Set(("the", -1.0, -0.30103),
      ("table", -1.5, -0.2), ("row", -2.0, 0.0), ("<unk>", -3.0, 0.0)))
    assert(m.bigrams.toSet == Set(("the table", -0.5), ("table row", -0.8)))
    assert(m.unkLp == -3.0)
    // order-3 sections load under the default maxOrder=5 cap…
    val m3 = TextStats.parseArpa(arpaFixture + "\n\\3-grams:\n-0.1 a b c\n")
    assert(m3.order == 3 && m3.grams(2) == Seq(("a b c", -0.1, 0.0)))
    // …but the bigram-collapse contract is still expressible
    intercept[IllegalArgumentException] {
      TextStats.parseArpa(arpaFixture.replace("ngram 2=2", "ngram 3=5"),
        maxOrder = 2)
    }
    intercept[IllegalArgumentException] {
      TextStats.parseArpa(arpaFixture + "\n\\3-grams:\n-0.1 a b c\n",
        maxOrder = 2)
    }
    // beyond maxOrder fails loudly in BOTH modes (structural, not noise)
    intercept[IllegalArgumentException] {
      TextStats.parseArpa(arpaFixture + "\n\\6-grams:\n-0.1 a b c d e f\n")
    }
    intercept[IllegalArgumentException] {
      TextStats.parseArpa(arpaFixture + "\n\\6-grams:\n-0.1 a b c d e f\n",
        lenient = true)
    }
    // a model with no <unk> line gets the -99 floor
    val noUnk = TextStats.parseArpa(
      arpaFixture.replace("-3.0 <unk>\n", "").replace("ngram 1=4", "ngram 1=3"))
    assert(noUnk.unkLp == -99.0)
  }

  test("parseArpa: duplicate grams fail loud; lenient keeps the LAST " +
       "occurrence and counts skips (bad lines included)") {
    import graft.operators.TextStats
    val dup = arpaFixture.replace("-0.5 the table",
      "-0.5 the table\n-0.45 the table")
    intercept[IllegalArgumentException] { TextStats.parseArpa(dup) }
    val m = TextStats.parseArpa(dup, lenient = true)
    assert(m.bigrams.toMap.apply("the table") == -0.45, m.bigrams.toString)
    assert(m.malformedSkipped == 1L)
    // malformed field count + non-numeric prob: strict throws, lenient
    // counts and skips both without losing the good lines
    val quirked = arpaFixture
      .replace("-0.8 table row", "-0.8 table row\njunkline\nxx the zz")
    intercept[IllegalArgumentException] { TextStats.parseArpa(quirked) }
    val mq = TextStats.parseArpa(quirked, lenient = true)
    assert(mq.malformedSkipped == 2L)
    assert(mq.bigrams.toSet ==
      Set(("the table", -0.5), ("table row", -0.8)))
  }

  test("arpaCrossEntropy: listed bigram, backoff path, unknown word — " +
      "hand-computed Katz chain") {
    import graft.operators.TextStats
    val m = TextStats.parseArpa(arpaFixture)
    val (uni, bi) = TextStats.arpaTables(spark, m)
    // doc 1: "the table row" → bigrams [the table][table row], both
    // listed: lp −0.5, −0.8
    // doc 2: "the row" → unlisted: bo(the) + lp(row) = −0.30103 − 2.0
    // doc 3: "row zebra" → unlisted, zebra unknown:
    //        bo(row)=0 + lp(<unk>) = −3.0
    // doc 4: "word" → no bigrams → (0, 0)
    val docs = Seq((1L, "the table row"), (2L, "the row"),
      (3L, "row zebra"), (4L, "word")).toDF("doc_id", "text")
    val got = TextStats.arpaCrossEntropy(docs, "doc_id", "text", uni, bi,
        m.unkLp)
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "arpa_e4")
      .as[(Long, Long, Long)].collect().toSeq
    def le6(lp: Double): Long =
      math.floor(-lp * TextStats.Ln10 * 1e6 + 0.5).toLong
    def e4(ls: Seq[Long]): Long =
      math.floor(ls.sum / (ls.size * 100.0) + 0.5).toLong
    assert(got == Seq(
      (1L, 2L, e4(Seq(le6(-0.5), le6(-0.8)))),
      (2L, 1L, e4(Seq(le6(-0.30103 - 2.0)))),
      (3L, 1L, e4(Seq(le6(-3.0)))),
      (4L, 0L, 0L)), got.toString)

    // arpaScoreExpr (the stream/gate fold form) is BIT-identical to the
    // join form on every doc — incl. the zero-bigram coalesce
    val exprGot = docs
      .select(col("doc_id"),
        TextStats.arpaScoreExpr(col("text"), m).as("arpa_e4"))
      .orderBy("doc_id").select("doc_id", "arpa_e4")
      .as[(Long, Long)].collect().toSeq
    assert(exprGot == got.map(t => (t._1, t._3)), exprGot.toString)
    intercept[IllegalArgumentException] {
      TextStats.arpaScoreExpr(col("text"), m, maxEntries = 3)
    }
  }

  private val arpa3Fixture =
    """\data\
      |ngram 1=4
      |ngram 2=3
      |ngram 3=2
      |
      |\1-grams:
      |-1.0 the -0.30103
      |-1.5 table -0.2
      |-2.0 row -0.15
      |-3.0 <unk>
      |
      |\2-grams:
      |-0.5 the table -0.1
      |-0.8 table row -0.05
      |-0.9 row row
      |
      |\3-grams:
      |-0.3 the table row
      |-0.6 table row row
      |
      |\end\
      |""".stripMargin

  test("arpaCrossEntropyN: order-3 Katz — listed trigram, one-level and " +
      "two-level backoff, unlisted-context bo=0, unknown word; " +
      "arpaScoreExpr bit-parity; n=2 tables reproduce arpaCrossEntropy") {
    import graft.operators.TextStats
    val m = TextStats.parseArpa(arpa3Fixture)
    assert(m.order == 3)
    val tabs = TextStats.arpaTablesN(spark, m)
    // hand-computed Katz chains (log10):
    // doc 1 "the table row": trigram listed → −0.3
    // doc 2 "the table table": trigram unlisted → bo("the table")=−0.1;
    //   bigram "table table" unlisted → bo("table")=−0.2 + lp(table)=−1.5
    //   ⇒ −1.8
    // doc 3 "row the table": trigram unlisted, context "row the"
    //   UNLISTED → bo=0; bigram "the table" listed → −0.5 ⇒ −0.5
    // doc 4 "table row zebra": all suffixes unlisted, zebra unknown →
    //   unk −3.0 + bo("table row")=−0.05 + bo("row")=−0.15 ⇒ −3.2
    // doc 5 "the row": < 3 words ⇒ (0, 0)
    // doc 6 "the table row row": trigrams [the table row]=−0.3,
    //   [table row row]=−0.6
    val docs = Seq((1L, "the table row"), (2L, "the table table"),
      (3L, "row the table"), (4L, "table row zebra"), (5L, "the row"),
      (6L, "the table row row")).toDF("doc_id", "text")
    val got = TextStats.arpaCrossEntropyN(docs, "doc_id", "text", tabs,
        m.unkLp)
      .orderBy("doc_id").select("doc_id", "n_grams", "arpa_e4")
      .as[(Long, Long, Long)].collect().toSeq
    def le6(lp: Double): Long =
      math.floor(-lp * TextStats.Ln10 * 1e6 + 0.5).toLong
    def e4(ls: Seq[Long]): Long =
      math.floor(ls.sum / (ls.size * 100.0) + 0.5).toLong
    assert(got == Seq(
      (1L, 1L, e4(Seq(le6(-0.3)))),
      (2L, 1L, e4(Seq(le6(-0.1 - 0.2 - 1.5)))),
      (3L, 1L, e4(Seq(le6(-0.5)))),
      (4L, 1L, e4(Seq(le6(-3.0 - 0.05 - 0.15)))),
      (5L, 0L, 0L),
      (6L, 2L, e4(Seq(le6(-0.3), le6(-0.6))))), got.toString)

    // the fold (stream-gate) form is BIT-identical per doc
    val exprGot = docs
      .select(col("doc_id"),
        TextStats.arpaScoreExpr(col("text"), m).as("arpa_e4"))
      .orderBy("doc_id").select("doc_id", "arpa_e4")
      .as[(Long, Long)].collect().toSeq
    assert(exprGot == got.map(t => (t._1, t._3)), exprGot.toString)

    // and the generalized ladder at n=2 is bit-identical to the
    // dedicated bigram path on the order-2 fixture
    val m2 = TextStats.parseArpa(arpaFixture)
    val (uni, bi) = TextStats.arpaTables(spark, m2)
    val docs2 = Seq((1L, "the table row"), (2L, "the row"),
      (3L, "row zebra"), (4L, "word")).toDF("doc_id", "text")
    val oldForm = TextStats.arpaCrossEntropy(docs2, "doc_id", "text",
        uni, bi, m2.unkLp)
      .orderBy("doc_id").select("doc_id", "n_bigrams", "arpa_e4")
      .as[(Long, Long, Long)].collect().toSeq
    val newForm = TextStats.arpaCrossEntropyN(docs2, "doc_id", "text",
        TextStats.arpaTablesN(spark, m2), m2.unkLp)
      .orderBy("doc_id").select("doc_id", "n_grams", "arpa_e4")
      .as[(Long, Long, Long)].collect().toSeq
    assert(newForm == oldForm, s"$newForm vs $oldForm")
  }
}
