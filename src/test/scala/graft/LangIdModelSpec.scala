package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions._
import graft.operators.TextStats

/** External language-ID model artifact: parse discipline, join-form vs
  * collected-per-row-form parity, stream-gate usability, argmax
  * tie-break.
  */
class LangIdModelSpec extends SparkSpec {
  import spark.implicits._

  private val modelText =
    """comment preamble tolerated
      |\langid\
      |order 3
      |\profile alpha\
      |tab 40
      |ble 25
      |e_r 10
      |\profile beta\
      |joi 50
      |oin 30
      |\profile gamma\
      |que 45
      |ery 20
      |\end\
      |trailing noise tolerated
      |""".stripMargin

  test("parseLangId: sections parse, '_' decodes to space, strict " +
      "failures are loud") {
    val m = TextStats.parseLangId(modelText)
    assert(m.order == 3 && m.langs == Seq("alpha", "beta", "gamma"))
    assert(m.profiles.head._2 == Seq(("tab", 40L), ("ble", 25L),
      ("e r", 10L)))
    intercept[IllegalArgumentException] { // duplicate gram
      TextStats.parseLangId(
        "\\langid\\\norder 3\n\\profile a\\\nabc 1\nabc 2\n\\end\\")
    }
    intercept[IllegalArgumentException] { // non-numeric weight
      TextStats.parseLangId(
        "\\langid\\\norder 3\n\\profile a\\\nabc xx\n\\end\\")
    }
    intercept[IllegalArgumentException] { // gram before any profile
      TextStats.parseLangId("\\langid\\\norder 3\nabc 1\n\\end\\")
    }
    intercept[IllegalArgumentException] { // wrong gram length vs order
      TextStats.parseLangId(
        "\\langid\\\norder 3\n\\profile a\\\nabcd 1\n\\end\\")
    }
    intercept[IllegalArgumentException] { // profile before order
      TextStats.parseLangId("\\langid\\\n\\profile a\\\nabc 1\n\\end\\")
    }
  }

  test("join serving form equals the collected per-row form (occurrence" +
      "-weighted), predictions argmax with alphabetical tie-break") {
    val m = TextStats.parseLangId(modelText)
    val docs = Seq(
      (1L, "the TABLE table is re-readable"), // alpha: tab x2, ble x2, e_r
      (2L, "join the join point"),            // beta: joi x2, oin x2
      (3L, "query query!"),                   // gamma
      (4L, "tie: no grams here at all??"),    // all-zero → alpha (tie)
      (5L, ""),                               // empty text
      (6L, "xy")                              // shorter than order
    ).toDF("doc_id", "text")
    val joined = TextStats.langIdScores(docs, "doc_id", "text", m)
      .select("doc_id", "s_alpha", "s_beta", "s_gamma", "lang_ext")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // per-row collected form: same scores, no join
    val perRowCols = TextStats.langIdScoreCols(col("text"), m)
    val perRow = docs
      .select(col("doc_id") +: perRowCols.map { case (n, c) =>
        c.as(n) }: _*)
      .withColumn("lang_ext", TextStats.langIdArgmax(m.langs))
      .select("doc_id", "s_alpha", "s_beta", "s_gamma", "lang_ext")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(joined == perRow, s"$joined vs $perRow")
    assert(joined(1L)._4 == "alpha" && joined(2L)._4 == "beta" &&
      joined(3L)._4 == "gamma")
    assert(joined(4L) == ((0L, 0L, 0L, "alpha")), "tie → alphabetical")
    assert(joined(5L) == ((0L, 0L, 0L, "alpha")))
    assert(joined(6L) == ((0L, 0L, 0L, "alpha")))
    // occurrence weighting, not presence: doc 1 has 'tab' twice
    assert(joined(1L)._1 >= 2 * 40L, s"${joined(1L)}")
  }

  test("the external model swaps into all three gate shapes: funnel, " +
      "increment, and stream verdicts agree under the model; unmodeled " +
      "keepLangs are loud") {
    import graft.pipeline.{Curate, CurateConfig, Increment,
      IncrementConfig}
    import graft.streaming.CurateStream
    val m = TextStats.parseLangId(modelText)
    // doc 1 scores alpha, doc 2 beta, doc 3 hits no grams (tie → alpha);
    // keepLangs = {beta} keeps exactly doc 2
    val docs = Seq(1L -> "the table is a stable table",
      2L -> "join the join point here",
      3L -> "nothing from the model in this one")
    val want = Map(1L -> ((false, "quality", 1L)),
      2L -> ((true, "admitted", 2L)),
      3L -> ((false, "quality", 3L)))
    def vm(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "admitted", "reason", "dup_of")
        .as[(Long, Boolean, String, Long)].collect()
        .map(v => v._1 -> ((v._2, v._3, v._4))).toMap
    // increment
    val dir = java.nio.file.Files
      .createTempDirectory("graft_langid_gate").toString
    val iCfg = IncrementConfig(minQualityE4 = 0, keepLangs = Set("beta"),
      langIdModel = Some(m))
    assert(vm(Increment.curateIncrement(docs.toDF("doc_id", "text"),
      "doc_id", "text", dir, "b1", iCfg).ledger) == want)
    // stream gate
    val gm = vm(CurateStream.gate(docs.toDF("id", "text"), "id", "text",
        CurateStream.GateConfig(minQualityE4 = 0,
          keepLangs = Set("beta"), langIdModel = Some(m)))
      .toDF())
    assert(gm == want, s"$gm")
    // batch funnel
    val fRes = Curate.run(docs.toDF("doc_id", "text"), "doc_id", "text",
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "text",
      CurateConfig(minQualityE4 = 0, keepLangs = Set("beta"),
        langIdModel = Some(m), emitLedger = true))
    fRes.chunks.unpersist()
    assert(vm(fRes.ledger.get) == want)
    // keepLangs outside the model's languages is loud
    intercept[IllegalArgumentException] {
      Increment.curateIncrement(docs.toDF("doc_id", "text"), "doc_id",
        "text", java.nio.file.Files
          .createTempDirectory("graft_langid_bad").toString, "b1",
        IncrementConfig(keepLangs = Set("zz"), langIdModel = Some(m)))
    }
  }

  test("stream-gate usability: the per-row form runs inside a " +
      "streaming select and matches the batch scores") {
    val m = TextStats.parseLangId(modelText)
    val input = MemoryStream[(Long, String)](spark)
    val cols = TextStats.langIdScoreCols(col("text"), m)
    val q = input.toDF().toDF("id", "text")
      .select(col("id") +: cols.map { case (n, c) => c.as(n) }: _*)
      .withColumn("lang_ext", TextStats.langIdArgmax(m.langs))
      .writeStream.format("memory").queryName("langid_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(1L -> "the table is stable", 2L -> "join the join")
      q.processAllAvailable()
      val got = spark.table("langid_stream")
        .select("id", "lang_ext").as[(Long, String)].collect().toMap
      assert(got == Map(1L -> "alpha", 2L -> "beta"), s"$got")
    } finally q.stop()
  }

  test("the REAL six-language artifact: committed file equals the " +
      "generator, parses at vocabulary scale, and discriminates real " +
      "sample sentences (q175's fixture)") {
    val art = graft.probes.TextProbes.q175Artifact
    // the committed artifact file is the generator's output, verbatim
    val onDisk = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("artifacts/langid_real.profile")), "UTF-8")
    assert(onDisk == art,
      "artifacts/langid_real.profile drifted from the generator — " +
        "rerun graft.probes.DumpArtifacts")
    val m = TextStats.parseLangId(art)
    assert(m.order == 3)
    assert(m.langs == Seq("deu", "eng", "fra", "ita", "nld", "spa"))
    assert(m.profiles.forall(_._2.size == 64), "64 grams per profile")
    // overlapping vocabularies really overlap (the tie-break regime):
    // 'que' belongs to fra AND spa profiles
    def grams(l: String) = m.profiles.toMap.apply(l).map(_._1).toSet
    assert(grams("fra").intersect(grams("spa")).nonEmpty)
    // discrimination on real-ish sentences (NOT drawn verbatim from
    // the word lists alone: inflected/novel words included)
    val docs = Seq(
      1L -> "the people of this city know that they will make time for year",
      2L -> "die menschen der stadt haben immer mehr zeit und wasser",
      3L -> "les hommes de cette ville sont toujours avec nous pour faire",
      4L -> "questo tempo della vita non sempre fare tutto bene",
      5L -> "het werk van deze mensen wordt niet door alle anderen gedaan",
      6L -> "los hombres de esta ciudad tambien quieren tiempo para todos")
      .toDF("doc_id", "text")
    val got = TextStats.langIdScores(docs, "doc_id", "text", m)
      .select("doc_id", "lang_ext").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "eng", 2L -> "deu", 3L -> "fra",
      4L -> "ita", 5L -> "nld", 6L -> "spa"), got.toString)
  }
}
