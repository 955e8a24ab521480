package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, TextStats}

/** DoReMi-style learned mixture weights (TextStats.doremiMixtureWeights)
  * — behavioral pins on top of the q117 oracle's numeric exactness:
  * Group-DRO dynamics (under-served domains gain weight), conservation,
  * determinism, degenerate single-domain case, and the compose into
  * mixturePlan (the executor the learned weights exist to feed).
  */
class DoremiSpec extends SparkSpec {
  import spark.implicits._

  // Conditional bigram models only interact on SHARED CONTEXTS (disjoint
  // w1 sets leave every P(y|x) untouched by mixing — zero excess), so the
  // fixture plants an asymmetric shared context: "go" carries ~56% of
  // big's bigram mass (continuation xx) but only 10% of rare's
  // (continuation yy). Under the uniform mixture, P(yy|go) is crushed to
  // ~0.15 while P(xx|go) stays ~0.85 → rare's mass-weighted excess loss
  // is ~2× big's and DoReMi must shift weight toward rare.
  private def corpus = {
    val big = (1 to 40).map(_ =>
      ("big", "go xx go xx go xx go xx go xx"))
    val rare = (1 to 4).map(_ =>
      ("rare", "go yy aa bb cc dd ee ff gg hh ii"))
    (big ++ rare).toDF("dom", "text")
  }

  test("under-served domain gains weight; weights stay conserved") {
    val out = TextStats.doremiMixtureWeights(corpus, "dom", "text",
        vocabSize = 100L, steps = 3, etaE4 = 10000L, smoothE4 = 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (refBig, mixBig, wBig) = out("big")
    val (refRare, mixRare, wRare) = out("rare")
    // excess = mixture loss over own-model floor: rare must exceed big's
    assert(mixRare - refRare > mixBig - refBig,
      s"rare excess ${mixRare - refRare} <= big excess ${mixBig - refBig}")
    // Group-DRO direction: rare above uniform (5000), big below
    assert(wRare > 5000L, s"rare weight $wRare not upweighted")
    assert(wBig < 5000L, s"big weight $wBig not downweighted")
    // conservation within per-step rounding (D rounding slots per step)
    assert(math.abs(wBig + wRare - 10000L) <= 10L, s"sum ${wBig + wRare}")
  }

  test("deterministic across runs; single domain degenerates to full weight") {
    val a = TextStats.doremiMixtureWeights(corpus, "dom", "text", 100L)
      .collect().toSeq
    val b = TextStats.doremiMixtureWeights(corpus, "dom", "text", 100L)
      .collect().toSeq
    assert(a == b)
    val one = TextStats.doremiMixtureWeights(
        corpus.filter(col("dom") === "big"), "dom", "text", 100L)
      .collect()
    assert(one.length == 1 && one.head.getLong(4) == 10000L)
  }

  test("learned weights feed mixturePlan directly") {
    val learned = TextStats.doremiMixtureWeights(corpus, "dom", "text", 100L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val plan = Curation.mixturePlan(corpus, "dom",
        TextStats.wsTokenCount(col("text")), learned,
        budgetTokens = 1000L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("desired_tokens"))
      .toMap
    // budget splits proportionally to the learned weights
    val wsum = learned.values.sum
    assert(plan("rare") ==
      math.floor(1000.0 * learned("rare") / wsum).toLong)
    assert(plan("big") ==
      math.floor(1000.0 * learned("big") / wsum).toLong)
  }
}
