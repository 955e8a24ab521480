package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** The fastText-style quality classifier (hashed features + distributed
  * full-batch logistic GD). The oracle probe (q98) pins the exact numeric
  * trajectory; this spec pins the LEARNING behavior (separable classes
  * actually separate), determinism, the hand-computed first GD step, and
  * the bias-only path for empty documents.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // separable toy corpus: positives speak one vocabulary, negatives another
  private def toyDocs = {
    val pos = (0 until 20).map(i =>
      (i.toLong, s"alpha bravo charlie delta echo alpha bravo word$i", 1))
    val neg = (0 until 20).map(i =>
      (100L + i, s"zulu yankee xray whiskey victor zulu yankee junk$i", 0))
    (pos ++ neg).toDF("doc_id", "text", "y")
  }

  test("train separates separable classes") {
    val docs = toyDocs
    val model = Classifier.train(docs, "doc_id", "text", "y",
      dim = 32, iters = 12, lrE6 = 2000000L)
    val scored = Classifier.score(docs, "doc_id", "text", model)
      .join(docs.select(col("doc_id"), col("y")), Seq("doc_id"))
      .select(col("y"), col("p_e6")).as[(Int, Long)].collect()
    val posScores = scored.filter(_._1 == 1).map(_._2)
    val negScores = scored.filter(_._1 == 0).map(_._2)
    assert(posScores.min > negScores.max,
      s"classes overlap: pos min ${posScores.min} <= neg max ${negScores.max}")
    assert(posScores.min > 500000L && negScores.max < 500000L,
      "0.5 threshold should separate the trained classes")
  }

  test("training is deterministic") {
    val docs = toyDocs
    val m1 = Classifier.train(docs, "doc_id", "text", "y",
      dim = 16, iters = 3, lrE6 = 500000L)
    val m2 = Classifier.train(docs.repartition(7), "doc_id", "text", "y",
      dim = 16, iters = 3, lrE6 = 500000L)
    assert(m1.weightsE6.toSeq == m2.weightsE6.toSeq,
      "weights must not depend on partitioning or run order")
  }

  test("first GD step matches the hand computation") {
    // dim 4; "a" hashes somewhere deterministic — compute expectations from
    // the same md5 arithmetic the operator uses rather than hardcoding.
    val docs = Seq((1L, "a a a", 1), (2L, "b b", 0)).toDF("doc_id", "text", "y")
    val model = Classifier.train(docs, "doc_id", "text", "y",
      dim = 4, iters = 1, lrE6 = 1000000L)
    def bucketAndSign(word: String): (Int, Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(word.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      ((h % 4).toInt, if ((h / 4) % 2 == 0) 1L else -1L)
    }
    val (ba, sa) = bucketAndSign("a")
    val (bb, sb) = bucketAndSign("b")
    // iter 1 from zero weights: p = 500000 for both docs, so
    // d1 = 500000 - 1e6 = -500000, d2 = 500000. x_a = 3*sa (doc 1 only),
    // x_b = 2*sb (doc 2 only), bias x = 1 for both.
    val expected = Array.fill(5)(0L)
    def upd(j: Int, g: Long): Unit =
      expected(j) -= math.floor(1000000.0 * g / (2.0 * 1e6) + 0.5).toLong
    if (ba == bb) upd(ba, 3 * sa * -500000L + 2 * sb * 500000L)
    else { upd(ba, 3 * sa * -500000L); upd(bb, 2 * sb * 500000L) }
    upd(4, -500000L + 500000L)
    assert(model.weightsE6.toSeq == expected.toSeq,
      s"got ${model.weightsE6.toSeq}, want ${expected.toSeq}")
  }

  test("scoreExpr (stateless per-row form) is exactly score (aggregate " +
      "form) on every doc, including empty text") {
    val docs = toyDocs.unionByName(
      Seq((500L, "", 0), (501L, "alpha zulu alpha zulu", 1))
        .toDF("doc_id", "text", "y"))
    val model = Classifier.train(docs, "doc_id", "text", "y",
      dim = 16, iters = 4, lrE6 = 1000000L)
    val agg = Classifier.score(docs, "doc_id", "text", model)
      .as[(Long, Long)].collect().toMap
    val expr = docs.select(col("doc_id"),
        Classifier.scoreExpr(col("text"), model).as("p_e6"))
      .as[(Long, Long)].collect().toMap
    assert(agg === expr)
  }

  test("empty documents score through the bias alone") {
    val docs = Seq((1L, "alpha beta", 1), (2L, "", 0), (3L, "alpha", 1))
      .toDF("doc_id", "text", "y")
    val model = Classifier.train(docs, "doc_id", "text", "y",
      dim = 8, iters = 2, lrE6 = 500000L)
    val scored = Classifier.score(docs, "doc_id", "text", model)
      .as[(Long, Long)].collect().toMap
    assert(scored.keySet == Set(1L, 2L, 3L), "every doc must score")
    // doc 2's margin is exactly the bias
    val expectedEmpty = math.floor(
      1e6 / (1.0 + math.exp(-(model.biasE6.toDouble / 1e6))) + 0.5).toLong
    assert(scored(2L) == expectedEmpty)
  }
}
