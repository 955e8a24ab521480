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
}
