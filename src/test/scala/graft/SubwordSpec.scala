package graft

import org.apache.spark.sql.functions._
import graft.operators.Subword

class SubwordSpec extends SparkSpec {
  import spark.implicits._

  test("substringCounts weights every occurrence by word frequency") {
    val wf = Seq(("abab", 3L), ("ab", 2L)).toDF("w", "freq")
    val got = Subword.substringCounts(wf, 2, 3)
      .as[(String, Long)].collect().toMap
    // 'ab' occurs twice in abab (3 each) + once in ab (2) = 8
    assert(got("ab") == 8L)
    assert(got("ba") == 3L)
    assert(got("aba") == 3L && got("bab") == 3L)
    assert(!got.contains("a")) // below minPieceLen
  }

  test("trainWordPiece is deterministic: freq desc, piece asc, hard cut") {
    val wf = Seq(("aa", 5L), ("bb", 5L), ("cc", 1L)).toDF("w", "freq")
    val got = Subword.trainWordPiece(wf, vocabSize = 2, minPieceLen = 2,
        maxPieceLen = 2)
      .select("piece").as[String].collect().toSeq
    assert(got.toSet == Set("aa", "bb")) // cc cut; tie aa/bb kept by freq
  }

  test("wordPieceEncode: longest match wins, char fallback, doc order") {
    val model = Subword.WpModel(
      Map("abc" -> 10L, "ab" -> 9L, "cd" -> 8L), maxPieceLen = 8)
    val docs = Seq(
      (1L, "abcd"),      // longest-first: abc + d(fallback), NOT ab|cd
      (2L, "zq abcab"),  // z|q fallback word, then abc|ab
      (3L, "")           // empty doc
    ).toDF("doc_id", "text")
    val got = Subword.wordPieceEncode(docs, "doc_id", "text", model)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, "abc|d"),
      (2L, 4L, "z|q|abc|ab"),
      (3L, 0L, "")))
  }

  test("wordPieceEncode caps at maxWordIters with the documented truncation") {
    val model = Subword.WpModel(Map.empty, maxPieceLen = 8)
    val docs = Seq((1L, "a" * 40)).toDF("doc_id", "text")
    val got = Subword.wordPieceEncode(docs, "doc_id", "text", model,
        maxWordIters = 5)
      .select("n_pieces").as[Long].head()
    assert(got == 5L) // 5 fallback chars, then the cap stops the fold
  }

  test("round trip: concatenating pieces reconstructs every word") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "jumps over dogs"))
      .toDF("doc_id", "text")
    val vocab = Subword.trainWordPiece(
      graft.operators.Bpe.wordFreqs(docs, "text"), vocabSize = 20)
    val model = Subword.collectWpModel(vocab)
    val enc = Subword.wordPieceEncode(docs, "doc_id", "text", model)
      .select("doc_id", "enc").as[(Long, String)].collect().toMap
    assert(enc(1L).replace("|", "") == "thequickbrownfox")
    assert(enc(2L).replace("|", "") == "jumpsoverdogs")
  }
}
