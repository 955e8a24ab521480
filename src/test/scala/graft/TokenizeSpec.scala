package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Curation}

/** Corpus tokenization (encodeCorpusGpt2) and token-id sequence packing
  * (packTokenIds): distributed-vs-local parity, stream-reassembly
  * invariants, and the weighted prefix-sum helper they stand on.
  */
class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  private val merges = Bpe.DemoByteMerges

  // the local replica: GPT-2 pretokens → per-word byte BPE → vocab ids
  private def encodeLocal(text: String): Seq[Int] = {
    val table = merges.toVector
    val ranks = table.zipWithIndex.map { case (m, i) => m -> i }.toMap
    val vocab = Bpe.byteVocabIds(merges)
    Bpe.gpt2PretokensLocal(text).flatMap(w =>
      Bpe.encodeOneSeeded(Bpe.byteSymbols(w), table, ranks).map(vocab))
  }

  test("encodeCorpusGpt2 equals the per-doc local composition, " +
      "including supplementary-plane text and empty docs") {
    val docs = Seq(
      (1L, "the theme then and on"),
      (2L, "It's 42, don't stop!"),
      (3L, "café 😀 mixed"), // é + emoji: multi-byte UTF-8
      (4L, ""),
      (5L, "and and and")).toDF("doc_id", "text")
    val got = Bpe.encodeCorpusGpt2(docs, "doc_id", "text", merges)
      .select("doc_id", "ids", "n_tokens")
      .as[(Long, Seq[Int], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    for ((id, text) <- Seq(1L -> "the theme then and on",
        2L -> "It's 42, don't stop!", 3L -> "café 😀 mixed",
        4L -> "", 5L -> "and and and")) {
      val want = encodeLocal(text)
      assert(got(id)._1 == want, s"doc $id")
      assert(got(id)._2 == want.length.toLong, s"doc $id count")
    }
    // merged symbols really fire: "the" = 74+68+65 merges to one id
    assert(got(1L)._1.head == 256 + 1, "'the' should encode as one id")
  }

  test("packTokenIds: the sequence stream reassembles the doc stream, " +
      "all sequences but the last are exactly seqLen, doc counts hold") {
    val docs = Seq(
      (10L, Seq(1, 2, 3)),
      (20L, Seq(4, 5)),
      (30L, Seq.empty[Int]),
      (40L, (100 to 120).toSeq)).toDF("doc_id", "ids")
    val seqLen = 7; val eos = 999
    val packed = Curation.packTokenIds(docs, "doc_id", "ids", seqLen, eos)
      .select("seq_id", "ids", "n_tokens", "n_docs")
      .as[(Long, Seq[Int], Long, Long)].collect().sortBy(_._1)
    // stream equality: concat of sequences == concat of docs+EOS in order
    val wantStream = Seq(1, 2, 3, eos, 4, 5, eos, eos) ++
      (100 to 120) :+ eos
    assert(packed.flatMap(_._2).toSeq == wantStream)
    // seq ids dense from 0; all but last exactly seqLen
    assert(packed.map(_._1).toSeq == packed.indices.map(_.toLong))
    packed.dropRight(1).foreach { p =>
      assert(p._2.length == seqLen && p._3 == seqLen, s"seq ${p._1}")
    }
    assert(packed.last._2.length == wantStream.length % seqLen ||
      packed.last._2.length == seqLen)
    // doc attribution: seq 0 is exactly docs 10 (4 ids) + 20 (3 ids);
    // seq 1 starts with doc 30's lone EOS then doc 40
    assert(packed(0)._4 == 2L)
    assert(packed(1)._4 == 2L)
  }

  test("decodeCorpus inverts encodeCorpusGpt2 byte for byte, and the " +
      "merge table round-trips through its parquet artifact") {
    val texts = Seq(
      (1L, "the theme then and on"),
      (2L, "It's 42, don't stop!"),
      (3L, "café 😀 mixed\ttabs"),
      (4L, ""),
      (5L, "ünïcode ΣΩ 中文 a-1"))
    val docs = texts.toDF("doc_id", "text")
    val enc = Bpe.encodeCorpusGpt2(docs, "doc_id", "text", merges)
    val dec = Bpe.decodeCorpus(enc, "doc_id", "ids", merges)
      .as[(Long, String)].collect().toMap
    for ((id, t) <- texts) assert(dec(id) == t, s"doc $id")
    // artifact round trip: write, read back in rank order, ids stable
    val dir = java.nio.file.Files
      .createTempDirectory("graft_merges").toString
    Bpe.writeMergeTable(spark, merges, dir)
    val back = Bpe.readMergeTable(spark, dir)
    assert(back == merges)
    assert(Bpe.byteVocabIds(back) == Bpe.byteVocabIds(merges))
  }

  test("globalExclusivePrefixSum matches the local cumsum on a " +
      "shuffled fixture and mints no duplicate offsets") {
    val rows = (1L to 1000L).map(i => (i, i % 7 + 1))
    val df = spark.createDataFrame(
      new scala.util.Random(42).shuffle(rows)).toDF("k", "w")
      .repartition(13)
    val got = graft.core.Ops.globalExclusivePrefixSum(df,
        Seq(col("k")), "w", "ps")
      .select("k", "ps").as[(Long, Long)].collect().toMap
    var acc = 0L
    for ((k, w) <- rows) {
      assert(got(k) == acc, s"key $k")
      acc += w
    }
  }

  test("globalExclusivePrefixSum under TIED keys mints non-overlapping " +
      "offsets (ROWS frame, not RANGE)") {
    // three rows share one key: RANGE framing would give each the full
    // peer-group sum; ROWS must hand out some permutation of the
    // exclusive prefixes {0, 2, 4} (+ prior mass 1)
    val df = Seq((0L, 1L), (5L, 2L), (5L, 2L), (5L, 2L), (9L, 3L))
      .toDF("k", "w")
    val got = graft.core.Ops.globalExclusivePrefixSum(df,
        Seq(col("k")), "w", "ps")
      .select("k", "ps").as[(Long, Long)].collect()
    assert(got.filter(_._1 == 0L).map(_._2).toSeq == Seq(0L))
    assert(got.filter(_._1 == 5L).map(_._2).toSet == Set(1L, 3L, 5L))
    assert(got.filter(_._1 == 9L).map(_._2).toSeq == Seq(7L))
  }

  test("special-token space: ids reserve after the merge space, " +
      "collisions are loud, injection-safe round trip with specials " +
      "stripped, padded packing emits fixed-length rows") {
    val specials = Seq("<|bos|>", "<|eos|>", "<|pad|>", "<|unk|>")
    val v = Bpe.byteVocabIdsWithSpecials(merges, specials)
    val base = Bpe.byteVocabIds(merges)
    assert(base.forall { case (k, id) => v(k) == id },
      "adding specials must not move any existing id (q162 hash contract)")
    assert(v("<|bos|>") == 256 + merges.size &&
      v("<|unk|>") == 256 + merges.size + 3)
    assert(Bpe.specialIds(merges, specials) ==
      specials.zipWithIndex.map { case (s2, i) =>
        s2 -> (256 + merges.size + i) }.toMap)
    intercept[IllegalArgumentException] { // collision with a base symbol
      Bpe.byteVocabIdsWithSpecials(merges, Seq("00"))
    }
    intercept[IllegalArgumentException] { // duplicate specials
      Bpe.byteVocabIdsWithSpecials(merges, Seq("<|a|>", "<|a|>"))
    }
    // INJECTION SAFETY + round trip: a doc containing the literal
    // special string encodes as bytes and survives; structural specials
    // wrapped around the ids strip on decode
    val sid = Bpe.specialIds(merges, specials)
    val docs = Seq((1L, "plain text"), (2L, "evil <|eos|> inline"),
      (3L, "")).toDF("doc_id", "t")
    val enc = Bpe.encodeCorpusGpt2(docs, "doc_id", "t", merges)
      .withColumn("ids", concat(array(lit(sid("<|bos|>"))), col("ids"),
        array(lit(sid("<|eos|>")), lit(sid("<|pad|>")))))
    val back = Bpe.decodeCorpusSpecials(enc, "doc_id", "ids", merges,
        specials, "t2")
      .select("doc_id", "t2").as[(Long, String)].collect().toMap
    assert(back == Map(1L -> "plain text", 2L -> "evil <|eos|> inline",
      3L -> ""), s"$back")
    // padded packing: every row exactly seqLen; pad mass only on the
    // final row; n_tokens stays the real count
    val enc2 = Bpe.encodeCorpusGpt2(
      (1L to 7L).map(i => (i, s"doc number $i right here"))
        .toDF("doc_id", "t"), "doc_id", "t", merges)
    val packed = Curation.packTokenIdsPadded(enc2, "doc_id", "ids",
        seqLen = 16, eosId = sid("<|eos|>"), padId = sid("<|pad|>"),
        bosId = Some(sid("<|bos|>")))
      .select(col("seq_id"), size(col("ids")).as("len"), col("n_tokens"),
        size(filter(col("ids"), t => t === sid("<|pad|>"))).as("npad"))
      .as[(Long, Int, Long, Int)].collect().sortBy(_._1)
    assert(packed.forall(_._2 == 16), s"${packed.toSeq}")
    assert(packed.init.forall(_._4 == 0) &&
      packed.last._4 == 16 - packed.last._3, s"${packed.toSeq}")
    // bos/eos placement: one bos and one eos per doc in the stream
    val stream = Curation.packTokenIdsPadded(enc2, "doc_id", "ids", 16,
        sid("<|eos|>"), sid("<|pad|>"), Some(sid("<|bos|>")))
      .orderBy("seq_id").select("ids").as[Seq[Int]].collect()
      .flatten.toSeq
    assert(stream.count(_ == sid("<|bos|>")) == 7 &&
      stream.count(_ == sid("<|eos|>")) == 7)
  }

  test("packTokenIdsWithSpans: shared columns identical to packTokenIds," +
      " spans are sorted, contiguous, and attribute every token") {
    val enc = Bpe.encodeCorpusGpt2(
      (1L to 9L).map(i => (i, s"span doc $i with some words here"))
        .toDF("doc_id", "t"), "doc_id", "t", merges)
    val plain = Curation.packTokenIds(enc, "doc_id", "ids", 16, 262)
      .select("seq_id", "ids", "n_tokens", "n_docs")
      .as[(Long, Seq[Int], Long, Long)].collect().sortBy(_._1).toSeq
    val spanned = Curation.packTokenIdsWithSpans(enc, "doc_id", "ids",
        16, 262)
      .select(col("seq_id"), col("ids"), col("n_tokens"), col("n_docs"),
        col("spans"))
      .as[(Long, Seq[Int], Long, Long, Seq[(Long, Long, Long)])]
      .collect().sortBy(_._1).toSeq
    assert(spanned.map(t => (t._1, t._2, t._3, t._4)) == plain,
      "spans variant must not change the token stream")
    for ((seqId, ids, nTok, nDocs, spans) <- spanned) {
      assert(spans.size == nDocs, s"seq $seqId: ${spans.size} != $nDocs")
      assert(spans.map(_._3).sum == nTok,
        s"seq $seqId: spans must attribute every token")
      // contiguous, sorted, starting at 0 (the global-stream layout)
      assert(spans.head._2 == 0L, s"seq $seqId head ${spans.head}")
      spans.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._2 == a._2 + a._3, s"seq $seqId gap: $a → $b")
        case _ => ()
      }
      assert(ids.size == nTok)
    }
    // cross-sequence: every doc's total attributed length equals its
    // encoded length + 1 (the EOS)
    val encLens = enc.select(col("doc_id"), size(col("ids")).cast("long"))
      .as[(Long, Long)].collect().toMap
    val attributed = spanned.flatMap(_._5).groupBy(_._1)
      .map { case (d, ss) => d -> ss.map(_._3).sum }
    assert(attributed == encLens.map { case (d, n) => d -> (n + 1L) },
      s"$attributed vs $encLens")
  }

  test("tokenizer artifact: versioned publish + read round trip, " +
      "version bump flips the current pointer, torn meta is loud") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_tokart").toString
    val art = Bpe.TokenizerArtifact(merges,
      Seq("<|bos|>", "<|eos|>", "<|pad|>", "<|unk|>"))
    Bpe.writeTokenizerArtifact(spark, wh, "tok", "0", art)
    val got = Bpe.readTokenizerArtifact(spark, wh, "tok")
    assert(got == art, s"$got")
    assert(got.specialId("<|pad|>") == 256 + merges.size + 2)
    intercept[IllegalArgumentException] {
      got.specialId("<|nope|>")
    }
    assert(got.vocab == Bpe.byteVocabIdsWithSpecials(merges, got.specials))
    // version bump: a retrained table with a different special set
    val art2 = Bpe.TokenizerArtifact(merges.take(3), Seq("<|eos|>"),
      byteLevel = false)
    Bpe.writeTokenizerArtifact(spark, wh, "tok", "1", art2)
    assert(Bpe.readTokenizerArtifact(spark, wh, "tok") == art2)
  }
}
