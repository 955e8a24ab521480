package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("applyMerge fuses left-to-right non-overlapping occurrences") {
    val got = Seq(Seq("a", "a", "a"), Seq("a", "b", "a", "b"),
      Seq("x", "a", "b", "y"), Seq("b", "a"))
      .toDF("syms")
      .select(Bpe.applyMerge(col("syms"), "a", "b").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(
      Seq("a", "a", "a"),      // no (a,b) present
      Seq("ab", "ab"),
      Seq("x", "ab", "y"),
      Seq("b", "a")))          // order matters: (b,a) is not (a,b)
    val aaa = Seq(Seq("a", "a", "a")).toDF("syms")
      .select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .as[Seq[String]].head()
    assert(aaa == Seq("aa", "a")) // left-to-right, non-overlapping
  }

  test("train learns the textbook merge sequence on the Sennrich corpus") {
    // {low:5, lower:2, newest:6, widest:3} — the worked example from the
    // original BPE-for-NMT paper. Expected, with our deterministic
    // (count desc, pair asc) tie rule:
    //   (e,s)=9 → (es,t)=9 → (l,o)=7 → (lo,w)=7 → tie at 6 → (e,w)
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L)).toDF("w", "freq")
    val (merges, vocab) = Bpe.train(words, 5)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"),
      ("lo", "w"), ("e", "w")))
    val syms = vocab.select("w", "syms").as[(String, Seq[String])]
      .collect().toMap
    assert(syms("low") == Seq("low"))
    assert(syms("newest") == Seq("n", "ew", "est"))
    assert(syms("widest") == Seq("w", "i", "d", "est"))
    assert(syms("lower") == Seq("low", "e", "r"))
  }

  test("driver-local and distributed train agree: merge sequence AND " +
      "final vocabulary (incl. ties and non-BMP words)") {
    // the Sennrich corpus plus adversarial extras: a count tie broken by
    // pair order, and supplementary-plane words (UTF-8 vs UTF-16 order)
    val sets = Seq(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)),
      Seq(("ab", 3L), ("cd", 3L), ("abcd", 1L)), // (a,b) vs (c,d) tie
      Seq(("😀x😀x", 4L), ("￮a", 4L), ("𝄞a", 4L)),
      Seq(("aaaa", 2L), ("aaa", 3L)))            // overlapping-run fusing
    for (set <- sets) {
      val words = set.toDF("w", "freq")
      val (mLocal, vLocal) = Bpe.train(words, 6)
      val (mDist, vDist) = Bpe.train(words, 6, localizeBytes = 0L)
      assert(mLocal == mDist, s"merge sequences diverge on $set")
      val l = vLocal.select("w", "syms").as[(String, Seq[String])]
        .collect().toMap
      val dd = vDist.select("w", "syms").as[(String, Seq[String])]
        .collect().toMap
      assert(l == dd, s"vocabularies diverge on $set")
    }
  }

  test("train stops early when no pairs remain") {
    val words = Seq(("ab", 3L)).toDF("w", "freq")
    val (merges, _) = Bpe.train(words, 10)
    assert(merges == Seq(("a", "b"))) // after one merge the word is atomic
  }

  test("encodeSymbols and encodeWords agree on trained and demo tables") {
    // trained table: learn from the Sennrich-ish corpus, then encode
    // UNSEEN words with both forms
    val corpus = Seq("low low low lower lower newest newest newest widest")
      .toDF("text")
    val (merges, _) = Bpe.train(Bpe.wordFreqs(corpus, "text"), numMerges = 6)
    assert(merges.nonEmpty)
    // includes supplementary-plane words (emoji, U+1D11E): split(word, "")
    // is code-point aware, so encodeOne must seed code points too — a
    // UTF-16 code-unit seed would emit lone surrogates here and diverge
    val words = Seq("lowest", "newer", "wide", "low", "x", "", "thunder",
      "intand", "ananan", "andand", "lo😀west", "𝄞",
      "🐟🐟and")
    for (table <- Seq(merges, Bpe.DemoMerges)) {
      val colForm = words.toDF("w")
        .select(col("w"), Bpe.encodeSymbols(col("w"), table).as("t"))
        .as[(String, Seq[String])].collect().toMap
      val scaleForm = Bpe.encodeWords(words.toDS(), table)
        .collect().toMap
      assert(colForm == scaleForm, s"forms diverge for table $table")
    }
    // spot-check an actual encoding under the demo table
    val enc = Bpe.encodeWords(Seq("thandthe").toDS(), Bpe.DemoMerges)
      .collect().head._2
    assert(enc == Seq("th", "and", "the"))
  }

  test("codePointSymbols never splits surrogate pairs") {
    assert(Bpe.codePointSymbols("ab").toSeq == Seq("a", "b"))
    assert(Bpe.codePointSymbols("a😀b").toSeq ==
      Seq("a", "😀", "b"))
    assert(Bpe.codePointSymbols("").isEmpty)
    // a LONE surrogate (malformed input) still round-trips as one symbol
    assert(Bpe.codePointSymbols("\ud83d").toSeq == Seq("\ud83d"))
  }

  test("byte-level train learns the hand-derived DemoByteMerges sequence " +
      "on its fixture (count argmax, UTF-8 pair tiebreak) and stops dry") {
    // worked by hand: round-1 counts (74,68)=7 (68,65)=7 (61,6e)=5
    // (6e,64)=3 (65,6e)=2 (6f,6e)=2 — the 7-tie breaks to "68 65";
    // rounds 5 ties 2-2 to "6f 6e"; after 6 merges every word is atomic
    val fixture = Seq(("the", 5L), ("then", 2L), ("and", 3L),
      ("an", 2L), ("on", 2L))
    val (m, vocab) = Bpe.trainLocal(fixture, numMerges = 10,
      seed = Bpe.byteSymbols)
    assert(m == Bpe.DemoByteMerges, m.toString)
    assert(vocab.forall(_._3.size == 1), vocab.toString)
  }

  test("byte-level: driver-local and distributed train agree, including " +
      "non-ASCII where one code point spans several byte symbols") {
    val sets = Seq(
      Seq(("the", 5L), ("then", 2L), ("and", 3L), ("an", 2L), ("on", 2L)),
      Seq(("héé", 4L), ("hé", 2L), ("😀😀", 3L)))
    for (set <- sets) {
      val words = set.toDF("w", "freq")
      val (mLocal, vLocal) = Bpe.train(words, 6, byteLevel = true)
      val (mDist, vDist) = Bpe.train(words, 6, localizeBytes = 0L,
        byteLevel = true)
      assert(mLocal == mDist, s"byte merge sequences diverge on $set")
      val l = vLocal.select("w", "syms").as[(String, Seq[String])]
        .collect().toMap
      val dd = vDist.select("w", "syms").as[(String, Seq[String])]
        .collect().toMap
      assert(l == dd, s"byte vocabularies diverge on $set")
    }
  }

  test("byteSymbolsCol equals byteSymbols on ASCII, multi-byte, and " +
      "supplementary-plane words") {
    val words = Seq("the", "x", "héllo", "😀x", "𝄞", "ﬀ", "")
    val got = words.toDF("w")
      .select(col("w"), Bpe.byteSymbolsCol(col("w")).as("s"))
      .as[(String, Seq[String])].collect().toMap
    for (w <- words)
      assert(got(w) == Bpe.byteSymbols(w).toSeq, s"'$w': ${got(w)}")
  }

  test("byte fallback: encodeWordsBytes encodes words full of symbols " +
      "the table never saw — every byte stays representable, no OOV") {
    val enc = Bpe.encodeWordsBytes(
        Seq("the", "zq😀", "").toDS(), Bpe.DemoByteMerges)
      .collect().toMap
    assert(enc("the") == Seq("746865")) // fully merged
    // unseen bytes pass through as single-byte symbols (7a 71 + emoji's 4)
    assert(enc("zq😀") == Seq("7a", "71", "f0", "9f", "98", "80"))
    assert(enc("") == Seq())
    // and every encoding decodes back
    for ((w, syms) <- enc) assert(Bpe.decodeByteSymbols(syms) == w)
  }

  test("gpt2PretokensLocal: contractions, space prefixes, digit and " +
      "punctuation runs, whitespace residue — hand-derived from the " +
      "published pattern") {
    // contractions split; every run carries at most one leading space
    assert(Bpe.gpt2PretokensLocal("I don't think it's 42, you'll see!") ==
      Seq("I", " don", "'t", " think", " it", "'s", " 42", ",",
        " you", "'ll", " see", "!"))
    // case preserved; mixed alnum-punct splits at class boundaries
    assert(Bpe.gpt2PretokensLocal("GPT-2 rocks2000x") ==
      Seq("GPT", "-", "2", " rocks", "2000", "x"))
    // internal double space: `\s+(?!\S)` yields the run minus the one
    // space the next word claims as its prefix
    assert(Bpe.gpt2PretokensLocal("a  b") == Seq("a", " ", " b"))
    assert(Bpe.gpt2PretokensLocal("a   b") == Seq("a", "  ", " b"))
    // trailing whitespace is its own token (nothing follows to claim it)
    assert(Bpe.gpt2PretokensLocal("hi  ") == Seq("hi", "  "))
    // newlines are not the space prefix — they tokenize as whitespace
    assert(Bpe.gpt2PretokensLocal("a\nb") == Seq("a", "\n", "b"))
    // unicode letters hit \p{L} (Han ideographs are category Lo — the
    // space prefixes them like any word), not the punct class
    assert(Bpe.gpt2PretokensLocal("héllo wörld 四十二") ==
      Seq("héllo", " wörld", " 四十二"))
    assert(Bpe.gpt2PretokensLocal("") == Seq())
    // UNICODE whitespace (ADVICE r14): under (?U), NBSP and ideographic
    // space are \s like the Python regex module's classes in the
    // published encoder — tokenized as whitespace runs, NOT punctuation
    assert(Bpe.gpt2PretokensLocal("a b") == Seq("a", " ", "b"))
    // the space PREFIX stays the literal ASCII ' ' of the pattern, so a
    // U+3000 run splits one-per-token (`\\s+(?!\\S)` then `\\s+`), never
    // gluing onto the following word
    assert(Bpe.gpt2PretokensLocal("a　　b") ==
      Seq("a", "　", "　", "b"))
    // lossless: concatenating the tokens restores the text
    for (t <- Seq("I don't think it's 42, you'll see!", "a  b", "hi  ",
        "a\nb", "héllo wörld 四十二", "a b", "x　　y"))
      assert(Bpe.gpt2PretokensLocal(t).mkString == t)
  }

  test("gpt2Pretokens column form equals the local replica; wordFreqsGpt2 " +
      "keeps tokens verbatim (case, punct, space prefix)") {
    val texts = Seq("I don't think it's 42, you'll see!",
      "The THE the  the", "héllo wörld", "")
    val got = texts.toDF("t")
      .select(Bpe.gpt2Pretokens(col("t")).as("toks"))
      .as[Seq[String]].collect()
    assert(got.toSeq == texts.map(Bpe.gpt2PretokensLocal))
    val freqs = Bpe.wordFreqsGpt2(texts.toDF("text"), "text")
      .as[(String, Long)].collect().toMap
    // "The", " THE", " the" all distinct (verbatim); " the" seen twice
    // ("the  the" gives " the" once — the double space splits — plus one
    // from "THE the")
    assert(freqs("The") == 1L && freqs(" THE") == 1L)
    assert(freqs(" the") == 2L && freqs.contains(" "))
    assert(!freqs.contains("the ")) // spaces prefix, never suffix
  }

  test("byte-level train over wordFreqsGpt2 learns space-prefixed merges " +
      "and round-trips") {
    // tokens: "the" (doc-initial, freq 5) and " the" (freq 15). Pair
    // counts: ("74","68") = ("68","65") = 20, ("20","74") = 15; the
    // UTF-8-ascending tie-break fuses ("68","65") first ("he"), then
    // ("74","6865") completes "the", then ("20","746865") absorbs the
    // SPACE PREFIX into one symbol — the GPT-2 artifact shape the
    // normalized word table can never learn
    val docs = Seq.fill(5)("the the the the").toDF("text")
    val (merges, vocab) = Bpe.train(
      Bpe.wordFreqsGpt2(docs, "text"), numMerges = 3, byteLevel = true)
    assert(merges == Seq(("68", "65"), ("74", "6865"), ("20", "746865")))
    val syms = vocab.filter(col("w") === " the")
      .select(col("syms")).as[Seq[String]].collect().head
    assert(syms == Seq("20746865"))
    assert(Bpe.decodeByteSymbols(syms) == " the")
  }
}
