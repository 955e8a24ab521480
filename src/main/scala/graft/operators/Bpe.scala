package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING as distributed DataFrame ops —
  * the piece of the training-data pipeline that turns a corpus into a
  * merge table (the artifact a BPE tokenizer ships). The corpus-sized
  * work happens exactly once: [[wordFreqs]] reduces the corpus to a
  * vocabulary-sized (word, freq) table, and every training iteration
  * after that runs on the vocabulary — the same bounded-loop shape as
  * `Similarity.kmeansStep` / `Dedup.connectedComponents` (per-iteration
  * distributed agg + one scalar-ish driver read, lineage truncated by
  * the loop's own re-projection).
  *
  * Symbols are seeded as characters; each merge step finds the
  * highest-count adjacent symbol pair (weighted by word frequency) and
  * fuses its non-overlapping left-to-right occurrences — the classic
  * Sennrich et al. procedure, all in codegen'd HOFs (no UDFs).
  */
object Bpe {

  /** Vocabulary table (word, freq) from a text column — the ONE
    * corpus-sized pass. Words of length 1 carry no pairs but stay in the
    * vocabulary (they still anchor single-char symbols).
    */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    graft.core.Ops.widen(df)
      .select(explode(Dedup.normalizeWords(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Split a word into single-character symbols. */
  def charSymbols(word: Column): Column =
    filter(split(word, ""), s => s =!= "")

  /** Adjacent-pair counts over a symbolized vocabulary: one explode of
    * the per-word pair positions + one sum — vocabulary-sized, not
    * corpus-sized. `syms` is an array<string> column; the pair key is
    * the two symbols joined by a space (symbols themselves never contain
    * spaces — [[Dedup.normalizeWords]] strips whitespace).
    */
  def pairCounts(vocab: DataFrame, symsCol: String, freqCol: String): DataFrame =
    vocab
      .filter(size(col(symsCol)) >= 2)
      .select(col(freqCol), explode(
        transform(sequence(lit(1), size(col(symsCol)) - 1),
          i => concat_ws(" ", element_at(col(symsCol), i),
            element_at(col(symsCol), i + 1)))).as("pair"))
      .groupBy("pair").agg(sum(col(freqCol)).cast("long").as("cnt"))

  /** Fuse non-overlapping left-to-right occurrences of (a, b) in a
    * symbol array — one `aggregate` fold, the textbook BPE apply step:
    * "aaa" under merge (a,a) becomes ["aa", "a"], never ["a","aa"] or
    * overlapping ["aa","aa"].
    */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms,
      array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** ENCODE with an ordered merge table — the apply side of the tokenizer
    * ([[train]] is the learn side): seed characters, then fold
    * [[applyMerge]] over the merges in rank order. Pure column
    * expressions, so it is oracle-checkable (q83 mirrors the fold with
    * DuckDB `list_reduce`) — but expression depth grows with |merges|,
    * so this form is for BOUNDED tables (probes, tests, small domain
    * vocabularies). Production-sized tables use [[encodeWords]].
    */
  def encodeSymbols(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(charSymbols(word))((s, m) => applyMerge(s, m._1, m._2))

  /** Scale-path encoder: per-word greedy min-rank merging in a typed
    * `mapPartitions` loop, merge ranks shipped once per task in the
    * closure (a 50k-entry map, not 50k chained expressions). Equivalent
    * to [[encodeSymbols]] for tables produced by [[train]]: a symbol
    * created by merge r only appears in pairs of rank > r, so fusing in
    * rank order and greedy min-rank fusing reach the same normal form —
    * BpeSpec pins the agreement on a trained table.
    */
  def encodeWords(words: org.apache.spark.sql.Dataset[String],
                  merges: Seq[(String, String)])
      : org.apache.spark.sql.Dataset[(String, Seq[String])] = {
    import words.sparkSession.implicits._
    val table = merges.toVector
    val ranks: Map[(String, String), Int] =
      table.zipWithIndex.map { case (m, i) => m -> i }.toMap
    words.mapPartitions(_.map(w => (w, encodeOne(w, table, ranks))))
  }

  /** Seed symbols from CODE POINTS, not UTF-16 code units — `split(word,
    * "")` (the [[charSymbols]] form) never splits a surrogate pair, so the
    * scale path must not either, or non-BMP words (emoji, rare CJK) would
    * emit lone-surrogate symbols that can never match trained merges.
    */
  private[graft] def codePointSymbols(w: String): scala.collection.mutable.ArrayBuffer[String] = {
    val buf = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var k = 0
    while (k < w.length) {
      val cp = w.codePointAt(k)
      buf += new String(Character.toChars(cp))
      k += Character.charCount(cp)
    }
    buf
  }

  private[graft] def encodeOne(w: String,
                                   table: Vector[(String, String)],
                                   ranks: Map[(String, String), Int]): Seq[String] =
    encodeOneSeeded(codePointSymbols(w), table, ranks)

  private[graft] def encodeOneSeeded(syms0: scala.collection.mutable.ArrayBuffer[String],
                                     table: Vector[(String, String)],
                                     ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = syms0
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = table(best)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out
        done = syms.length < 2
      }
    }
    syms.toSeq
  }

  /** The fixed trained-shape merge table q83/BpeSpec share (every created
    * symbol only appears in later-rank pairs, like any [[train]] output).
    */
  val DemoMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "s" -> "t")

  /** Hand-derived byte-merge table for the fixture vocabulary
    * {the:5, then:2, and:3, an:2, on:2} — BpeSpec pins
    * `trainLocal(fixture, byteSymbols)` to exactly this sequence (count
    * argmax with UTF-8 pair-string tiebreak, worked by hand in the spec),
    * and q148 encodes under it with a DuckDB fold oracle. Symbol names
    * are hex byte pairs: 74="t" 68="h" 65="e" 6e="n" 61="a" 64="d" 6f="o".
    */
  val DemoByteMerges: Seq[(String, String)] = Seq(
    "68" -> "65", "74" -> "6865", "61" -> "6e", "616e" -> "64",
    "6f" -> "6e", "746865" -> "6e")

  // ---- byte-level form (GPT-2 / LLaMA-family seeding) ---------------------

  /** UTF-8 bytes of a word as lowercase 2-hex-char symbols — byte-level
    * BPE seeding (the GPT-2/LLaMA tokenizer family): a 256-symbol base
    * alphabet, so EVERY string is encodable with no OOV and no <unk> by
    * construction (an unmerged byte simply stays a single-byte symbol —
    * the "byte fallback"), and any merged symbol decodes by unhexing its
    * concatenated name. Hex-pair names replace GPT-2's cosmetic
    * byte→printable-unicode table: same algebra, and the decode side is
    * SQL-expressible (`unhex`) instead of needing the 256-entry table.
    */
  private[graft] def byteSymbols(w: String): scala.collection.mutable.ArrayBuffer[String] = {
    val bytes = w.getBytes("UTF-8")
    val buf = new scala.collection.mutable.ArrayBuffer[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      buf += f"${bytes(i) & 0xff}%02x"
      i += 1
    }
    buf
  }

  /** Column form of [[byteSymbols]] (codegen'd HOFs, no UDF). Empty words
    * must short-circuit: `sequence(1, 0)` DESCENDS in Spark ([1, 0]), which
    * would yield two empty symbols where [[byteSymbols]]("") is empty.
    */
  def byteSymbolsCol(word: Column): Column = {
    val h = lower(hex(encode(word, "UTF-8")))
    val syms = transform(sequence(lit(1), (length(h) / lit(2)).cast("int")),
      i => h.substr((i - lit(1)) * lit(2) + lit(1), lit(2)))
    when(length(word) === 0, array().cast("array<string>")).otherwise(syms)
  }

  /** Decode a byte-level symbol sequence back to the string: unhex the
    * concatenated symbol names, read as UTF-8. Total inverse of any
    * encode over [[byteSymbols]] seeding — merges only ever concatenate
    * names, so the byte stream survives verbatim (BpeSpec property-pins
    * `decode(encode(s)) == s` over arbitrary UTF-8 incl. supplementary
    * planes).
    */
  def decodeByteSymbols(syms: Seq[String]): String = {
    val hexStr = syms.mkString
    val out = new Array[Byte](hexStr.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(hexStr.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    new String(out, "UTF-8")
  }

  /** Scale-path byte-level encoder — [[encodeWords]] with [[byteSymbols]]
    * seeding; same greedy min-rank loop, same normal-form equivalence.
    */
  def encodeWordsBytes(words: org.apache.spark.sql.Dataset[String],
                       merges: Seq[(String, String)])
      : org.apache.spark.sql.Dataset[(String, Seq[String])] = {
    import words.sparkSession.implicits._
    val table = merges.toVector
    val ranks: Map[(String, String), Int] =
      table.zipWithIndex.map { case (m, i) => m -> i }.toMap
    words.mapPartitions(_.map(w =>
      (w, encodeOneSeeded(byteSymbols(w), table, ranks))))
  }

  // ---- GPT-2 pretokenization (published contraction/space-prefix regex) ---

  /** The GPT-2 pretokenization pattern (Radford et al. 2019; the
    * published `encoder.py` regex, reproduced in every GPT-2-family
    * tokenizer): common English contractions split as their own tokens;
    * letter runs, digit runs, and punctuation runs each carry at most
    * ONE preceding space (the space-prefix convention — " the" and "the"
    * are different tokens); residual whitespace runs become their own
    * tokens, with `\s+(?!\S)` splitting a run so its last space can
    * still prefix the following word. Training byte-level BPE on THIS
    * word table (instead of [[wordFreqs]]' lowercased, punctuation-
    * stripped one) makes the learned merges match the tokenizers the
    * operator emulates: case preserved, punctuation tokenized, and the
    * high-frequency space-prefixed word forms present.
    *
    * The `(?U)` prefix (UNICODE_CHARACTER_CLASS) makes Java's `\s`/`\S`
    * match the Unicode White_Space property like the Python `regex`
    * module's classes in the published encoder — without it NBSP and
    * ideographic-space text is classed as punctuation here but
    * whitespace by real GPT-2 tokenizers (parity spec pins both chars).
    */
  val Gpt2PretokenPattern: String =
    "(?U)'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+" +
      "|\\s+(?!\\S)|\\s+"

  /** All GPT-2 pretokens of a text column — `regexp_extract_all` group 0
    * (codegen'd; Java regex handles the lookahead alternative). Under
    * `(?U)`, Java's `\s`/`\p{L}`/`\p{N}` classes match the Python
    * `regex` module's on the full Unicode alphabet.
    */
  def gpt2Pretokens(text: Column): Column =
    regexp_extract_all(text, lit(Gpt2PretokenPattern), lit(0))

  private lazy val gpt2Re = java.util.regex.Pattern.compile(Gpt2PretokenPattern)

  /** Executor-side replica of [[gpt2Pretokens]] (the MinHashStream
    * local-replica discipline) — for typed tokenize paths and the parity
    * spec. Same Java pattern object semantics as the column form.
    */
  def gpt2PretokensLocal(text: String): Seq[String] = {
    val m = gpt2Re.matcher(text)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) buf += m.group()
    buf.toSeq
  }

  /** GPT-2-faithful vocabulary table (word, freq): pretokens kept
    * VERBATIM — case, punctuation, and the space prefix are part of the
    * token, unlike [[wordFreqs]]' normalize-lower-strip. One corpus pass;
    * feed to [[train]] with `byteLevel = true` for GPT-2-family merges
    * (the space byte 0x20 seeds as symbol "20" like any other).
    */
  def wordFreqsGpt2(df: DataFrame, textCol: String): DataFrame =
    graft.core.Ops.widen(df)
      .select(explode(gpt2Pretokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Deterministic integer vocabulary for a byte-level merge table: base
    * symbols "00".."ff" get ids 0..255 (their byte value — the no-OOV
    * floor every string falls back to), and the symbol created by merge
    * rank r gets id 256 + r — the canonical GPT-2-family id assignment
    * (base alphabet first, merges in learn order). Keyed by symbol
    * STRING: if two ranks ever create the same concatenated name (never
    * for [[train]] output, which only merges each pair once) the later
    * rank's id wins, consistently on both the encode and any decode side.
    */
  def byteVocabIds(merges: Seq[(String, String)]): Map[String, Int] =
    ((0 until 256).map(b => f"$b%02x" -> b) ++
      merges.zipWithIndex.map { case ((a, b), r) => (a + b) -> (256 + r) })
      .toMap

  /** [[byteVocabIds]] plus RESERVED special tokens (BOS/EOS/PAD/UNK and
    * friends): specials take the ids AFTER the merge space —
    * `256 + numMerges + declaration index` — the GPT-2-family
    * convention (<|endoftext|> = 50256 = 256 + 50000). Specials are
    * STRUCTURAL: they are injected by the pipeline (document wrapping,
    * sequence padding), never produced by encoding raw text — a
    * document containing the literal string `"<|eos|>"` encodes to byte
    * tokens and round-trips as text (injection safety by construction;
    * byte-level BPE has no OOV, so UNK exists only to reserve the id
    * real pretraining configs expect).
    */
  def byteVocabIdsWithSpecials(merges: Seq[(String, String)],
                               specials: Seq[String]): Map[String, Int] = {
    require(specials.distinct.size == specials.size &&
        specials.forall(_.nonEmpty),
      s"specials must be distinct and non-empty: ${specials.mkString(",")}")
    val base = byteVocabIds(merges)
    specials.foreach(sp => require(!base.contains(sp),
      s"special token '$sp' collides with a vocabulary symbol"))
    base ++ specials.zipWithIndex.map { case (sp, i) =>
      sp -> (256 + merges.size + i)
    }
  }

  /** Just the special-token id assignments of
    * [[byteVocabIdsWithSpecials]] — what wrap/pad/strip callers need.
    */
  def specialIds(merges: Seq[(String, String)],
                 specials: Seq[String]): Map[String, Int] =
    specials.zipWithIndex.map { case (sp, i) =>
      sp -> (256 + merges.size + i)
    }.toMap

  /** Tokenize a whole corpus into integer token-id sequences — the apply
    * side at deployment scale (the single biggest job a training-data
    * pipeline runs: every byte of a 100 TB corpus flows through it).
    * GPT-2 pretokenization ([[gpt2PretokensLocal]], the spec-pinned
    * replica of the codegen'd column form) splits each doc; byte-level
    * BPE ([[encodeOneSeeded]] over [[byteSymbols]]) encodes each
    * pretoken independently (merges never cross pretoken boundaries —
    * the published tokenizer contract); symbols map to ids via
    * [[byteVocabIds]].
    *
    * Scale shape — ZERO shuffles: one typed `mapPartitions` pass (the
    * documented tokenizer-seam exception), output staying with its
    * input partition. The Zipf saving that a distinct-pretoken +
    * join-back chain buys with THREE corpus-sized shuffles (distinct,
    * word join, doc reassembly — and the word join degrades from
    * broadcast to a full sort-merge the moment the corpus's distinct
    * pretokens outgrow the threshold, measured ~1.7x super-linear at
    * 10x) is captured instead by a per-task word→ids memo: Zipf means
    * the memo's hit rate matches the global dedupe's for a fraction of
    * the coordination. The memo is size-capped (2^17 entries) so a
    * pathological all-distinct corpus degrades to per-word encode cost,
    * never to unbounded task memory. Merge ranks ship once per task in
    * the closure (vocabulary-bounded — the [[encodeWords]] contract).
    *
    * `idCol` exits as BIGINT; empty/null text encodes to an empty ids
    * array.
    */
  def encodeCorpusGpt2(df: DataFrame, idCol: String, textCol: String,
                       merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val table = merges.toVector
    val ranks: Map[(String, String), Int] =
      table.zipWithIndex.map { case (m, i) => m -> i }.toMap
    val vocab = byteVocabIds(merges)
    graft.core.Ops.widen(df)
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = new java.util.HashMap[String, Array[Int]](1 << 16)
        it.map { case (id, text) =>
          val out = scala.collection.mutable.ArrayBuilder.make[Int]
          gpt2PretokensLocal(if (text == null) "" else text).foreach { w =>
            var ids = memo.get(w)
            if (ids == null) {
              ids = encodeOneSeeded(byteSymbols(w), table, ranks)
                .map(vocab).toArray
              if (memo.size < (1 << 17)) memo.put(w, ids)
            }
            out ++= ids
          }
          (id, out.result())
        }
      }
      .toDF(idCol, "ids")
      .withColumn("n_tokens", size(col("ids")).cast("long"))
  }

  /** Detokenize id sequences back to text — [[encodeCorpusGpt2]]'s total
    * inverse (byte-level BPE never loses bytes: merges only concatenate
    * hex names, so unhexing the concatenated names replays the exact
    * UTF-8 stream; GPT-2 pretokens partition the text, so word joins
    * need no separator). Scale shape: ids explode positionally and
    * equi-join the broadcast vocab table (≤ 256 + |merges| rows); one
    * hash groupBy per doc reassembles — codegen'd HOFs end to end, no
    * UDF. Docs whose `idsCol` is empty decode to the empty string.
    */
  def decodeCorpus(df: DataFrame, idCol: String, idsCol: String,
                   merges: Seq[(String, String)],
                   textName: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vocabDf = byteVocabIds(merges).toSeq.map(_.swap)
      .toDF("__tid", "__sym")
    val hexed = graft.core.Ops.widen(df)
      .select(col(idCol), posexplode(col(idsCol)).as(Seq("__pos", "__tid")))
      .join(broadcast(vocabDf), "__tid")
      .groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__pos"), col("__sym")))),
        s => s.getField("__sym")), "").as("__hex"))
    graft.core.Ops.widen(df).select(col(idCol))
      .join(hexed, Seq(idCol), "left")
      .select(col(idCol),
        decode(unhex(coalesce(col("__hex"), lit(""))), "UTF-8")
          .as(textName))
  }

  /** [[decodeCorpus]] for id streams that carry STRUCTURAL specials:
    * BOS/EOS/PAD/UNK ids strip before byte reassembly (they encode
    * pipeline structure, not document bytes), so
    * `decodeCorpusSpecials(wrap(encode(text))) == text` — the lossless
    * round-trip extended to the special-token space. Text-derived byte
    * tokens can never collide with a special id (specials live past the
    * merge space), so stripping is exact.
    */
  def decodeCorpusSpecials(df: DataFrame, idCol: String, idsCol: String,
                           merges: Seq[(String, String)],
                           specials: Seq[String],
                           textName: String = "text"): DataFrame = {
    val cut = 256 + merges.size // first special id
    decodeCorpus(
      df.withColumn(idsCol, filter(col(idsCol), t => t < lit(cut))),
      idCol, idsCol, merges, textName)
  }

  /** The complete tokenizer config a pretraining run ships: the merge
    * table plus the reserved special-token space plus the byte-level
    * flag. Versioned via [[writeTokenizerArtifact]].
    */
  case class TokenizerArtifact(merges: Seq[(String, String)],
                               specials: Seq[String],
                               byteLevel: Boolean = true) {
    def vocab: Map[String, Int] = byteVocabIdsWithSpecials(merges, specials)
    def specialId(tok: String): Int = {
      val i = specials.indexOf(tok)
      require(i >= 0, s"tokenizer artifact has no special '$tok' " +
        s"(declared: ${specials.mkString(", ")})")
      256 + merges.size + i
    }
  }

  /** Publish a tokenizer config as a VERSIONED warehouse artifact
    * through the commit-marker path ([[graft.pipeline.Restore
    * .publishVersionedDir]]): `merges` (rank, a, b), `specials`
    * (idx, token), `meta` (byte_level, n_merges, n_specials) in one
    * immutable version dir, the marker swap making it current. A
    * tokenizer change is a RETRAIN-the-world event — versioning it like
    * every index artifact is what lets a shard builder pin exactly
    * which vocabulary produced which shards.
    */
  def writeTokenizerArtifact(spark: org.apache.spark.sql.SparkSession,
                             warehouse: String, db: String, token: String,
                             art: TokenizerArtifact)
      : org.apache.hadoop.fs.Path = {
    import spark.implicits._
    graft.pipeline.Restore.publishVersionedDir(spark, warehouse, db,
        token) { vdir =>
      writeMergeTable(spark, art.merges, s"$vdir/merges")
      art.specials.zipWithIndex.map { case (sp, i) => (i, sp) }
        .toDF("idx", "token")
        .repartition(1).write.mode("overwrite").parquet(s"$vdir/specials")
      Seq((art.byteLevel, art.merges.size, art.specials.size))
        .toDF("byte_level", "n_merges", "n_specials")
        .repartition(1).write.mode("overwrite").parquet(s"$vdir/meta")
    }
  }

  /** Read back the CURRENT tokenizer artifact version. Loud on a
    * missing db or a meta/table count mismatch (a torn hand-rolled dir
    * — the versioned publish can't produce one).
    */
  def readTokenizerArtifact(spark: org.apache.spark.sql.SparkSession,
                            warehouse: String, db: String)
      : TokenizerArtifact = {
    import spark.implicits._
    val cur = graft.pipeline.Restore.resolveVersioned(spark, warehouse, db)
      .getOrElse(throw new IllegalStateException(
        s"readTokenizerArtifact: no current version of $db under " +
          warehouse))
    val merges = readMergeTable(spark, s"$cur/merges")
    val specials = spark.read.parquet(s"$cur/specials")
      .orderBy("idx").select("token").as[String].collect().toSeq
    val meta = spark.read.parquet(s"$cur/meta").head()
    val (bl, nm, ns) = (meta.getBoolean(0), meta.getInt(1), meta.getInt(2))
    require(nm == merges.size && ns == specials.size,
      s"readTokenizerArtifact: meta declares ($nm merges, $ns specials) " +
        s"but tables hold (${merges.size}, ${specials.size}) at $cur")
    TokenizerArtifact(merges, specials, bl)
  }

  /** Persist a trained merge table — the artifact a tokenizer SHIPS
    * (train once, tokenize every snapshot forever): one (rank, a, b)
    * row per merge. Callers wanting atomic publish wrap this in
    * [[graft.pipeline.Restore.publishVersionedDir]] like any other
    * artifact; the table itself is vocabulary-bounded.
    */
  def writeMergeTable(spark: org.apache.spark.sql.SparkSession,
                      merges: Seq[(String, String)], dir: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "a", "b")
      .repartition(1).write.mode("overwrite").parquet(dir)
  }

  /** Read a merge table back in rank order. Bounded collect by
    * construction (a tokenizer table is ≤ ~100k rows); the loud guard
    * catches a wrong path aimed at a corpus-sized table.
    */
  def readMergeTable(spark: org.apache.spark.sql.SparkSession,
                     dir: String,
                     maxMerges: Int = 1 << 20): Seq[(String, String)] = {
    val rows = spark.read.parquet(dir)
      .select("rank", "a", "b").orderBy("rank")
      .limit(maxMerges + 1).collect()
    require(rows.length <= maxMerges,
      s"readMergeTable: $dir holds more than $maxMerges rows — not a " +
        "merge table?")
    rows.map(r => (r.getString(1), r.getString(2))).toSeq
  }

  /** Learn `numMerges` merges. Returns (merge table as ordered (a, b)
    * pairs, final symbolized vocabulary). Ties on count break by pair
    * string (UTF-8 binary order, Spark's default collation) —
    * deterministic.
    *
    * TWO EXECUTION FORMS, same algebra:
    *  - The (word, freq) vocabulary is corpus-DEDUPLICATED and therefore
    *    bounded (~1M rows for web-scale corpora) no matter how large the
    *    corpus was; when its optimizer-estimated size fits
    *    `localizeBytes`, it is collected ONCE and the merge loop runs
    *    driver-local — one Spark job total instead of one per merge. At
    *    a production 50k-merge tokenizer that is 1 job vs 50k sequential
    *    job rounds; the corpus-sized work ([[wordFreqs]]) was already
    *    distributed and stays so.
    *  - Oversized vocabularies keep the distributed loop: per merge, one
    *    vocabulary-sized agg, one 1-row driver read (the argmax), one
    *    column rewrite; `localCheckpoint` every few rounds truncates the
    *    fold-over-fold lineage (the connectedComponents lesson — plans
    *    double, data doesn't).
    * BpeSpec pins merge-sequence AND final-vocabulary equality of the two
    * forms; `localizeBytes = 0` forces the distributed path.
    */
  def train(words: DataFrame, numMerges: Int,
            checkpointEvery: Int = 8,
            localizeBytes: Long = 64L << 20,
            byteLevel: Boolean = false): (Seq[(String, String)], DataFrame) = {
    require(checkpointEvery > 0,
      "train: checkpointEvery must be >= 1 (fold lineage grows per merge)")
    val est = words.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= localizeBytes) {
      val local = words.select(col("w"), col("freq").cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val (merges, vocab) = trainLocal(local, numMerges,
        if (byteLevel) byteSymbols else codePointSymbols)
      val sp = words.sparkSession
      import sp.implicits._
      return (merges, vocab.toDF("w", "freq", "syms"))
    }
    var vocab = words.select(col("w"), col("freq"),
      (if (byteLevel) byteSymbolsCol(col("w"))
       else charSymbols(col("w"))).as("syms"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val top = pairCounts(vocab, "syms", "freq")
        .orderBy(col("cnt").desc, col("pair").asc).limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val Array(a, b) = top(0).getString(0).split(" ", 2)
        merges += ((a, b))
        vocab = vocab.withColumn("syms", applyMerge(col("syms"), a, b))
        if ((i + 1) % checkpointEvery == 0)
          vocab = vocab.localCheckpoint(eager = true)
      }
      i += 1
    }
    (merges.toSeq, vocab)
  }

  /** `a < b` in UTF-8 byte order — what Spark's default UTF8_BINARY
    * collation (the distributed loop's `orderBy(pair)`) compares, which
    * DIFFERS from Java String.compareTo (UTF-16 units) for code points in
    * [U+E000, U+FFFF] vs supplementary-plane ones. The local loop must
    * break count ties identically or the two forms diverge on exactly the
    * corpora the code-point seeding fix exists for.
    */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** The driver-local merge loop — exact same algebra as the distributed
    * form: pair counts weighted by word freq, argmax by (count desc, pair
    * asc in UTF-8 order), left-to-right non-overlapping fuse.
    */
  private[graft] def trainLocal(vocab0: Seq[(String, Long)], numMerges: Int,
                                seed: String => scala.collection.mutable.ArrayBuffer[String]
                                  = codePointSymbols)
      : (Seq[(String, String)], Seq[(String, Long, Seq[String])]) = {
    var vocab: Vector[(String, Long, Vector[String])] =
      vocab0.map { case (w, f) => (w, f, seed(w).toVector) }.toVector
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((_, f, syms) <- vocab; j <- 0 until syms.length - 1)
        counts.updateWith((syms(j), syms(j + 1)))(c => Some(c.getOrElse(0L) + f))
      if (counts.isEmpty) done = true
      else {
        val best = counts.keysIterator.reduceLeft { (p, q) =>
          val (cp, cq) = (counts(p), counts(q))
          if (cp > cq) p
          else if (cq > cp) q
          else if (utf8Less(p._1 + " " + p._2, q._1 + " " + q._2)) p else q
        }
        val (a, b) = best
        merges += best
        vocab = vocab.map { case (w, f, syms) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              out += (a + b); j += 2
            } else { out += syms(j); j += 1 }
          }
          (w, f, out.result())
        }
      }
      i += 1
    }
    (merges.toSeq, vocab.map { case (w, f, s) => (w, f, s: Seq[String]) })
  }
}
