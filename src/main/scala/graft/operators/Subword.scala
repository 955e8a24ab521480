package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece-style subword tokenization (Schuster & Nakajima 2012; the
  * BERT tokenizer's inference rule): a frequency-trained piece
  * vocabulary plus GREEDY LONGEST-MATCH encoding with single-character
  * fallback. The second tokenizer family next to [[Bpe]] (learned
  * merges): training here is one distributed substring-count pass over
  * the vocabulary-bounded word-frequency table, and encoding is a pure
  * per-row fold — no iteration-per-merge loop at all, which is what
  * makes the WordPiece shape attractive at corpus scale.
  *
  * Determinism: vocabulary selection orders by (weighted freq DESC,
  * piece ASC); longest-match is unique by construction; the per-word
  * fold caps at `maxWordIters` steps with the SAME cap mirrored in the
  * oracle, so the contract is structural.
  */
object Subword {

  /** Per-LENGTH literal piece maps — the probe-partitioning trick every
    * broadcast-vocabulary fold (WordPiece here, the [[Unigram]] family)
    * shares. `element_at` over a map literal codegens to a LINEAR scan
    * of every entry, so one combined map makes each probe O(|vocab|);
    * pieces are ASCII ([[Dedup.normalizeWords]] output), so a length-l
    * probe can only ever equal a length-l key — probing the length-l
    * sub-map returns the identical value (or the identical null) while
    * scanning ~|vocab|/numLengths entries. Pure lookup partitioning:
    * no arithmetic changes, outputs bit-identical (the word-end
    * slice-clamp case is argued at each call site).
    */
  private[operators] def lenMaps(costs: Map[String, Long]): Map[Int, Column] =
    costs.groupBy(_._1.length).map { case (l, m) => l -> typedLit(m) }

  private[operators] def probeLen(maps: Map[Int, Column], piece: Column,
                                  l: Int): Column =
    maps.get(l).map(m => element_at(m, piece))
      .getOrElse(lit(null).cast("long"))

  /** All substrings of length [minPieceLen, maxPieceLen] of every vocab
    * word, weighted by word frequency — every occurrence counts (a word
    * containing a piece twice contributes twice its frequency). One
    * explode over the vocabulary-bounded word table.
    */
  def substringCounts(wordFreqs: DataFrame, minPieceLen: Int,
                      maxPieceLen: Int): DataFrame = {
    require(1 <= minPieceLen && minPieceLen <= maxPieceLen)
    wordFreqs
      .select(col("w"), col("freq"),
        explode(sequence(lit(minPieceLen), lit(maxPieceLen))).as("__l"))
      .filter(length(col("w")) >= col("__l"))
      .select(col("freq"),
        explode(expr("transform(sequence(1, length(w) - __l + 1), " +
          "p -> substring(w, p, __l))")).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("wfreq"))
  }

  /** Top-`vocabSize` pieces by (weighted frequency DESC, piece ASC) —
    * the deterministic frequency-trained vocabulary. Global top-k plans
    * TakeOrderedAndProject (no single-partition sort shuffle).
    */
  def trainWordPiece(wordFreqs: DataFrame, vocabSize: Int,
                     minPieceLen: Int = 2,
                     maxPieceLen: Int = 8): DataFrame = {
    require(vocabSize >= 1)
    substringCounts(wordFreqs, minPieceLen, maxPieceLen)
      .orderBy(col("wfreq").desc, col("piece").asc)
      .limit(vocabSize)
  }

  /** Collected serving vocabulary (the [[TextStats.KnModel]] bounded-
    * model contract): piece → weighted freq, capped.
    */
  case class WpModel(pieces: Map[String, Long], maxPieceLen: Int)

  def collectWpModel(vocab: DataFrame, maxPieceLen: Int = 8,
                     maxEntries: Int = 1 << 20): WpModel = {
    val rows = vocab.select(col("piece"), col("wfreq").cast("long"))
      .limit(maxEntries + 1).collect()
    require(rows.length <= maxEntries,
      s"collectWpModel: vocabulary > $maxEntries pieces")
    WpModel(rows.map(r => r.getString(0) -> r.getLong(1)).toMap, maxPieceLen)
  }

  /** Greedy longest-match encoding: at each position take the LONGEST
    * vocabulary piece that matches; no piece → emit the single character
    * (char fallback keeps encoding total without chars in the vocab).
    * Per word the fold runs at most `maxWordIters` steps (each consumes
    * ≥ 1 char, so words up to that many chars encode completely; the cap
    * is mirrored in the oracle — structural parity, not luck). Output:
    * (idCol, n_pieces, enc) with `enc` the '|'-joined piece stream in
    * document order. Pure per-row HOF arithmetic over a broadcast
    * vocabulary literal — no shuffle, no UDF.
    */
  def wordPieceEncode(docs: DataFrame, idCol: String, textCol: String,
                      model: WpModel,
                      maxWordIters: Int = 32): DataFrame = {
    val vmaps = lenMaps(model.pieces)
    val words = Dedup.normalizeWords(col(textCol))
    val encodeWord: Column => Column = w => {
      val cs = filter(split(w, ""), s => s =!= "")
      def pieceAt(pos: Column, l: Column): Column =
        array_join(slice(cs, pos, l), "")
      val init = struct(lit(1).as("p"),
        array().cast("array<string>").as("acc"))
      val folded = aggregate(
        sequence(lit(1), lit(maxWordIters)),
        init,
        (st, _) => {
          val pos = st.getField("p")
          // build SHORTEST-first so the fold wraps longer lengths
          // OUTERMOST — longest match wins. (Per-length sub-map probes:
          // a word-END probe of length l > remaining clamps to the
          // remaining-r-char suffix and under the combined map matched
          // that r-char key at mlen = l; under sub-maps the same suffix
          // matches at mlen = r. Either way the EMITTED piece is the
          // clamped suffix and the advanced position passes the word
          // end, so the piece stream is identical — see lenMaps.)
          val mlen = (2 to model.maxPieceLen).foldLeft(lit(1)) {
            (els, l) =>
              when(probeLen(vmaps, pieceAt(pos, lit(l)), l).isNotNull, lit(l))
                .otherwise(els)
          }
          when(pos > size(cs), st).otherwise(struct(
            (pos + mlen).as("p"),
            concat(st.getField("acc"), array(pieceAt(pos, mlen))).as("acc")))
        },
        st => st.getField("acc"))
      folded
    }
    graft.core.Ops.widen(docs)
      .select(col(idCol), flatten(transform(words, encodeWord)).as("__ps"))
      .select(col(idCol), size(col("__ps")).cast("long").as("n_pieces"),
        array_join(col("__ps"), "|").as("enc"))
  }
}
