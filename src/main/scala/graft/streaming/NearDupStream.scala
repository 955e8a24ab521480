package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-dup gate — the unbounded-stream form of SimHash dedup
  * (the batch form is `Dedup.simhash16` + a bucket join, clustered by
  * `Dedup.connectedComponents`): admit a document iff its 16-bit SimHash
  * signature is not within `maxHamming` bits of a remembered one.
  *
  * SEMANTICS — transitive chains, matching the batch component form: a
  * rejected doc's signature still occupies the bands that did not flag it,
  * so a later doc close to a REJECTED doc (but not to any admitted one) is
  * also rejected — near-dup CHAINS collapse to one admitted representative,
  * exactly like the batch pipeline where pair edges (1,2), (2,3) put doc 3
  * in doc 1's component and keep only doc 1. `dup_of` is consequently a
  * union-find-style PARENT pointer (the matched prior, which may itself be
  * rejected), not the cluster root; follow the chain (or run the batch
  * components over the (id, dup_of) pairs) for canonical cluster ids.
  *
  * Banding (the LSH trick, stream edition): a signature is split into
  * `NumBands` 4-bit bands; two signatures within Hamming distance
  * `NumBands − 1` agree EXACTLY on at least one band (pigeonhole), so each
  * doc is routed to its `NumBands` (band, bandBits) groups and compared
  * only against the signatures remembered in those groups — per-group state
  * stays tiny (one signature list per 4-bit band value), and the state
  * store shards across executors on the group key, never a global list.
  * `maxHamming` must be < NumBands for the pigeonhole guarantee.
  *
  * A doc admitted by every band it touches is CLEAN; any band that finds a
  * close prior signature votes dup. Votes from the bands are combined
  * downstream ([[admittedAppend]] for unbounded streams, [[admitted]] as
  * the Complete-mode small-stream/test form). Cross-batch ordering between
  * two in-flight near-dups of each other is resolved by id: the smaller id
  * wins its bucket (deterministic under replays).
  */
object NearDupStream {

  val NumBands = 4
  val BandBits = 4

  case class Doc(id: Long, sig: Long)
  case class BandKey(band: Int, bits: Int)
  case class BandState(sigs: List[Doc])
  case class Vote(id: Long, sig: Long, dupOf: Long, isDup: Boolean)

  def hamming16(a: Long, b: Long): Int =
    java.lang.Long.bitCount((a ^ b) & 0xffffL)

  def bandKeys(sig: Long): Seq[BandKey] =
    (0 until NumBands).map { b =>
      BandKey(b, ((sig >> (b * BandBits)) & ((1 << BandBits) - 1)).toInt)
    }

  /** Per-band votes for a stream of (id, simhash16). Emits one [[Vote]]
    * per (doc, band); combine with [[admitted]]. State per group is the
    * list of signatures admitted by that band bucket (bounded by the
    * distinct signatures sharing 4 band bits; `maxPerBucket` caps it —
    * oldest drop first, the standard recall/space dial).
    */
  def bandVotes(docs: Dataset[Doc], maxHamming: Int = 3,
                maxPerBucket: Int = 1024)(
      implicit dEnc: Encoder[(BandKey, Doc)], kEnc: Encoder[BandKey],
      sEnc: Encoder[BandState], vEnc: Encoder[Vote]): Dataset[Vote] = {
    require(maxHamming < NumBands, "pigeonhole needs maxHamming < NumBands")
    import docs.sparkSession.implicits._
    docs.flatMap(d => bandKeys(d.sig).map(k => (k, d)))
      .groupByKey(_._1)
      .flatMapGroupsWithState[BandState, Vote](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: BandKey, rows: Iterator[(BandKey, Doc)], state: GroupState[BandState]) =>
          var seen = state.getOption.map(_.sigs).getOrElse(Nil)
          val out = rows.map(_._2).toSeq.sortBy(_.id).map { d =>
            seen.find(p => hamming16(p.sig, d.sig) <= maxHamming) match {
              case Some(prior) => Vote(d.id, d.sig, prior.id, isDup = true)
              case None =>
                seen = (d :: seen).take(maxPerBucket)
                Vote(d.id, d.sig, d.id, isDup = false)
            }
          }
          state.update(BandState(seen))
          out.iterator
      }
  }

  /** Combine band votes: a doc is admitted iff NO band saw a close prior
    * signature; `dup_of` = the smallest parent id reported by any dup-
    * voting band (each band reports its bucket's most recent match; see
    * the chain-semantics note above). Complete-mode aggregate keyed by
    * doc id — state and re-emitted output grow with the total stream, so
    * this is the SMALL-STREAM/test combiner; unbounded streams use
    * [[admittedAppend]].
    */
  def admitted(votes: Dataset[Vote]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    votes.toDF()
      .groupBy("id")
      .agg(max(when(col("isDup"), 1).otherwise(0)).cast("boolean").as("is_dup"),
        min(when(col("isDup"), col("dupOf"))).as("dup_of_raw"),
        first(col("sig")).as("sig"))
      .select(col("id"), col("is_dup"),
        coalesce(col("dup_of_raw"), col("id")).as("dup_of"), col("sig"))
  }

  case class Pending(votes: List[Vote])
  case class Verdict(id: Long, is_dup: Boolean, dup_of: Long, sig: Long)

  /** Append-mode combiner for unbounded streams: every doc's `NumBands`
    * votes are produced inside one micro-batch (bandVotes fans out and
    * emits in the same batch), so the per-id group sees them together,
    * emits ONE verdict, and removes its state — state is bounded by the
    * docs IN FLIGHT within a batch, not the stream's history, and output
    * is append-only (no Complete-mode re-emission of the whole table).
    * State lingers only for a doc whose votes were split across batches
    * (not produced by [[bandVotes]], but possible with a custom upstream);
    * such stragglers emit when their last vote arrives.
    */
  def admittedAppend(votes: Dataset[Vote])(
      implicit pEnc: Encoder[Pending], vEnc: Encoder[Verdict],
      lEnc: Encoder[Long]): Dataset[Verdict] =
    votes.groupByKey(_.id)
      .flatMapGroupsWithState[Pending, Verdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (id: Long, rows: Iterator[Vote], state: GroupState[Pending]) =>
          val all = state.getOption.map(_.votes).getOrElse(Nil) ++ rows
          if (all.size >= NumBands) {
            state.remove()
            val dups = all.filter(_.isDup)
            Iterator.single(Verdict(id, dups.nonEmpty,
              if (dups.nonEmpty) dups.map(_.dupOf).min else id,
              all.head.sig))
          } else {
            state.update(Pending(all))
            Iterator.empty
          }
      }
}
