package graft

import org.apache.spark.sql.functions._
import graft.operators.Suffix

/** Exact any-length substring dedup (distributed suffix ranks): LCPs,
  * coverage, and the cleaner, pinned against brute force.
  */
class SuffixSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force per-doc duplicated coverage: position (doc, i) covered
    * iff some substring of length >= minLen through it occurs at a
    * second (doc', i') — computed by direct token comparison.
    */
  private def bruteCoverage(docs: Seq[(Long, String)],
                            minLen: Int): Map[Long, Long] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split(" ").filter(_.nonEmpty).toSeq
    }
    def cp(a: Seq[String], b: Seq[String]): Int =
      a.zip(b).takeWhile { case (x, y) => x == y }.size
    val marks = for {
      (da, ta) <- toks
      ia <- ta.indices
      best = (for {
        (db, tb) <- toks
        ib <- tb.indices
        if da != db || ia != ib
      } yield cp(ta.drop(ia), tb.drop(ib))).maxOption.getOrElse(0)
      if best >= minLen
    } yield (da, ia, best)
    toks.map { case (id, t) =>
      val covered = Array.fill(t.size)(false)
      marks.filter(_._1 == id).foreach { case (_, i, l) =>
        (i until math.min(t.size, i + l)).foreach(covered(_) = true)
      }
      id -> covered.count(identity).toLong
    }.toMap
  }

  private val fixture = Seq(
    // docs 1 and 2 share an 8-token passage; doc 3 repeats its own
    // 5-token phrase twice; doc 4 is clean; doc 5 shares a 4-token
    // fragment with doc 1 (below a minLen of 5)
    1L -> ("alpha beta gamma delta epsilon zeta eta theta " +
      "unique one two three"),
    2L -> ("prefix words alpha beta gamma delta epsilon zeta eta theta " +
      "suffix tail"),
    3L -> ("spark plans catalyst joins well mid spark plans catalyst " +
      "joins well end"),
    4L -> "completely fresh content nothing repeated here at all",
    5L -> "alpha beta gamma delta different route now")

  test("suffixDuplicateStats matches brute force on exact >=minLen " +
      "repeats — cross-doc, within-doc, and below-threshold fragments") {
    val docs = fixture.toDF("doc_id", "text")
    for (minLen <- Seq(4, 5, 6)) {
      val got = Suffix.suffixDuplicateStats(docs, "doc_id", "text",
          minLen = minLen, cap = 16)
        .select("doc_id", "dup_tokens").as[(Long, Long)].collect().toMap
      val want = bruteCoverage(fixture, minLen)
      assert(got == want, s"minLen=$minLen: $got vs $want")
    }
  }

  test("boundaries are token-exact where the windowed approximation is " +
      "w-granular, and repeats never extend across document sentinels") {
    // the shared passage is exactly 8 tokens; at minLen=5 coverage in
    // doc 1 must be exactly 8 (positions 1-8), not rounded to a window
    val docs = fixture.toDF("doc_id", "text")
    val got = Suffix.suffixDuplicateStats(docs, "doc_id", "text",
        minLen = 5, cap = 16)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got(1L) == 8L, got.toString) // not 12 (doc len), not w-rounded
    assert(got(4L) == 0L)
    assert(got(5L) == 0L) // 4-token fragment under threshold
    // doc 2's coverage is also exactly the 8 shared tokens even though
    // they sit mid-doc (sentinels stop extension into the next doc)
    assert(got(2L) == 8L, got.toString)
  }

  test("LCP saturation at cap-1 still yields exact coverage (overlap " +
      "chain): a repeat much longer than cap is fully covered") {
    val long = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(1L -> (long + " endone"), 2L -> (long + " endtwo"))
      .toDF("doc_id", "text")
    val got = Suffix.suffixDuplicateStats(docs, "doc_id", "text",
        minLen = 5, cap = 8) // cap-1 = 7 << repeat length 40
      .select("doc_id", "dup_tokens").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 40L, 2L -> 40L), got.toString)
  }

  test("randomized: suffixDuplicateStats equals brute force on small " +
      "random corpora over a tiny alphabet (repeat-dense by construction)") {
    // seeded RNG: a 4-symbol alphabet forces organic repeats of many
    // lengths and positions — the shapes fixed fixtures can't enumerate
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val docs = (1L to 6L).map { id =>
        id -> Seq.fill(10 + rnd.nextInt(25))(
          "wxyz".charAt(rnd.nextInt(4)).toString * (1 + rnd.nextInt(2)))
          .mkString(" ")
      }
      val minLen = 3 + rnd.nextInt(3)
      val got = Suffix.suffixDuplicateStats(docs.toDF("doc_id", "text"),
          "doc_id", "text", minLen = minLen, cap = 16)
        .select("doc_id", "dup_tokens").as[(Long, Long)].collect().toMap
      val want = bruteCoverage(docs, minLen)
      assert(got == want, s"trial=$trial minLen=$minLen: $got vs $want")
    }
  }

  test("suffixDuplicateStatsSharded equals the single-stream form on a " +
      "fixture whose planted repeat provably straddles shards") {
    // clones of docs 1-3 with distinct tails: different text hash, so
    // clone and original land in pseudo-random (usually different)
    // shards — the self-check below ASSERTS at least one planted pair
    // straddles, so the cross-shard screen is genuinely load-bearing
    val planted = fixture ++ fixture.take(3).map { case (id, t) =>
      (id + 100L) -> (t + s" cloned tail ${id}x")
    }
    val docs = planted.toDF("doc_id", "text")
    val numShards = 3
    val shardOf = docs.select(col("doc_id"),
        pmod(xxhash64(col("text")), lit(numShards)).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert((1L to 3L).exists(id => shardOf(id) != shardOf(id + 100L)),
      s"fixture degenerated: all planted pairs co-shard ($shardOf) — " +
        "change tails so the screen path is exercised")
    for (minLen <- Seq(4, 5)) {
      val single = Suffix.suffixDuplicateStats(docs, "doc_id", "text",
          minLen = minLen, cap = 16)
        .select("doc_id", "n_tokens", "dup_tokens")
        .as[(Long, Long, Long)].collect().toSet
      val sharded = Suffix.suffixDuplicateStatsSharded(docs, "doc_id",
          "text", minLen = minLen, cap = 16, numShards = numShards)
        .select("doc_id", "n_tokens", "dup_tokens")
        .as[(Long, Long, Long)].collect().toSet
      assert(sharded == single, s"minLen=$minLen: $sharded vs $single")
    }
  }

  test("sharded CLEANER equals the single-stream cleaner on the " +
      "cross-shard fixture (coverage identity carries to the text level)") {
    val planted = fixture ++ fixture.take(3).map { case (id, t) =>
      (id + 100L) -> (t + s" cloned tail ${id}x")
    }
    val docs = planted.toDF("doc_id", "text")
    for (minLen <- Seq(4, 5)) {
      val single = Suffix.removeDuplicateSpansExact(docs, "doc_id",
          "text", minLen = minLen, cap = 16)
        .as[(Long, String, Long)].collect().toSet
      val sharded = Suffix.removeDuplicateSpansExactSharded(docs,
          "doc_id", "text", minLen = minLen, cap = 16, numShards = 3)
        .as[(Long, String, Long)].collect().toSet
      assert(sharded == single, s"minLen=$minLen: $sharded vs $single")
    }
  }

  test("randomized: sharded coverage is IDENTICAL to single-stream " +
      "across shard counts (including numShards = 1)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val docs = (1L to 8L).map { id =>
        id -> Seq.fill(8 + rnd.nextInt(20))(
          "wxyz".charAt(rnd.nextInt(4)).toString * (1 + rnd.nextInt(2)))
          .mkString(" ")
      }
      val minLen = 3 + rnd.nextInt(2)
      val df = docs.toDF("doc_id", "text")
      val single = Suffix.suffixDuplicateStats(df, "doc_id", "text",
          minLen = minLen, cap = 16)
        .select("doc_id", "dup_tokens").as[(Long, Long)].collect().toMap
      for (s <- Seq(1, 2, 4)) {
        val got = Suffix.suffixDuplicateStatsSharded(df, "doc_id", "text",
            minLen = minLen, cap = 16, numShards = s)
          .select("doc_id", "dup_tokens").as[(Long, Long)].collect().toMap
        assert(got == single,
          s"trial=$trial minLen=$minLen shards=$s: $got vs $single")
      }
    }
  }

  test("removeDuplicateSpansExact drops ALL occurrences of duplicated " +
      "text, keeps the rest in order, and is idempotent on the result") {
    val docs = fixture.toDF("doc_id", "text")
    val cleaned = Suffix.removeDuplicateSpansExact(docs, "doc_id", "text",
        minLen = 5, cap = 16)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(cleaned(1L)._1 == "unique one two three", cleaned(1L).toString)
    assert(cleaned(2L)._1 == "prefix words suffix tail")
    assert(cleaned(3L)._1 == "mid end") // both copies of the phrase go
    assert(cleaned(4L)._2 == 0L)
    assert(cleaned(5L)._2 == 0L)
    // second pass over the cleaned corpus removes nothing
    val again = Suffix.removeDuplicateSpansExact(
        cleaned.toSeq.map { case (id, (t, _)) => (id, t) }
          .toDF("doc_id", "text"),
        "doc_id", "text", minLen = 5, cap = 16)
      .as[(Long, String, Long)].collect()
    assert(again.forall(_._3 == 0L), again.mkString("; "))
  }

  test("combined reports equal the individual stats + cleaner operators " +
      "(global and sharded forms)") {
    val docs = fixture.toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toString).toSeq
    val statsG = Suffix.suffixDuplicateStats(docs, "doc_id", "text", 5, 16)
    val cleanG = Suffix.removeDuplicateSpansExact(docs, "doc_id", "text",
      5, 16)
    val reportG = Suffix.suffixDuplicateReport(docs, "doc_id", "text", 5, 16)
    assert(rows(reportG.select("doc_id", "n_tokens", "dup_tokens")) ==
      rows(statsG))
    assert(rows(reportG.select("doc_id", "cleaned_text",
      "n_removed_tokens")) == rows(cleanG))
    val reportS = Suffix.shardedDuplicateReport(docs, "doc_id", "text",
      5, 16, numShards = 3)
    // the coverage identity makes the sharded report equal the GLOBAL
    // operators too — pin against both single-stream outputs
    assert(rows(reportS.select("doc_id", "n_tokens", "dup_tokens")) ==
      rows(statsG))
    assert(rows(reportS.select("doc_id", "cleaned_text",
      "n_removed_tokens")) == rows(cleanG))
  }
}
