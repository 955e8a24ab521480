package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.core.Naming

/** Property tests for the round-3 curation/upgrade surface. The Column
  * forms are exercised through the ScalaTest specs; here the pure logic
  * (version keys, band keys, hamming, the gram-window algebra mirrored in
  * pure Scala) gets the randomized treatment — no Spark session.
  */
object CurationProps extends Properties("Curation") {

  private val wordGen: Gen[String] =
    for { n <- Gen.choose(1, 8); cs <- Gen.listOfN(n, Gen.alphaLowerChar) }
      yield cs.mkString

  private val wordsGen: Gen[List[String]] = Gen.listOf(wordGen)

  /** Pure mirror of Curation.wordNgrams (the Column form is spec-tested
    * against this shape's outputs in ExtOperatorsSpec).
    */
  private def ngrams(words: List[String], n: Int): List[String] =
    if (words.size < n) Nil
    else words.sliding(n).map(_.mkString(" ")).toList

  property("ngram count = max(0, |words| - n + 1); every gram has n words") =
    forAll(wordsGen, Gen.choose(1, 5)) { (ws, n) =>
      val gs = ngrams(ws, n)
      gs.size == math.max(0, ws.size - n + 1) &&
        gs.forall(_.split(" ").length == n)
    }

  property("user-rights versionKey is case-insensitive and order-preserving") = {
    val ord = Ordering.Implicits.seqOrdering[Seq, Int]
    val versionGen = for {
      k <- Gen.choose(1, 4); vs <- Gen.listOfN(k, Gen.choose(0, 99))
    } yield vs
    val caseGen = Gen.oneOf("User Rights v", "USER RIGHTS V", "user rights v")
    forAll(versionGen, versionGen, caseGen, caseGen) { (a, b, ca, cb) =>
      def render(c: String, v: List[Int]) = s"$c${v.mkString(".")}.zip"
      val ka = Naming.versionKey(render(ca, a), Naming.UserRightsPattern)
      val kb = Naming.versionKey(render(cb, b), Naming.UserRightsPattern)
      ka == a && kb == b &&
        math.signum(ord.compare(ka, kb)) == math.signum(ord.compare(a, b))
    }
  }

  property("patch filenames never match the user-rights pattern and vice versa") =
    forAll(Gen.choose(0, 99), Gen.choose(0, 99)) { (ma, mi) =>
      Naming.versionKey(s"uf$ma.$mi.patch.zip", Naming.UserRightsPattern).isEmpty &&
        Naming.versionKey(s"User Rights v$ma.$mi.zip").isEmpty
    }

  import graft.streaming.NearDupStream

  property("hamming16 is a metric on 16-bit sigs (symmetry, identity, triangle)") =
    forAll(Gen.choose(0L, 0xffffL), Gen.choose(0L, 0xffffL),
      Gen.choose(0L, 0xffffL)) { (a, b, c) =>
      NearDupStream.hamming16(a, a) == 0 &&
        NearDupStream.hamming16(a, b) == NearDupStream.hamming16(b, a) &&
        NearDupStream.hamming16(a, c) <=
          NearDupStream.hamming16(a, b) + NearDupStream.hamming16(b, c)
    }

  property("pigeonhole: sigs within hamming NumBands-1 share an exact band") =
    forAll(Gen.choose(0L, 0xffffL),
      Gen.listOfN(NearDupStream.NumBands - 1, Gen.choose(0, 15))) { (a, flips) =>
      val b = flips.foldLeft(a)((s, i) => s ^ (1L << i))
      NearDupStream.bandKeys(a).toSet
        .intersect(NearDupStream.bandKeys(b).toSet).nonEmpty
    }

  property("BPE encode: tokens concat back to the word; no mergeable pair left") =
    forAll(wordGen) { w =>
      val table = graft.operators.Bpe.DemoMerges.toVector
      val ranks = table.zipWithIndex.map { case (m, i) => m -> i }.toMap
      val toks = graft.operators.Bpe.encodeOne(w, table, ranks)
      toks.mkString == w &&
        toks.sliding(2).withFilter(_.size == 2)
          .forall(p => !ranks.contains((p(0), p(1))))
    }

  /** Pure mirror of chunkByTokens' window arithmetic (starts 1..size-overlap
    * by stride): full coverage, and no window contained in its predecessor
    * (the round-4 ADVICE wart, proven closed over the whole domain).
    */
  property("chunk windows: bounded starts cover every word, none redundant") =
    forAll(Gen.choose(0, 200), Gen.choose(2, 50), Gen.choose(0, 48)) {
      (n, maxT, ovRaw) =>
        val overlap = math.min(ovRaw, maxT - 1)
        val stride = maxT - overlap
        val starts = 1 to math.max(n - overlap, 1) by stride
        val windows = starts.map(s => (s, math.min(s + maxT - 1, n)))
        val covered = n == 0 ||
          windows.flatMap { case (a, b) => a to b }.toSet == (1 to n).toSet
        val noContained = windows.sliding(2).withFilter(_.size == 2).forall {
          case Seq((a1, b1), (a2, b2)) => !(a2 >= a1 && b2 <= b1)
        }
        covered && noContained
    }

  // ---- duplicate-window algebra (round 7) --------------------------------
  // Pure mirror of Curation.duplicateWindows' definition: canonical = min
  // (doc, pos) per window CONTENT, every other occurrence is a duplicate.
  // A tiny vocabulary forces real collisions under randomization.

  private val tinyDocGen: Gen[List[String]] =
    Gen.choose(0, 14).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")))
  private val tinyCorpusGen: Gen[List[(Long, List[String])]] =
    Gen.choose(1, 6).flatMap(k =>
      Gen.listOfN(k, tinyDocGen)).map(_.zipWithIndex.map {
      case (ws, i) => (i.toLong, ws) })

  private def dupStarts(corpus: List[(Long, List[String])],
                        w: Int): Map[Long, List[Int]] = {
    val occ = for {
      (id, ws) <- corpus
      i <- 1 to ws.length - w + 1
    } yield (ws.slice(i - 1, i - 1 + w).mkString(" "), (id, i))
    val canon = occ.groupBy(_._1).map { case (h, os) => h -> os.map(_._2).min }
    occ.collect { case (h, o) if canon(h) != o => o }
      .groupBy(_._1).map { case (id, os) => id -> os.map(_._2).sorted }
  }

  /** The islands formula both engines run (Spark window + oracle SQL). */
  private def islandsCoverage(starts: List[Int], w: Int): Long =
    starts.foldLeft((0L, 0L)) { case ((end, total), p) =>
      val add = math.max(0L, p + w - math.max(p, end))
      (math.max(end, p + w), total + add)
    }._2

  property("islands coverage formula == brute-force covered-position count") =
    forAll(tinyCorpusGen, Gen.choose(1, 4)) { (corpus, w) =>
      dupStarts(corpus, w).forall { case (_, starts) =>
        islandsCoverage(starts, w) ==
          starts.flatMap(p => p until p + w).toSet.size
      }
    }

  property("duplicate-window stats respect their bounds and ignore corpus " +
      "list order") =
    forAll(tinyCorpusGen, Gen.choose(1, 4)) { (corpus, w) =>
      val d = dupStarts(corpus, w)
      val bounds = corpus.forall { case (id, ws) =>
        val nW = math.max(0, ws.length - w + 1)
        val starts = d.getOrElse(id, Nil)
        val cov = islandsCoverage(starts, w)
        starts.length <= nW && cov <= ws.length &&
          (starts.isEmpty || cov >= w)
      }
      // canonical is (doc, pos)-determined: shuffling the corpus list
      // cannot change who is a duplicate
      bounds && dupStarts(corpus.reverse, w) == d
    }

  property("gumbel noise from the id-hash uniform is finite and " +
      "seed-deterministic for every id") =
    forAll(Gen.choose(Long.MinValue, Long.MaxValue), Gen.choose(0L, 1L << 40)) {
      (id, seed) =>
        // pure mirror of TextStats.importanceResample's u derivation
        def u(id: Long, seed: Long): Double = {
          val d = java.security.MessageDigest.getInstance("MD5")
            .digest(s"$id/$seed".getBytes("UTF-8"))
          val v = java.lang.Long.parseLong(
            d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
          (v + 0.5) / 4294967296.0
        }
        val g = -math.log(-math.log(u(id, seed)))
        java.lang.Double.isFinite(g) && u(id, seed) == u(id, seed) &&
          u(id, seed) > 0.0 && u(id, seed) < 1.0
    }
}
