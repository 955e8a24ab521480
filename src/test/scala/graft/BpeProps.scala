package graft

import org.scalacheck.{Arbitrary, Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.operators.Bpe

/** Byte-level BPE round-trip property (round-13 mandate): for ARBITRARY
  * UTF-8 input — including supplementary-plane code points that span 4
  * byte symbols — `decodeByteSymbols(encode(s)) == s` under any trained-
  * shape merge table. Pure functions, no Spark session.
  */
object BpeProps extends Properties("Bpe") {

  // valid-UTF-8 strings with the planes a web corpus actually mixes:
  // ASCII, Latin-1 accents, CJK, and supplementary-plane emoji/music
  private val codePoint: Gen[Int] = Gen.frequency(
    6 -> Gen.choose(0x20, 0x7e),       // ASCII
    2 -> Gen.choose(0xa1, 0x2ff),      // 2-byte UTF-8
    2 -> Gen.choose(0x4e00, 0x9fff),   // CJK (3-byte)
    2 -> Gen.oneOf(0x1f600, 0x1f64f, 0x1d11e, 0x10348)) // 4-byte
  private val utf8String: Gen[String] = for {
    n <- Gen.choose(0, 24)
    cps <- Gen.listOfN(n, codePoint)
  } yield cps.flatMap(Character.toChars(_).toSeq).mkString

  // trained-shape tables: learn from a random byte-level vocabulary so
  // the encode exercises real merges, not just the seed passthrough
  private val table: Gen[Seq[(String, String)]] = for {
    ws <- Gen.listOfN(6, utf8String.suchThat(_.nonEmpty))
    k <- Gen.choose(0, 8)
  } yield Bpe.trainLocal(ws.map(_ -> 2L), k, Bpe.byteSymbols)._1

  implicit private val arbStr: Arbitrary[String] = Arbitrary(utf8String)

  property("decode(encode(s)) == s for arbitrary UTF-8 under any " +
      "trained byte-merge table") =
    forAll(utf8String, table) { (s, t) =>
      val ranks = t.toVector.zipWithIndex.map { case (m, i) => m -> i }.toMap
      val enc = Bpe.encodeOneSeeded(Bpe.byteSymbols(s), t.toVector, ranks)
      Bpe.decodeByteSymbols(enc) == s
    }

  property("encoding under the EMPTY table is the byte seed itself " +
      "(no-OOV base alphabet)") =
    forAll(utf8String) { s =>
      val enc = Bpe.encodeOneSeeded(Bpe.byteSymbols(s), Vector.empty, Map.empty)
      enc == Bpe.byteSymbols(s).toSeq && Bpe.decodeByteSymbols(enc) == s
    }
}
