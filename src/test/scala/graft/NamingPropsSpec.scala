package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.core.Naming

/** Property tests per SURVEY §5: name-derivation round-trips (OP-10/11) and
  * version-sort total ordering (OP-33). Pure functions — no Spark session.
  */
object NamingProps extends Properties("Naming") {

  private val token: Gen[String] = for {
    n <- Gen.choose(2, 6)
    cs <- Gen.listOfN(n, Gen.frequency(3 -> Gen.alphaUpperChar, 1 -> Gen.numChar))
  } yield cs.mkString

  private val instanceGen: Gen[String] =
    for { k <- Gen.choose(1, 3); ts <- Gen.listOfN(k, token) }
      yield ts.mkString("_")

  property("fileToDb ∘ dbToInstance round-trips the instance") =
    forAll(instanceGen, Gen.choose(0, 99999999), Gen.choose(0, 999999)) {
      (inst, date, time) =>
        val fn = f"$inst-$date%08d-$time%06d-A-UF2.1.dump"
        val db = Naming.fileToDb(fn)
        (db == f"${inst}_$date%08d_" + f"$time%06d".take(4)) &&
          Naming.dbToInstance(db) == inst
    }

  property("prefix round-trips through both derivations") =
    forAll(instanceGen) { inst =>
      val fn = s"$inst-20240101-123456-A.dump"
      val db = Naming.fileToDb(fn, Some("pfx"))
      db.startsWith("pfx_") && Naming.dbToInstance(db, Some("pfx")) == inst
    }

  private val versionGen: Gen[List[Int]] =
    for { k <- Gen.choose(1, 4); vs <- Gen.listOfN(k, Gen.choose(0, 99)) }
      yield vs

  property("versionKey ordering = element-wise tuple ordering") = {
    val ord = Ordering.Implicits.seqOrdering[Seq, Int]
    forAll(versionGen, versionGen) { (a, b) =>
      def render(v: List[Int]): String = s"uf${v.mkString(".")}.patch.zip"
      val ka = Naming.versionKey(render(a))
      val kb = Naming.versionKey(render(b))
      ka == a && kb == b &&
        math.signum(ord.compare(ka, kb)) == math.signum(ord.compare(a, b))
    }
  }

  property("matchAnyWildcard: empty matches all; match implies substring") =
    forAll(Gen.alphaNumStr, Gen.listOf(Gen.alphaNumStr)) { (x, pats) =>
      Naming.matchAnyWildcard(Nil, x) &&
        (!Naming.matchAnyWildcard(pats, x) || pats.isEmpty ||
          pats.exists(_.split(",", -1).exists(p => x.contains(p))))
    }

  property("hashSample rate approaches hexDigits/16 over many keys") =
    forAll(Gen.choose(1, 15)) { k =>
      val digits = "0123456789abcdef".take(k).map(_.toString)
      // MD5 first-nibble distribution over sequential keys is uniform enough
      // that 4000 samples land within ±6 points of the nominal rate
      val hits = (0 until 4000).count { i =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"key-$i".getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
        digits.contains(hex.substring(0, 1))
      }
      math.abs(hits / 4000.0 - k / 16.0) < 0.06
    }

  property("renderPasswordTemplate digits are in 1..27 range") =
    forAll(instanceGen, Gen.choose(1, 3), Gen.choose(0, 9)) { (db, pos, add) =>
      Prop.collect(pos) {
        val out = graft.pipeline.Delive
          .renderPasswordTemplate(s"x[$pos+$add]y", db + "ZZZZ")
        out.startsWith("x") && out.endsWith("y") && {
          val d = out.drop(1).dropRight(1).toInt
          d >= add && d <= 26 + add
        }
      }
    }

  property("fileToDb / dbToInstance / versionKey never throw on junk") =
    forAll(Gen.asciiStr, Gen.option(Gen.alphaStr.map(_.take(6)))) { (junk, pfx) =>
      Naming.fileToDb(junk, pfx)
      Naming.dbToInstance(junk, pfx)
      Naming.versionKey(junk)
      true
    }

  property("parseHeader is total on arbitrary bytes (never throws)") =
    forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
      val m = graft.operators.Multimodal.parseHeader(bs)
      m.kind == "unknown" || Seq("png", "jpeg", "wav", "gif", "bmp").contains(m.kind)
    }

  property("parseHeader total on signature-prefixed fuzz (walks bounded)") =
    forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { tail =>
      // adversarial bodies BEHIND real signatures reach the chunk/marker
      // walks (raw fuzz almost never does): RIFF/WAVE's size-stepped scan
      // and JPEG's length-stepped scan must terminate and not throw
      val wav = "RIFF".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4) ++
        "WAVE".getBytes("US-ASCII") ++ tail
      val jpg = Array(0xff, 0xd8).map(_.toByte) ++ tail
      val gif = "GIF89a".getBytes("US-ASCII") ++ tail
      graft.operators.Multimodal.parseHeader(wav)
      graft.operators.Multimodal.parseHeader(jpg)
      // claimedPixels additionally walks GIF extension/descriptor blocks
      // and the BMP DIB-size branch — total on fuzz, never negative
      graft.operators.Multimodal.claimedPixels(gif) >= 0L &&
        graft.operators.Multimodal.claimedPixels(
          "BM".getBytes("US-ASCII") ++ tail) >= 0L
    }

  property("parseHeader is total on truncated REAL png prefixes") = {
    val png = graft.operators.Multimodal.encodeGrayPng(5, 4, 128)
    forAll(Gen.choose(0, png.length)) { n =>
      graft.operators.Multimodal.parseHeader(png.take(n))
      true
    }
  }

  property("decodeAudioOne is total on fuzz and on truncated REAL wavs") = {
    val wav = graft.operators.Multimodal.encodePcm16Wav(8000, 1,
      Array.tabulate[Short](40)(i => (i * 7).toShort))
    forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue)),
        Gen.choose(0, wav.length)) { (tail, n) =>
      // RIFF-prefixed fuzz reaches javax.sound's own header parse; any
      // refusal path must land on the marker row, never a throw
      val fuzz = "RIFF".getBytes("US-ASCII") ++ tail
      val a = graft.operators.Multimodal.decodeAudioOne(1L, fuzz)
      val b = graft.operators.Multimodal.decodeAudioOne(2L, wav.take(n))
      (a.peak == -1 || a.n_frames > 0) && (b.peak == -1 || b.n_frames > 0)
    }
  }

  property("parseMp4 is total on ftyp-prefixed fuzz (box walk bounded)") =
    forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { tail =>
      val b = Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes("US-ASCII") ++
        "isomisom".getBytes("US-ASCII") ++ tail
      graft.operators.Multimodal.parseMp4(b)
      true
    }
}
