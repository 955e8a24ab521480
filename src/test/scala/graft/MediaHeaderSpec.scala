package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaMeta

/** Container-header parsing vectors: headers built byte-by-byte from the
  * format specs (PNG RFC 2083 §3.1/IHDR, JPEG ISO 10918 marker walk, WAV
  * RIFF chunks) — real parsing of real byte layouts, no codec involved.
  */
class MediaHeaderSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def png(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdrLen = Array(0, 0, 0, 13).map(_.toByte)
    val ihdrTag = "IHDR".getBytes("US-ASCII")
    def be(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    sig ++ ihdrLen ++ ihdrTag ++ be(w) ++ be(h) ++
      Array[Byte](8, 6, 0, 0, 0) // bit depth, color type, etc.
  }

  private def jpegWithSof(w: Int, h: Int, comps: Int,
                          progressive: Boolean = false): Array[Byte] = {
    val soi = Array(0xff, 0xd8).map(_.toByte)
    // an APP0 segment to walk over (length 16: 2 len bytes + 14 payload)
    val app0 = Array(0xff, 0xe0, 0x00, 0x10).map(_.toByte) ++
      Array.fill[Byte](14)(0x4a)
    val sofMarker = if (progressive) 0xc2 else 0xc0
    val sof = Array(0xff, sofMarker, 0x00, 0x11, 0x08).map(_.toByte) ++
      Array((h >> 8).toByte, h.toByte, (w >> 8).toByte, w.toByte,
        comps.toByte)
    soi ++ app0 ++ sof
  }

  private def wav(channels: Int, rate: Int,
                  junkFirst: Boolean = false): Array[Byte] = {
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte,
      (v >> 24).toByte)
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    val junk = "JUNK".getBytes("US-ASCII") ++ le32(4) ++ Array.fill[Byte](4)(0)
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(channels) ++ le32(rate) ++
      le32(rate * channels * 2) ++ le16(channels * 2) ++ le16(16)
    val body = (if (junkFirst) junk else Array.emptyByteArray) ++ fmt
    "RIFF".getBytes("US-ASCII") ++ le32(4 + body.length) ++
      "WAVE".getBytes("US-ASCII") ++ body
  }

  test("PNG IHDR dimensions, including > 255 (big-endian multi-byte)") {
    assert(Multimodal.parseHeader(png(640, 480)) ==
      MediaMeta("png", 640, 480, 0, 0))
    assert(Multimodal.parseHeader(png(70000, 3)) ==
      MediaMeta("png", 70000, 3, 0, 0))
  }

  test("JPEG SOF walk skips APP segments; baseline and progressive") {
    assert(Multimodal.parseHeader(jpegWithSof(1024, 768, 3)) ==
      MediaMeta("jpeg", 1024, 768, 3, 0))
    assert(Multimodal.parseHeader(jpegWithSof(300, 200, 1, progressive = true)) ==
      MediaMeta("jpeg", 300, 200, 1, 0))
  }

  test("WAV fmt chunk: channels + sample rate, even behind a JUNK chunk") {
    assert(Multimodal.parseHeader(wav(2, 44100)) ==
      MediaMeta("wav", 0, 0, 2, 44100))
    assert(Multimodal.parseHeader(wav(1, 16000, junkFirst = true)) ==
      MediaMeta("wav", 0, 0, 1, 16000))
  }

  test("corrupt WAV chunk size (negative) terminates instead of looping") {
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte,
      (v >> 24).toByte)
    val evil = "RIFF".getBytes("US-ASCII") ++ le32(100) ++
      "WAVE".getBytes("US-ASCII") ++
      "JUNK".getBytes("US-ASCII") ++ le32(-9) ++ Array.fill[Byte](32)(0)
    // -9 makes the naive walk advance by 0 bytes (8 + (-9) + 1) — must
    // return unknown, not hang the task
    assert(Multimodal.parseHeader(evil).kind == "unknown")
  }

  test("JPEG fill bytes (FF padding) before a marker are skipped") {
    val withFill = Array(0xff, 0xd8, 0xff, 0xff, 0xff).map(_.toByte) ++
      Array(0xc0, 0x00, 0x11, 0x08).map(_.toByte) ++
      Array((200 >> 8).toByte, 200.toByte, (100 >> 8).toByte, 100.toByte,
        3.toByte)
    assert(Multimodal.parseHeader(withFill) ==
      MediaMeta("jpeg", 100, 200, 3, 0))
  }

  test("unknown / truncated payloads degrade to kind=unknown, no throw") {
    assert(Multimodal.parseHeader("plain text".getBytes("UTF-8")).kind ==
      "unknown")
    assert(Multimodal.parseHeader(Array.emptyByteArray).kind == "unknown")
    assert(Multimodal.parseHeader(png(1, 1).take(10)).kind == "unknown")
    assert(Multimodal.parseHeader(wav(2, 44100).take(14)).kind == "unknown")
    // JPEG with SOS before any SOF: give up cleanly
    val sosFirst = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0, 0, 1, 2, 3)
      .map(_.toByte)
    assert(Multimodal.parseHeader(sosFirst).kind == "unknown")
  }

  test("GIF and BMP headers parse dims (little-endian); short forms refuse") {
    // GIF89a, logical screen 320x200: LE u16s at 6 and 8
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array(0x40, 0x01, 0xc8, 0x00, 0, 0, 0).map(_.toByte)
    assert(Multimodal.parseHeader(gif) == MediaMeta("gif", 320, 200, 0, 0))
    // BMP, 640x480: LE i32s at 18 and 22; negative height (top-down rows)
    // reports its magnitude
    def bmp(w: Int, h: Int) = "BM".getBytes("US-ASCII") ++
      new Array[Byte](16) ++
      Array(w & 0xff, (w >> 8) & 0xff, (w >> 16) & 0xff, (w >> 24) & 0xff,
        h & 0xff, (h >> 8) & 0xff, (h >> 16) & 0xff, (h >> 24) & 0xff)
        .map(_.toByte)
    assert(Multimodal.parseHeader(bmp(640, 480)) ==
      MediaMeta("bmp", 640, 480, 0, 0))
    assert(Multimodal.parseHeader(bmp(640, -480)) ==
      MediaMeta("bmp", 640, 480, 0, 0))
    // crafted NEGATIVE width (invalid in any BMP) clamps to 0 — no
    // MediaMeta row ever carries a negative dimension
    assert(Multimodal.parseHeader(bmp(-640, 480)) ==
      MediaMeta("bmp", 0, 480, 0, 0))
    // Int.MinValue height: math.abs would stay negative; we report the
    // maximal magnitude so the bomb guard sees a huge claim, not a tiny one
    assert(Multimodal.parseHeader(bmp(2, Int.MinValue)) ==
      MediaMeta("bmp", 2, Int.MaxValue, 0, 0))
    // truncated signatures refuse to classify
    assert(Multimodal.parseHeader(gif.take(8)).kind == "unknown")
    assert(Multimodal.parseHeader(bmp(1, 1).take(20)).kind == "unknown")
  }

  test("WAV PCM round trip: decoded sample stats equal synthesis arithmetic") {
    // ramp 0,40,80,…: mean|s| and peak are closed-form
    val frames = Array.tabulate[Short](120)(i => (40 * (i % 100)).toShort)
    val bytes = Multimodal.encodePcm16Wav(8000, 2, frames)
    val d = Multimodal.decodeAudioOne(7L, bytes)
    assert(d.channels == 2 && d.sample_rate == 8000 && d.n_frames == 120L)
    assert(d.duration_e4 == math.floor(120 * 10000.0 / 8000 + 0.5).toLong)
    // sum_{i<120}(i%100) = 4950 + 20*19/2 = 5140; ×40 per channel
    assert(d.mean_abs_e4 ==
      math.floor(2 * 40 * 5140 * 10000.0 / (120 * 2) + 0.5).toLong)
    assert(d.peak == 40 * 99)
    // negative samples count via |s|: constant -100 → mean 100, peak 100
    val neg = Multimodal.decodeAudioOne(8L,
      Multimodal.encodePcm16Wav(16000, 1, Array.fill[Short](50)(-100)))
    assert(neg.mean_abs_e4 == 100L * 10000 && neg.peak == 100)
  }

  test("WAV decode is allocation-true: truncation and lying sizes count " +
      "actual bytes, implausible fmt claims mark undecodable") {
    val frames = Array.tabulate[Short](100)(i => (10 * (i % 100)).toShort)
    val full = Multimodal.encodePcm16Wav(8000, 1, frames)
    // truncated mid-data: decoded frame count reflects what is PRESENT
    val cut = Multimodal.decodeAudioOne(1L, full.take(44 + 60))
    assert(cut.n_frames == 30L, s"got ${cut.n_frames}")
    // data-chunk size lying LARGE (claims 1 GiB): streaming decode ends at
    // the real payload end — no allocation at claimed size, counts actual
    val lying = full.clone()
    val big = 1 << 30
    lying(40) = big.toByte; lying(41) = (big >> 8).toByte
    lying(42) = (big >> 16).toByte; lying(43) = (big >> 24).toByte
    val ld = Multimodal.decodeAudioOne(2L, lying)
    assert(ld.n_frames == 100L, s"got ${ld.n_frames}")
    // not audio at all / truncated header → marker row
    assert(Multimodal.decodeAudioOne(3L, "words".getBytes("UTF-8")).peak == -1)
    assert(Multimodal.decodeAudioOne(4L, full.take(20)).peak == -1)
    // 8-bit PCM: out of scope → marker, not garbage stats
    val eight = {
      def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte,
        (v >> 24).toByte)
      def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
      "RIFF".getBytes("US-ASCII") ++ le32(36 + 4) ++
        "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
        le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8) ++
        "data".getBytes("US-ASCII") ++ le32(4) ++ Array[Byte](1, 2, 3, 4)
    }
    assert(Multimodal.decodeAudioOne(5L, eight).peak == -1)
  }

  test("MP4 box walk: tracks, duration, sample counts from the real tree") {
    val b = Multimodal.encodeMp4(600, 3000, Seq(100, 200))
    val m = Multimodal.parseMp4(b).get
    assert(m.nTracks == 2 && m.timescale == 600L &&
      m.durationTicks == 3000L && m.nSamples == 300L)
    // version-1 mvhd (64-bit duration): hand-patch version byte + layout
    val v1body = java.nio.ByteBuffer.allocate(112)
    v1body.put(1.toByte).put(Array[Byte](0, 0, 0)) // version 1 + flags
    v1body.putLong(0L).putLong(0L)                 // creation/modification
    v1body.putInt(90000).putLong(450000L)
    def box(tag: String, body: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + body.length)
      out.putInt(8 + body.length).put(tag.getBytes("US-ASCII")).put(body)
      out.array()
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"))
    val v1 = ftyp ++ box("moov", box("mvhd", v1body.array()))
    val mv1 = Multimodal.parseMp4(v1).get
    assert(mv1.timescale == 90000L && mv1.durationTicks == 450000L)
    // truncated v1 mvhd: body stops 28 bytes after the header — the u64
    // duration field would read through byte 31, past the payload end.
    // Must be SKIPPED (no timescale → None), never a throw or a read of
    // sibling bytes (the round-6 guard was off by 4 here).
    val v1cut = ftyp ++ box("moov", box("mvhd", v1body.array().take(28)))
    assert(Multimodal.parseMp4(v1cut).isEmpty)
    // same truncated mvhd followed by a sibling box: the field read must
    // stay bounded by the mvhd's OWN end (old code read the sibling's
    // header bytes as the duration); the valid v0 sibling then parses
    val v0body = java.nio.ByteBuffer.allocate(100)
    v0body.put(0.toByte).put(Array[Byte](0, 0, 0)).putInt(0).putInt(0)
    v0body.putInt(600).putInt(3000)
    val v1cutSib = ftyp ++ box("moov",
      box("mvhd", v1body.array().take(28)) ++ box("mvhd", v0body.array()))
    val msib = Multimodal.parseMp4(v1cutSib).get
    assert(msib.timescale == 600L && msib.durationTicks == 3000L)
    // malformed: the truncated moov box's claimed size overruns the
    // payload, stopping the walk before any mvhd → no timescale → None
    assert(Multimodal.parseMp4(b.take(40)).isEmpty)
    // non-MP4 refuses
    assert(Multimodal.parseMp4("RIFF".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.parseMp4(Array.emptyByteArray).isEmpty)
  }

  test("MP4 keyframes: stss entry counts sum per track; a track without " +
      "stss is all-sync (ISO-BMFF default)") {
    // no stss anywhere: every sample is a keyframe
    val allSync = Multimodal.parseMp4(
      Multimodal.encodeMp4(600, 3000, Seq(100, 200))).get
    assert(allSync.nKeyframes == 300L)
    // explicit tables on both tracks
    val tabled = Multimodal.parseMp4(Multimodal.encodeMp4(600, 3000,
      Seq(100, 200), Seq(Some(7), Some(11)))).get
    assert(tabled.nKeyframes == 18L && tabled.nSamples == 300L)
    // mixed: track 1 tabled, track 2 all-sync
    val mixed = Multimodal.parseMp4(Multimodal.encodeMp4(600, 3000,
      Seq(100, 200), Seq(Some(7), None))).get
    assert(mixed.nKeyframes == 207L)
  }

  test("claimedPixels reads what ImageIO would allocate (guard input)") {
    // GIF whose LOGICAL SCREEN is 1x1 but whose frame descriptor claims
    // 65535x65535 — the allocation happens per frame, so the guard must
    // see ~4.3e9, not 1 (a crafted bomb's exact shape)
    val gifFrameBomb = "GIF89a".getBytes("US-ASCII") ++
      Array(1, 0, 1, 0, 0, 0, 0).map(_.toByte) ++          // LSD 1x1, no GCT
      Array(0x2c, 0, 0, 0, 0).map(_.toByte) ++             // descriptor at 0,0
      Array(0xff, 0xff, 0xff, 0xff, 0).map(_.toByte)       // 65535x65535
    assert(graft.operators.Multimodal.claimedPixels(gifFrameBomb) ==
      65535L * 65535L)
    // extension blocks before the descriptor are walked, not mistaken for it
    val gifWithExt = "GIF89a".getBytes("US-ASCII") ++
      Array(1, 0, 1, 0, 0, 0, 0).map(_.toByte) ++
      Array(0x21, 0xf9, 4, 0, 0, 0, 0, 0).map(_.toByte) ++ // GCE sub-block
      Array(0x2c, 0, 0, 0, 0, 0x40, 0x9c, 0x40, 0x9c, 0).map(_.toByte)
    assert(graft.operators.Multimodal.claimedPixels(gifWithExt) ==
      40000L * 40000L)
    // OS/2 BITMAPCOREHEADER: size=12 at offset 14, u16 dims at 18/20 —
    // reading these as the info-header i32 layout yields a NEGATIVE width
    // that would slip past the guard
    val os2Bomb = "BM".getBytes("US-ASCII") ++ new Array[Byte](12) ++
      Array(12, 0, 0, 0, 0xff, 0xff, 0xff, 0xff, 1, 0, 8, 0).map(_.toByte)
    assert(graft.operators.Multimodal.claimedPixels(os2Bomb) ==
      65535L * 65535L)
    // honest small images stay small
    assert(graft.operators.Multimodal.claimedPixels(
      graft.operators.Multimodal.encodeGrayPng(7, 3, 1)) == 21L)
    assert(graft.operators.Multimodal.claimedPixels(
      "not an image".getBytes("UTF-8")) == 0L)
  }

  test("uniform gray survives the JPEG round trip exactly (all 256 levels, " +
      "partial-MCU dims) — the q94 oracle's load-bearing fact") {
    for (g <- 0 until 256) {
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        Multimodal.encodeJpegGray(13, 7, g)))
      for (y <- 0 until 7; x <- 0 until 13)
        assert(back.getRaster.getSample(x, y, 0) == g, s"gray $g at ($x,$y)")
    }
  }

  test("MJPEG-in-MP4: table walk finds every keyframe's bytes; decode " +
      "recovers exact per-frame grays") {
    val grays = Seq(10, 200, 55, 254, 0)
    // stss on samples 1, 3, 5 (1-based) → decoded grays 10 + 55 + 0
    val withSync = Multimodal.encodeMjpegMp4(600, 3000, 12, 9, grays,
      Some(Seq(1, 3, 5)))
    val r = Multimodal.decodeMjpegOne(1L, withSync)
    assert(r.n_samples == 5L && r.n_keyframes == 3L && r.n_decoded == 3L)
    assert(r.width == 12 && r.height == 9)
    assert(r.gray_sum_e4 == (10L + 55L + 0L) * 10000)
    // no stss → all five samples are keyframes (ISO-BMFF default)
    val allSync = Multimodal.decodeMjpegOne(2L,
      Multimodal.encodeMjpegMp4(600, 3000, 12, 9, grays, None))
    assert(allSync.n_keyframes == 5L && allSync.n_decoded == 5L)
    assert(allSync.gray_sum_e4 == grays.map(_.toLong).sum * 10000)
    // non-MP4 → marker row, never a throw
    val bad = Multimodal.decodeMjpegOne(3L, "not video".getBytes("UTF-8"))
    assert(bad == Multimodal.DecodedVideo(3L, -1L, -1L, -1L, 0, 0, -1L))
    // truncated mid-mdat: tables still parse (moov is after mdat... cut
    // BEFORE moov kills the walk → marker; cut INSIDE a sample keeps the
    // walk but the out-of-range keyframe is skipped, not thrown)
    val cutBeforeMoov = withSync.take(withSync.length / 4)
    assert(Multimodal.decodeMjpegOne(4L, cutBeforeMoov).n_samples == -1L)
    // a lying stsz count (larger than the mdat holds) must not throw:
    // unmappable samples skip
    val lying = withSync.clone()
    // stsz count field: find the stsz box and bump its sample_count
    val idx = {
      var i = -1
      for (k <- 0 until lying.length - 4 if i < 0)
        if (lying(k) == 's' && lying(k + 1) == 't' && lying(k + 2) == 's' &&
          lying(k + 3) == 'z') i = k
      i
    }
    lying(idx + 4 + 8 + 3) = 99.toByte // count low byte → 99 claimed samples
    val ld = Multimodal.decodeMjpegOne(5L, lying)
    assert(ld.n_samples <= 99L && ld.n_decoded == 3L) // real keyframes still decode
  }

  test("sampleOffsets: multi-chunk stsc runs and constant-size stsz") {
    // 2 chunks: chunk 1 carries 2 samples, chunk 2 carries the rest
    val t = Multimodal.Mp4Track(
      sizes = Array(10L, 20L, 30L, 40L),
      chunkOffsets = Array(100L, 500L),
      stsc = Array((1, 2), (2, 2)),
      syncs = None)
    assert(Multimodal.sampleOffsets(t).toSeq ==
      Seq(100L, 110L, 500L, 530L))
    // constant-size stsz (fixed != 0) has no table: parse synthesizes it
    val fixed = Multimodal.Mp4Track(Array(8L, 8L, 8L), Array(0L),
      Array((1, 3)), None)
    assert(Multimodal.sampleOffsets(fixed).toSeq == Seq(0L, 8L, 16L))
    // more chunks than samples / missing stsc entries degrade to -1s
    val sparse = Multimodal.Mp4Track(Array(5L, 5L), Array(0L, 50L),
      Array.empty, None)
    assert(Multimodal.sampleOffsets(sparse).toSeq == Seq(-1L, -1L))
  }
}
