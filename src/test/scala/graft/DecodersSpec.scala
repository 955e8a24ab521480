package graft

import graft.operators.{Decoders, Multimodal}
import graft.operators.Multimodal.MediaRecord

/** The formal codec seam (VERDICT r8 item 7): a fake external decoder wired
  * through [[Multimodal.decodeImages]] / [[Multimodal.decodeAudio]] /
  * [[Multimodal.audioEnergyWindows]] proves the swap-in point works without
  * touching operator code — the exact path an H.264/AAC JNI decoder takes.
  * The fakes stand in for a codec the JDK lacks: a private 'FIMG'/'FPCM'
  * container the default decoders reject (so the same payloads also pin the
  * marker-row behavior of the JDK path).
  */
class DecodersSpec extends SparkSpec {
  import spark.implicits._

  /** 'F','I','M','G', width u8, height u8, gray u8 — a format ImageIO has
    * never heard of, "decoded" to a uniform gray raster like a real codec
    * would hand back its RGB frame.
    */
  object FakeImageDecoder extends Decoders.ImageDecoder {
    override def decode(bytes: Array[Byte], maxPixels: Long)
        : Option[java.awt.image.BufferedImage] = {
      if (bytes.length < 7 || bytes(0) != 'F' || bytes(1) != 'I' ||
        bytes(2) != 'M' || bytes(3) != 'G') return None
      val (w, h, gray) = (bytes(4) & 0xff, bytes(5) & 0xff, bytes(6) & 0xff)
      if (w < 1 || h < 1 || w.toLong * h > maxPixels) return None // bomb contract
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = im.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { r.setSample(x, y, 0, gray); x += 1 }
        y += 1
      }
      Some(im)
    }
  }

  /** 'F','P','C','M', channels u8, rate u8 (Hz, small for the fixture),
    * then raw 16-bit LE interleaved samples — what an AAC decoder's PCM
    * output looks like at the seam.
    */
  object FakeAudioDecoder extends Decoders.AudioDecoder {
    override def decode(bytes: Array[Byte]): Option[Decoders.PcmStream] = {
      if (bytes.length < 6 || bytes(0) != 'F' || bytes(1) != 'P' ||
        bytes(2) != 'C' || bytes(3) != 'M') return None
      val (ch, rate) = (bytes(4) & 0xff, bytes(5) & 0xff)
      if (ch < 1 || rate < 1) return None
      Some(new Decoders.PcmStream(ch, rate,
        new java.io.ByteArrayInputStream(bytes, 6, bytes.length - 6)))
    }
  }

  private def fimg(w: Int, h: Int, gray: Int): Array[Byte] =
    Array[Byte]('F', 'I', 'M', 'G', w.toByte, h.toByte, gray.toByte)

  private def fpcm(ch: Int, rate: Int, samples: Array[Short]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(6 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('F'.toByte).put('P'.toByte).put('C'.toByte).put('M'.toByte)
      .put(ch.toByte).put(rate.toByte)
    samples.foreach(out.putShort)
    out.array()
  }

  test("fake image decoder plugs through decodeImages; JDK default rejects the same payload") {
    val recs = Seq(
      MediaRecord(1L, fimg(4, 3, 200), "image/fake"),
      MediaRecord(2L, fimg(200, 200, 7), "image/fake"),   // 40k px > maxPixels below
      MediaRecord(3L, "not an image".getBytes("UTF-8"), "text/plain"))
    val ds = spark.createDataset(recs).repartition(2)

    val viaFake = Multimodal.decodeImages(ds, batchSize = 2, maxPixels = 10000L,
      decoder = FakeImageDecoder).collect().sortBy(_.media_id)
    assert(viaFake(0) == Multimodal.DecodedImage(1L, 4, 3, 1, 200L * 10000))
    assert(viaFake(1) == Multimodal.DecodedImage(2L, 0, 0, 0, -1L)) // bomb → marker
    assert(viaFake(2) == Multimodal.DecodedImage(3L, 0, 0, 0, -1L))

    // same payloads through the DEFAULT decoder: all markers (unknown format)
    val viaJdk = Multimodal.decodeImages(ds).collect()
    assert(viaJdk.forall(_.mean_e4 == -1L))
    // and the default path still really decodes: PNG round trip unchanged
    val png = spark.createDataset(Seq(
      MediaRecord(9L, Multimodal.encodeGrayPng(5, 2, 77), "image/png")))
    assert(Multimodal.decodeImages(png).collect().head ==
      Multimodal.DecodedImage(9L, 5, 2, 1, 77L * 10000))
  }

  test("fake audio decoder plugs through decodeAudio and audioEnergyWindows") {
    // 2 channels, 10 Hz, 10 frames of |sample|=100 then 10 frames of 300
    val samples = (Array.fill[Short](20)(100) ++ Array.fill[Short](20)(-300))
    val recs = Seq(
      MediaRecord(1L, fpcm(2, 10, samples), "audio/fake"),
      MediaRecord(2L, "junk".getBytes("UTF-8"), "text/plain"))
    val ds = spark.createDataset(recs).repartition(2)

    val dec = Multimodal.decodeAudio(ds, decoder = FakeAudioDecoder)
      .collect().sortBy(_.media_id)
    // 20 frames at 10 Hz = 2 s; mean |sample| = (20*100 + 20*300)/40 = 200
    assert(dec(0) == Multimodal.DecodedAudio(1L, 2, 10, 20L, 20000L, 2000000L, 300))
    assert(dec(0).duration_e4 == 20000L)
    assert(dec(1).mean_abs_e4 == -1L) // non-FPCM → marker

    val win = Multimodal.audioEnergyWindows(ds, windowFrames = 10,
      silenceE4 = 150L * 10000, batchSize = 8, decoder = FakeAudioDecoder)
      .collect().sortBy(_.media_id)
    // two complete 10-frame windows: means 100e4 (silent) and 300e4 (loud)
    assert(win(0) == Multimodal.AudioWindows(1L, 2L, 1L, 1000000L, 3000000L))
    assert(win(1) == Multimodal.AudioWindows(2L, 0L, -1L, -1L, -1L))

    // same fake payload through the DEFAULT decoder: marker (not RIFF/WAVE)
    val viaJdk = Multimodal.decodeAudio(ds).collect()
    assert(viaJdk.forall(_.mean_abs_e4 == -1L))
    // default path still really decodes: WAV round trip unchanged
    val wav = spark.createDataset(Seq(MediaRecord(9L,
      Multimodal.encodePcm16Wav(8000, 1, Array.fill[Short](800)(50)), "audio/wav")))
    val d9 = Multimodal.decodeAudio(wav).collect().head
    assert(d9.n_frames == 800L && d9.mean_abs_e4 == 50L * 10000 && d9.peak == 50)
  }

  test("decoder contract: decode never throws for truncated payloads") {
    // every prefix of a valid FIMG/FPCM payload must yield None or decode
    val img = fimg(3, 3, 10)
    (0 to img.length).foreach { k =>
      FakeImageDecoder.decode(img.take(k), 1L << 20) // must not throw
    }
    val au = fpcm(1, 10, Array[Short](1, 2, 3))
    (0 to au.length).foreach { k => FakeAudioDecoder.decode(au.take(k)) }
    // and the JDK defaults hold the same contract on the same garbage
    (0 to img.length).foreach { k =>
      Decoders.JdkImageDecoder.decode(img.take(k), 1L << 20)
      Decoders.JdkWavDecoder.decode(img.take(k))
    }
  }
}
