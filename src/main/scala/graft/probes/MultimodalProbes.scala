package graft.probes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curation, Dedup, Multimodal, Similarity, TextStats}
import ProbeShared._

/** Multimodal probe family: binary payload plumbing, container
  * metadata, real image/audio/MP4/MJPEG decode round trips, resize, audio
  * energy windows, perceptual hash + near-dup.
  *
  * Split from the former monolithic ExtProbes (3.1 kLoC); aggregated and
  * re-exported by [[ExtProbes]] — registry keys, probe bodies, and oracle
  * SQL unchanged.
  */
object MultimodalProbes {
  // ---- q36 gradient-image decoded-pixel round trip (REAL decode) ---------
  // The former md5-marker decode stub, re-pointed at the production
  // decodeImages path (r9 verdict item 8). Payloads are DIAGONAL-GRADIENT
  // gray PNGs (pixel = base+x+y, all doc_id-derived): unlike q82's
  // uniform tiles, the decoded band-0 mean here is sensitive to raster
  // order, stride, and axis swaps — a decoder reading pixels in the wrong
  // order still matches a uniform mean but not a gradient's. Closed form:
  // sum = w·h·base + h·w(w−1)/2 + w·h(h−1)/2, which the oracle recomputes
  // from the synthesis arithmetic. 1/5 of payloads are raw text bytes
  // (the undecodable marker row).
  val q36: Q = (s, d) => {
    import s.implicits._
    val media = graft.core.Ops.widen(Tables.documents(s, d))
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        if (id % 5 == 0)
          graft.operators.Multimodal.MediaRecord(
            id, text.getBytes("UTF-8"), "text/plain")
        else
          graft.operators.Multimodal.MediaRecord(
            id,
            graft.operators.Multimodal.encodeGradientPng(
              (id % 31 + 1).toInt, (id % 23 + 1).toInt, (id % 200).toInt),
            "image/png")
      }
    graft.operators.Multimodal.decodeImages(media).toDF()
      .orderBy("media_id")
  }

  val q36Sql: String =
    """WITH g AS (SELECT doc_id, doc_id % 31 + 1 AS w, doc_id % 23 + 1 AS h,
      |  doc_id % 200 AS b FROM documents)
      |SELECT doc_id AS media_id,
      |  CAST(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE w END AS INTEGER) AS width,
      |  CAST(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE h END AS INTEGER) AS height,
      |  CAST(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 1 END AS INTEGER) AS bands,
      |  CAST(CASE WHEN doc_id % 5 = 0 THEN -1
      |    ELSE floor((w*h*b + h*((w-1)*w//2) + w*((h-1)*h//2)) * 10000.0
      |      / (w*h) + 0.5) END AS BIGINT) AS mean_e4
      |FROM g ORDER BY media_id""".stripMargin

  // ---- q80 media header metadata (real container parsing) ----------------
  // Multimodal.extractMeta / parseHeader: 4/5 of the payloads are REAL
  // PNG headers synthesized from (doc_id-derived) dimensions via
  // hex→unhex; 1/5 are raw text bytes (must degrade to 'unknown'). The
  // oracle never parses — it recomputes the expected metadata from the
  // same synthesis arithmetic, so a parser bug (endianness, offset) is a
  // hash mismatch, not a tautology.
  val q80: Q = (s, d) => {
    import s.implicits._
    val media = Tables.documents(s, d).selectExpr(
      "doc_id AS media_id",
      """CASE WHEN doc_id % 5 = 0 THEN CAST(text AS BINARY)
        |ELSE unhex(concat('89504E470D0A1A0A0000000D49484452',
        |  lpad(hex(doc_id % 509 + 1), 8, '0'),
        |  lpad(hex(doc_id % 251 + 1), 8, '0'),
        |  '0806000000')) END AS media""".stripMargin,
      "'application/octet-stream' AS mime")
      .as[graft.operators.Multimodal.MediaRecord]
    graft.operators.Multimodal.extractMeta(media).toDF()
      .orderBy("media_id")
  }

  val q80Sql: String =
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 5 = 0 THEN 'unknown' ELSE 'png' END AS kind,
      |  CAST(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE doc_id % 509 + 1 END
      |    AS INTEGER) AS width,
      |  CAST(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE doc_id % 251 + 1 END
      |    AS INTEGER) AS height,
      |  CAST(0 AS INTEGER) AS channels,
      |  CAST(0 AS INTEGER) AS sample_rate
      |FROM documents ORDER BY media_id""".stripMargin

  // ---- q82 decoded-pixel round trip (REAL ImageIO decode) ----------------
  // Multimodal.encodeGrayPng synthesizes true PNGs (uniform gray, dims and
  // gray level doc_id-derived); Multimodal.decodeImages decodes them with
  // javax.imageio and emits width/height/bands plus the band-0 MEAN over
  // the decoded raster. The oracle recomputes all four from the synthesis
  // arithmetic — dims alone could be faked from the header (q80's job);
  // the mean can only match if actual pixels were decoded. 1/5 of the
  // payloads are raw text bytes, pinning the undecodable marker row.
  /** q82's media synthesis — shared with the Scale tool's png_roundtrip
    * row, so scale measurements run the exact payload mix the probe pins
    * (every 5th doc raw text, the rest uniform-gray PNGs with
    * doc_id-derived dims/gray — the same constants the oracle recomputes).
    */
  def q82Media(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        if (id % 5 == 0)
          graft.operators.Multimodal.MediaRecord(
            id, text.getBytes("UTF-8"), "text/plain")
        else
          graft.operators.Multimodal.MediaRecord(
            id,
            graft.operators.Multimodal.encodeGrayPng(
              (id % 31 + 1).toInt, (id % 23 + 1).toInt, (id % 256).toInt),
            "image/png")
      }
  }

  val q82: Q = (s, d) => {
    val media = q82Media(graft.core.Ops.widen(Tables.documents(s, d)))
    graft.operators.Multimodal.decodeImages(media).toDF()
      .orderBy("media_id")
  }

  val q82Sql: String =
    """SELECT doc_id AS media_id,
      |  CAST(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE doc_id % 31 + 1 END
      |    AS INTEGER) AS width,
      |  CAST(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE doc_id % 23 + 1 END
      |    AS INTEGER) AS height,
      |  CAST(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 1 END AS INTEGER) AS bands,
      |  CAST(CASE WHEN doc_id % 5 = 0 THEN -1
      |       ELSE (doc_id % 256) * 10000 END AS BIGINT) AS mean_e4
      |FROM documents ORDER BY media_id""".stripMargin

  // ---- q84 decoded-sample audio round trip (REAL javax.sound decode) -----
  // Multimodal.encodePcm16Wav synthesizes true 16-bit PCM WAVs (rate /
  // channels / frame count / ramp amplitude all doc_id-derived);
  // Multimodal.decodeAudio decodes them with javax.sound.sampled and emits
  // format fields plus the MEAN |sample| and PEAK over the decoded PCM
  // stream. The oracle recomputes everything from the synthesis
  // arithmetic — rate/channels alone could be faked from the fmt header
  // (q80's job); mean and peak only match if actual samples were decoded.
  // Frame values are step·(i % 100), so sum_{i<n}(i%100) has the closed
  // form (n/100)·4950 + r(r−1)/2 with r = n mod 100 — SQL-expressible.
  // 1/5 of payloads are raw text bytes, pinning the undecodable marker.
  def q84Media(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      if (id % 5 == 0)
        graft.operators.Multimodal.MediaRecord(
          id, s"not audio: $id".getBytes("UTF-8"), "text/plain")
      else {
        val rate = (8000 + (id % 3) * 4000).toInt
        val ch = (1 + id % 2).toInt
        val n = (50 + id % 150).toInt
        val step = ((id % 7 + 1) * 40).toInt
        val frames = Array.tabulate[Short](n)(i => (step * (i % 100)).toShort)
        graft.operators.Multimodal.MediaRecord(
          id, graft.operators.Multimodal.encodePcm16Wav(rate, ch, frames),
          "audio/wav")
      }
    }
  }

  val q84: Q = (s, d) => {
    val media = q84Media(graft.core.Ops.widen(Tables.documents(s, d)))
    graft.operators.Multimodal.decodeAudio(media).toDF()
      .orderBy("media_id")
  }

  val q84Sql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN NULL
      |         ELSE 8000 + (doc_id % 3) * 4000 END AS rate,
      |    1 + doc_id % 2 AS ch,
      |    50 + doc_id % 150 AS n,
      |    (doc_id % 7 + 1) * 40 AS step
      |  FROM documents)
      |SELECT doc_id AS media_id,
      |  CAST(CASE WHEN rate IS NULL THEN 0 ELSE ch END AS INTEGER) AS channels,
      |  CAST(coalesce(rate, 0) AS INTEGER) AS sample_rate,
      |  CAST(CASE WHEN rate IS NULL THEN 0 ELSE n END AS BIGINT) AS n_frames,
      |  CAST(CASE WHEN rate IS NULL THEN -1
      |       ELSE floor(n * 10000.0 / rate + 0.5) END AS BIGINT) AS duration_e4,
      |  CAST(CASE WHEN rate IS NULL THEN -1
      |       ELSE floor((ch * step * ((n // 100) * 4950 +
      |              ((n % 100) * ((n % 100) - 1)) // 2)) * 10000.0
      |            / (n * ch) + 0.5) END AS BIGINT) AS mean_abs_e4,
      |  CAST(CASE WHEN rate IS NULL THEN -1
      |       ELSE step * (CASE WHEN n >= 100 THEN 99 ELSE n - 1 END)
      |       END AS INTEGER) AS peak
      |FROM p ORDER BY media_id""".stripMargin

  // ---- q85 MP4 container-walk round trip ---------------------------------
  // Multimodal.encodeMp4 synthesizes structurally-valid ISO-BMFF box trees
  // (track count / timescale / duration / per-track sample counts all
  // doc_id-derived); Multimodal.extractMp4Meta walks moov/trak/mdia/minf/
  // stbl/stsz for the metadata a curation pipeline filters video on. The
  // oracle recomputes from the synthesis arithmetic. 1/4 of payloads are
  // raw text bytes, pinning the non-MP4 marker row.
  def q85Media(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      if (id % 4 == 0)
        graft.operators.Multimodal.MediaRecord(
          id, s"not video: $id".getBytes("UTF-8"), "text/plain")
      else {
        val tracks = (1 + id % 3).toInt
        val tsc = (600 + (id % 5) * 100).toInt
        val dur = (1000 + id % 9000).toInt
        val per = (100 + id % 400).toInt
        // odd ids carry explicit sync tables (kf = 1 + per/4 per track);
        // even ids omit stss — all samples sync, the ISO-BMFF default
        val sync = if (id % 2 == 1) Some(1 + per / 4) else None
        graft.operators.Multimodal.MediaRecord(
          id, graft.operators.Multimodal.encodeMp4(
            tsc, dur, Seq.fill(tracks)(per), Seq.fill(tracks)(sync)),
          "video/mp4")
      }
    }
  }

  val q85: Q = (s, d) => {
    val media = q85Media(graft.core.Ops.widen(Tables.documents(s, d)))
    graft.operators.Multimodal.extractMp4Meta(media).toDF()
      .orderBy("media_id")
  }

  val q85Sql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 4 = 0 THEN NULL ELSE 1 + doc_id % 3 END AS tr,
      |    600 + (doc_id % 5) * 100 AS tsc,
      |    1000 + doc_id % 9000 AS dur,
      |    100 + doc_id % 400 AS per
      |  FROM documents)
      |SELECT doc_id AS media_id,
      |  CAST(coalesce(tr, 0) AS INTEGER) AS n_tracks,
      |  CAST(CASE WHEN tr IS NULL THEN 0 ELSE tsc END AS BIGINT) AS timescale,
      |  CAST(CASE WHEN tr IS NULL THEN -1
      |       ELSE floor(dur * 10000.0 / tsc + 0.5) END AS BIGINT) AS duration_e4,
      |  CAST(CASE WHEN tr IS NULL THEN -1 ELSE tr * per END AS BIGINT)
      |    AS n_samples,
      |  CAST(CASE WHEN tr IS NULL THEN -1
      |       WHEN doc_id % 2 = 1
      |         THEN tr * (1 + CAST(floor(per / 4.0) AS BIGINT))
      |       ELSE tr * per END AS BIGINT) AS n_keyframes
      |FROM p ORDER BY media_id""".stripMargin

  // ---- q94 MJPEG-in-MP4 decoded-keyframe round trip ----------------------
  // Multimodal.encodeMjpegMp4 synthesizes REAL video containers: one JPEG
  // per frame inside mdat, with true stsz/stsc/stco sample tables and
  // (for ids % 3 != 0) an stss keyframe table. decodeMjpegKeyframes walks
  // the tables to each keyframe's byte range and decodes THE PIXELS with
  // javax.imageio; the oracle recomputes keyframe counts and the decoded
  // gray sum from synthesis arithmetic (uniform tiles survive JPEG
  // exactly — spec-pinned). Table counts alone could be faked from the
  // walk (q85's job); gray_sum_e4 only matches if actual frame bytes were
  // located AND decoded. 1/4 of payloads are raw text → the marker row.
  def q94Media(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        if (id % 4 == 0)
          graft.operators.Multimodal.MediaRecord(
            id, text.getBytes("UTF-8"), "text/plain")
        else {
          val n = (3 + id % 5).toInt
          val grays = (0 until n).map(j => ((id * 7 + j * 13) % 256).toInt)
          // ids % 3 == 0: no stss → every sample sync; otherwise keyframes
          // at the odd 1-based sample numbers 1, 3, 5, …
          val sync =
            if (id % 3 == 0) None
            else Some((1 to n by 2).toSeq)
          graft.operators.Multimodal.MediaRecord(
            id, graft.operators.Multimodal.encodeMjpegMp4(
              600, 3000, (id % 13 + 2).toInt, (id % 11 + 2).toInt,
              grays, sync),
            "video/mp4")
        }
      }
  }

  val q94: Q = (s, d) => {
    val media = q94Media(graft.core.Ops.widen(Tables.documents(s, d)))
    graft.operators.Multimodal.decodeMjpegKeyframes(media).toDF()
      .orderBy("media_id")
  }

  val q94Sql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 4 = 0 THEN NULL
      |         ELSE CAST(3 + doc_id % 5 AS INTEGER) END AS n,
      |    CAST(doc_id % 13 + 2 AS INTEGER) AS w,
      |    CAST(doc_id % 11 + 2 AS INTEGER) AS h
      |  FROM documents),
      |k AS (SELECT doc_id, j FROM p, unnest(generate_series(1, n)) t(j)
      |  WHERE doc_id % 3 = 0 OR j % 2 = 1),
      |g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS kf,
      |    CAST(sum((doc_id * 7 + (j - 1) * 13) % 256) * 10000 AS BIGINT)
      |      AS gsum
      |  FROM k GROUP BY doc_id)
      |SELECT p.doc_id AS media_id,
      |  CAST(CASE WHEN n IS NULL THEN -1 ELSE n END AS BIGINT) AS n_samples,
      |  CAST(CASE WHEN n IS NULL THEN -1 ELSE g.kf END AS BIGINT)
      |    AS n_keyframes,
      |  CAST(CASE WHEN n IS NULL THEN -1 ELSE g.kf END AS BIGINT)
      |    AS n_decoded,
      |  CAST(CASE WHEN n IS NULL THEN 0 ELSE w END AS INTEGER) AS width,
      |  CAST(CASE WHEN n IS NULL THEN 0 ELSE h END AS INTEGER) AS height,
      |  CAST(CASE WHEN n IS NULL THEN -1 ELSE g.gsum END AS BIGINT)
      |    AS gray_sum_e4
      |FROM p LEFT JOIN g USING (doc_id) ORDER BY media_id""".stripMargin

  // ---- q101 box-average image resize (REAL decode + resample) -----------
  // Multimodal.encodeSplitGrayPng synthesizes two-tone PNGs (dims, split
  // column and both gray levels doc_id-derived — NON-uniform, so wrong box
  // boundaries change the answer); Multimodal.resizeImages decodes and
  // box-averages to a fixed 4x3 grid, summing the per-output-pixel e4
  // means. The oracle regenerates the full 4x3 box grid (floor boundaries,
  // >=1-px clamp) and the identical sum*10000.0/nbox+0.5 floor per pixel —
  // exact integers into identical double expressions, hash-equal. 1/5 of
  // payloads are raw text, pinning the undecodable marker row.
  def q101Media(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      if (id % 5 == 0)
        graft.operators.Multimodal.MediaRecord(
          id, s"not image: $id".getBytes("UTF-8"), "text/plain")
      else {
        val w = (id % 29 + 2).toInt
        val h = (id % 17 + 1).toInt
        graft.operators.Multimodal.MediaRecord(
          id,
          graft.operators.Multimodal.encodeSplitGrayPng(
            w, h, w / 2, (id % 256).toInt, ((id * 7 + 13) % 256).toInt),
          "image/png")
      }
    }
  }

  val q101: Q = (s, d) => {
    val media = q101Media(graft.core.Ops.widen(Tables.documents(s, d)))
    graft.operators.Multimodal.resizeImages(media, 4, 3).toDF()
      .orderBy("media_id")
  }

  val q101Sql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN NULL ELSE doc_id % 29 + 2 END AS w,
      |    doc_id % 17 + 1 AS h,
      |    (doc_id % 29 + 2) // 2 AS split,
      |    doc_id % 256 AS gl,
      |    (doc_id * 7 + 13) % 256 AS gr
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, w, h, split, gl, gr,
      |    (i.i * w) // 4 AS x0,
      |    least(w, greatest(((i.i + 1) * w) // 4, (i.i * w) // 4 + 1)) AS x1,
      |    (j.j * h) // 3 AS y0,
      |    least(h, greatest(((j.j + 1) * h) // 3, (j.j * h) // 3 + 1)) AS y1
      |  FROM p, range(4) i(i), range(3) j(j)
      |  WHERE w IS NOT NULL),
      |m AS (
      |  SELECT doc_id,
      |    CAST(floor((y1 - y0) * (gl * (least(x1, split) - least(x0, split)) +
      |        gr * ((x1 - x0) - (least(x1, split) - least(x0, split)))) * 10000.0
      |      / ((x1 - x0) * (y1 - y0)) + 0.5) AS BIGINT) AS e4
      |  FROM b),
      |a AS (SELECT doc_id, CAST(sum(e4) AS BIGINT) AS out_sum_e4
      |  FROM m GROUP BY doc_id)
      |SELECT p.doc_id AS media_id,
      |  CAST(coalesce(p.w, 0) AS INTEGER) AS width,
      |  CAST(CASE WHEN p.w IS NULL THEN 0 ELSE p.h END AS INTEGER) AS height,
      |  CAST(CASE WHEN p.w IS NULL THEN 0 ELSE 4 END AS INTEGER) AS out_w,
      |  CAST(CASE WHEN p.w IS NULL THEN 0 ELSE 3 END AS INTEGER) AS out_h,
      |  CAST(CASE WHEN p.w IS NULL THEN -1 ELSE a.out_sum_e4 END AS BIGINT)
      |    AS out_sum_e4
      |FROM p LEFT JOIN a ON p.doc_id = a.doc_id
      |ORDER BY media_id""".stripMargin

  // ---- q102 audio energy windows (silence gate over decoded PCM) --------
  // Reuses q84's WAV synthesis verbatim (ramp frames step*(i%100), rate /
  // channels / length doc_id-derived); Multimodal.audioEnergyWindows
  // decodes the PCM stream and scores 25-frame windows. Windows align to
  // 25-frame boundaries, so each window's frame-value sum has the closed
  // form 25*((k*25) % 100) + 300 — SQL-expressible; the oracle feeds it
  // through the identical winSum*10000.0/samplesPerWindow+0.5 floor.
  // Threshold 2000e4 makes window silence depend on BOTH k and step —
  // n_silent varies across docs. Text payloads pin the marker row.
  val q102: Q = (s, d) => {
    val media = q84Media(graft.core.Ops.widen(Tables.documents(s, d)))
    graft.operators.Multimodal
      .audioEnergyWindows(media, windowFrames = 25, silenceE4 = 20000000L)
      .toDF()
      .orderBy("media_id")
  }

  val q102Sql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN NULL ELSE 1 + doc_id % 2 END AS ch,
      |    50 + doc_id % 150 AS n,
      |    (doc_id % 7 + 1) * 40 AS step
      |  FROM documents),
      |w AS (
      |  SELECT doc_id,
      |    CAST(floor((ch * step * (25 * ((k.k * 25) % 100) + 300)) * 10000.0
      |      / (25 * ch) + 0.5) AS BIGINT) AS mean_e4
      |  FROM p, range(7) k(k)
      |  WHERE ch IS NOT NULL AND k.k < n // 25),
      |a AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
      |    CAST(sum(CASE WHEN mean_e4 < 20000000 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_silent,
      |    min(mean_e4) AS min_mean_e4, max(mean_e4) AS max_mean_e4
      |  FROM w GROUP BY doc_id)
      |SELECT p.doc_id AS media_id,
      |  CAST(CASE WHEN p.ch IS NULL THEN 0 ELSE a.n_windows END AS BIGINT)
      |    AS n_windows,
      |  CAST(CASE WHEN p.ch IS NULL THEN -1 ELSE a.n_silent END AS BIGINT)
      |    AS n_silent,
      |  CAST(CASE WHEN p.ch IS NULL THEN -1 ELSE a.min_mean_e4 END AS BIGINT)
      |    AS min_mean_e4,
      |  CAST(CASE WHEN p.ch IS NULL THEN -1 ELSE a.max_mean_e4 END AS BIGINT)
      |    AS max_mean_e4
      |FROM p LEFT JOIN a ON p.doc_id = a.doc_id
      |ORDER BY media_id""".stripMargin

  // ---- q103/q104 perceptual image hash + near-dup pairs ------------------
  // 16x16 PNGs with a per-pixel pseudo-random gray pattern (64 bits of
  // real hash entropy — two-tone tiles would collapse to a handful of
  // patterns and blow the pair join quadratic); docs with id % 7 == 3 are
  // PLANTED near-dups: the previous doc's pattern with one pixel nudged
  // (+9 at (0,0)), so their aHash sits within a few bits of the base's.
  // Each 8x8 aHash cell covers exactly 2x2 pixels, so the oracle's cell
  // mean is the closed form sum4*2500; bits compare cells against the
  // integer average of all 64 cells, packed with bit 63 as the BIGINT
  // sign (DuckDB 1<<63 overflows; the oracle adds Long.MinValue for that
  // bit instead). 1/5 raw-text payloads pin the -1 marker.
  def q103Media(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      if (id % 5 == 0)
        graft.operators.Multimodal.MediaRecord(
          id, s"not image: $id".getBytes("UTF-8"), "text/plain")
      else {
        val variant = id % 7 == 3
        val base = if (variant) id - 1 else id
        val px = Array.tabulate(256) { p =>
          val (x, y) = (p % 16, p / 16)
          val nudge = if (variant && x == 0 && y == 0) 9 else 0
          ((base * 31 + y * 16 + x * 17 + nudge) % 256).toInt
        }
        graft.operators.Multimodal.MediaRecord(
          id, graft.operators.Multimodal.encodeGrayPixelsPng(16, 16, px),
          "image/png")
      }
    }
  }

  /** The shared hash CTE: per-doc aHash recomputed from the synthesis
    * arithmetic (cell k = j*8+i means sum4*2500; integer-average
    * threshold; sign-bit packing).
    */
  private val aHashCte: String =
    """p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN NULL
      |         WHEN doc_id % 7 = 3 THEN doc_id - 1 ELSE doc_id END AS base,
      |    (doc_id % 7 = 3) AS isvar
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, j.j * 8 + i.i AS k,
      |    ((p.base * 31 + (j.j*2) * 16 + (i.i*2) * 17 +
      |        CASE WHEN p.isvar AND i.i = 0 AND j.j = 0 THEN 9 ELSE 0 END)
      |       % 256 +
      |     (p.base * 31 + (j.j*2) * 16 + (i.i*2+1) * 17) % 256 +
      |     (p.base * 31 + (j.j*2+1) * 16 + (i.i*2) * 17) % 256 +
      |     (p.base * 31 + (j.j*2+1) * 16 + (i.i*2+1) * 17) % 256) * 2500
      |      AS e4
      |  FROM p, range(8) i(i), range(8) j(j)
      |  WHERE p.base IS NOT NULL),
      |g2 AS (
      |  SELECT doc_id, k, e4,
      |    CAST(sum(e4) OVER (PARTITION BY doc_id) AS BIGINT) // 64 AS avg
      |  FROM g),
      |h AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN e4 > avg THEN
      |        CASE WHEN k = 63 THEN -9223372036854775808
      |             ELSE CAST(1 AS BIGINT) << CAST(k AS INTEGER) END
      |      ELSE 0 END) AS BIGINT) AS ahash
      |  FROM g2 GROUP BY doc_id)""".stripMargin

  val q103: Q = (s, d) => {
    val media = q103Media(graft.core.Ops.widen(Tables.documents(s, d)))
    graft.operators.Multimodal.imageAHash(media).toDF()
      .orderBy("media_id")
  }

  val q103Sql: String =
    s"""WITH $aHashCte
      |SELECT p.doc_id AS media_id,
      |  CAST(coalesce(h.ahash, -1) AS BIGINT) AS ahash
      |FROM p LEFT JOIN h ON p.doc_id = h.doc_id
      |ORDER BY media_id""".stripMargin

  val q104: Q = (s, d) => {
    val media = q103Media(graft.core.Ops.widen(Tables.documents(s, d)))
    graft.operators.Multimodal.imageNearDupPairs(media, 3)
      .orderBy("idA", "idB")
  }

  val q104Sql: String =
    s"""WITH $aHashCte
      |SELECT a.doc_id AS idA, b.doc_id AS idB,
      |  CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
      |FROM h a JOIN h b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
      |ORDER BY idA, idB""".stripMargin

  // ---- q146/q147 DCT perceptual hash (pHash) + near-dup pairs ------------
  // Multimodal.imagePHash over the q103 synthesis corpus: 16x16 source →
  // 32x32 box upscale (each box = ONE source pixel, mean = pixel·1e4 —
  // closed form), separable integer DCT against the e4 cosine table
  // EMBEDDED below as literals (PhashCosE4 — shared constants, the q27
  // minhash discipline: zero cross-engine double/cos parity relied on),
  // median-threshold over the 63 non-DC coefficients (32nd smallest),
  // sign-bit packing as in q103. The oracle replays every step from the
  // synthesis arithmetic — real decode + resample is what's proven.
  private val pHashCosLiterals: String =
    graft.operators.Multimodal.PhashCosE4.flatten.mkString(", ")

  /** Shared pHash CTE chain: synthesis params → 32×32 e4 grid → row/col
    * integer DCT passes → median threshold → packed hash.
    */
  private val pHashCte: String =
    s"""p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN NULL
      |         WHEN doc_id % 7 = 3 THEN doc_id - 1 ELSE doc_id END AS base,
      |    (doc_id % 7 = 3) AS isvar
      |  FROM documents),
      |ct AS (
      |  SELECT t.k // 32 AS k, t.k % 32 AS x,
      |    ([$pHashCosLiterals])[t.k + 1] AS c
      |  FROM range(256) t(k)),
      |g32 AS (
      |  SELECT doc_id, x.x AS x, y.y AS y,
      |    ((p.base * 31 + (y.y // 2) * 16 + (x.x // 2) * 17 +
      |        CASE WHEN p.isvar AND x.x // 2 = 0 AND y.y // 2 = 0
      |          THEN 9 ELSE 0 END) % 256) * 10000 AS e4
      |  FROM p, range(32) x(x), range(32) y(y)
      |  WHERE p.base IS NOT NULL),
      |rowp AS (
      |  SELECT g.doc_id, c.k AS u, g.y AS y,
      |    CAST(sum(g.e4 * c.c) AS BIGINT) AS a
      |  FROM g32 g JOIN ct c ON c.x = g.x GROUP BY 1, 2, 3),
      |coef AS (
      |  SELECT r.doc_id, c.k * 8 + r.u AS k,
      |    CAST(sum(r.a * c.c) AS BIGINT) AS f
      |  FROM rowp r JOIN ct c ON c.x = r.y GROUP BY 1, 2),
      |med AS (
      |  SELECT doc_id, f AS m FROM (
      |    SELECT doc_id, f,
      |      row_number() OVER (PARTITION BY doc_id ORDER BY f) AS rn
      |    FROM coef WHERE k > 0) WHERE rn = 32),
      |h AS (
      |  SELECT c.doc_id,
      |    CAST(sum(CASE WHEN c.k > 0 AND c.f > m.m THEN
      |        CASE WHEN c.k = 63 THEN -9223372036854775808
      |             ELSE CAST(1 AS BIGINT) << CAST(c.k AS INTEGER) END
      |      ELSE 0 END) AS BIGINT) AS phash
      |  FROM coef c JOIN med m USING (doc_id) GROUP BY c.doc_id)""".stripMargin

  val q146: Q = (s, d) => {
    val media = q103Media(graft.core.Ops.widen(Tables.documents(s, d)))
    graft.operators.Multimodal.imagePHash(media).toDF()
      .orderBy("media_id")
  }

  val q146Sql: String =
    s"""WITH $pHashCte
      |SELECT p.doc_id AS media_id,
      |  CAST(coalesce(h.phash, -1) AS BIGINT) AS phash
      |FROM p LEFT JOIN h ON p.doc_id = h.doc_id
      |ORDER BY media_id""".stripMargin

  val q147: Q = (s, d) => {
    val media = q103Media(graft.core.Ops.widen(Tables.documents(s, d)))
    graft.operators.Multimodal.imagePHashNearDupPairs(media, 3)
      .orderBy("idA", "idB")
  }

  val q147Sql: String =
    s"""WITH $pHashCte
      |SELECT a.doc_id AS idA, b.doc_id AS idB,
      |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
      |FROM h a JOIN h b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.phash, b.phash)) <= 3
      |ORDER BY idA, idB""".stripMargin

  // ---- family registry --------------------------------------------------

  // ---- q153 video near-dup (per-keyframe pHash + temporal agg) -----------
  // 3-keyframe MP4s whose samples are LOSSLESS PNGs (encodeSamplesMp4 —
  // ImageIO sniffs per sample), so each frame's pixels are closed-form in
  // (seed, frame) and the oracle replays decode → per-frame pHash (the
  // q146 DCT chain with a frame dimension) → frame-level hamming pairs
  // (brute force is exact: the band join is a verified superset) →
  // temporal aggregation (matched_a/matched_b, symmetric near-match
  // Jaccard sim_e4). Planted structure: id%7==3 = full re-encode of id−1
  // (frame 0 nudged one pixel → all 3 frames near-match, sim 1e4);
  // id%7==4 = shares exactly frame 0 with id−2 (sim 3333); id%5==0 =
  // text payload (marker, never pairs). doc_id < 200 bounds the oracle's
  // per-frame DCT replay.
  def q153Media(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      if (id % 5 == 0)
        graft.operators.Multimodal.MediaRecord(
          id, s"not video: $id".getBytes("UTF-8"), "text/plain")
      else {
        val isvar = id % 7 == 3
        val ispart = id % 7 == 4
        val base = if (isvar) id - 1 else id
        def frame(f: Int): Array[Byte] = {
          val seed = if (ispart && f == 0) id - 2 else base
          graft.operators.Multimodal.encodeGrayPixelsPng(16, 16,
            Array.tabulate(256) { p =>
              val (x, y) = (p % 16, p / 16)
              val nudge = if (isvar && f == 0 && x == 0 && y == 0) 9 else 0
              ((seed * 31 + f * 53 + y * 16 + x * 17 + nudge) % 256).toInt
            })
        }
        graft.operators.Multimodal.MediaRecord(id,
          graft.operators.Multimodal.encodeSamplesMp4(1000, 3000,
            (0 to 2).map(frame)), "video/mp4")
      }
    }
  }

  val q153: Q = (s, d) => {
    val media = q153Media(graft.core.Ops.widen(Tables.documents(s, d))
      .filter(col("doc_id") < 200))
    graft.operators.Multimodal.videoNearDupPairs(media, maxHamming = 3,
        nBands = 4, minSimE4 = 3000L)
      .orderBy("idA", "idB")
  }

  val q153Sql: String =
    s"""WITH cfg AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN NULL
      |         WHEN doc_id % 7 = 3 THEN doc_id - 1
      |         ELSE doc_id END AS base,
      |    (doc_id % 7 = 3) AS isvar,
      |    (doc_id % 7 = 4) AS ispart
      |  FROM documents WHERE doc_id < 200),
      |ct AS (
      |  SELECT t.k // 32 AS k, t.k % 32 AS x,
      |    ([$pHashCosLiterals])[t.k + 1] AS c
      |  FROM range(256) t(k)),
      |fr AS (
      |  SELECT doc_id, f.f AS f,
      |    CASE WHEN ispart AND f.f = 0 THEN doc_id - 2 ELSE base END AS seed,
      |    (isvar AND f.f = 0) AS nudged
      |  FROM cfg, range(3) f(f) WHERE base IS NOT NULL),
      |g32 AS (
      |  SELECT doc_id, f, x.x AS x, y.y AS y,
      |    ((seed * 31 + f * 53 + (y.y // 2) * 16 + (x.x // 2) * 17 +
      |        CASE WHEN nudged AND x.x // 2 = 0 AND y.y // 2 = 0
      |          THEN 9 ELSE 0 END) % 256) * 10000 AS e4
      |  FROM fr, range(32) x(x), range(32) y(y)),
      |rowp AS (
      |  SELECT g.doc_id, g.f, c.k AS u, g.y AS y,
      |    CAST(sum(g.e4 * c.c) AS BIGINT) AS a
      |  FROM g32 g JOIN ct c ON c.x = g.x GROUP BY 1, 2, 3, 4),
      |coef AS (
      |  SELECT r.doc_id, r.f, c.k * 8 + r.u AS k,
      |    CAST(sum(r.a * c.c) AS BIGINT) AS fc
      |  FROM rowp r JOIN ct c ON c.x = r.y GROUP BY 1, 2, 3),
      |med AS (
      |  SELECT doc_id, f, fc AS m FROM (
      |    SELECT doc_id, f, fc,
      |      row_number() OVER (PARTITION BY doc_id, f ORDER BY fc) AS rn
      |    FROM coef WHERE k > 0) WHERE rn = 32),
      |h AS (
      |  SELECT c.doc_id, c.f,
      |    CAST(sum(CASE WHEN c.k > 0 AND c.fc > m.m THEN
      |        CASE WHEN c.k = 63 THEN -9223372036854775808
      |             ELSE CAST(1 AS BIGINT) << CAST(c.k AS INTEGER) END
      |      ELSE 0 END) AS BIGINT) AS phash
      |  FROM coef c JOIN med m USING (doc_id, f) GROUP BY 1, 2),
      |fp AS (
      |  SELECT a.doc_id AS idA, a.f AS fiA, b.doc_id AS idB, b.f AS fiB
      |  FROM h a JOIN h b ON a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.phash, b.phash)) <= 3),
      |nf AS (SELECT doc_id, count(*) AS nf FROM h GROUP BY 1),
      |agg AS (
      |  SELECT idA, idB,
      |    CAST(count(DISTINCT fiA) AS BIGINT) AS matched_a,
      |    CAST(count(DISTINCT fiB) AS BIGINT) AS matched_b
      |  FROM fp GROUP BY 1, 2)
      |SELECT idA, idB, matched_a, matched_b,
      |  CAST(floor((matched_a + matched_b) * 10000.0 /
      |    (na.nf + nb.nf) + 0.5) AS BIGINT) AS sim_e4
      |FROM agg
      |JOIN nf na ON na.doc_id = agg.idA
      |JOIN nf nb ON nb.doc_id = agg.idB
      |WHERE floor((matched_a + matched_b) * 10000.0 /
      |  (na.nf + nb.nf) + 0.5) >= 3000
      |ORDER BY idA, idB""".stripMargin

  // ---- q158 audio fingerprint near-dup (banded energy-sequence hash) -----
  // Multimodal.audioNearDupPairs over synthesized WAVs: each doc is a
  // clip of (20 + id%8) 50-frame constant-valued windows, window values
  // md5-mixed per (src, w) — the r13 linear-fixture lesson: affine
  // patterns make every clip a phase shift of one cyclic sequence and
  // everything fingerprints equal. Planted: %6==0 docs gain a 2×-volume
  // re-encode (delta bits compare adjacent windows, so constant gain
  // flips no bit — match 10000 exactly), %6==1 docs a window-aligned
  // tail segment (same interior fp VALUES at shifted positions — the
  // value join finds them), %6==2 docs an undecodable text payload
  // (fingerprints to nothing, pinning the exclusion). The oracle
  // replays the whole arithmetic: window means = md5 values exactly
  // (constant windows), delta bits, k=8 packing, DISTINCT sets, DF cap,
  // symmetric Jaccard. Gain is modeled as a no-op — that IS the
  // operator's invariance claim, and the decode path is pinned by q84.
  def q158Media(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.filter(col("doc_id") < 60).select(col("doc_id")).as[Long]
      .flatMap { id =>
        def v(w: Int): Short = {
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(s"$id:$w".getBytes("UTF-8")).take(4)
            .map("%02x".format(_)).mkString
          ((java.lang.Long.parseLong(hex, 16) % 997L) + 1L).toShort
        }
        val nw = (20 + id % 8).toInt
        def rec(cid: Long, fw: Int, gain: Int) =
          graft.operators.Multimodal.MediaRecord(cid,
            graft.operators.Multimodal.encodePcm16Wav(8000, 1,
              Array.tabulate[Short]((nw - fw) * 50)(i =>
                (v(fw + i / 50) * gain).toShort)),
            "audio/wav")
        Seq(rec(id, 0, 1)) ++
          (if (id % 6 == 0) Seq(rec(id + 100000, 0, 2)) else Nil) ++
          (if (id % 6 == 1) Seq(rec(id + 200000, 4, 1)) else Nil) ++
          (if (id % 6 == 2) Seq(graft.operators.Multimodal.MediaRecord(
            id + 300000, s"not audio $id".getBytes("UTF-8"), "text/plain"))
          else Nil)
      }
  }

  val q158: Q = (s, d) => {
    val media = q158Media(graft.core.Ops.widen(Tables.documents(s, d)))
    graft.operators.Multimodal.audioNearDupPairs(media, windowFrames = 50,
      k = 8, stride = 1, minMatchE4 = 5000L).orderBy("idA", "idB")
  }

  val q158Sql: String =
    """WITH ids AS MATERIALIZED (
      |  SELECT doc_id AS id FROM documents WHERE doc_id < 60),
      |clips AS MATERIALIZED (
      |  SELECT id AS cid, id AS src, 0 AS fw, 20 + id % 8 AS nw FROM ids
      |  UNION ALL SELECT id + 100000, id, 0, 20 + id % 8 FROM ids
      |  WHERE id % 6 = 0
      |  UNION ALL SELECT id + 200000, id, 4, 20 + id % 8 FROM ids
      |  WHERE id % 6 = 1),
      |wm AS MATERIALIZED (SELECT cid, t.i AS w,
      |    ((('0x' || substring(md5(src::VARCHAR || ':'
      |      || (fw + t.i)::VARCHAR), 1, 8))::BIGINT % 997) + 1) AS v
      |  FROM clips, unnest(generate_series(0, nw - fw - 1)) t(i)),
      |bits AS MATERIALIZED (SELECT a.cid, a.w AS p,
      |    CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS b
      |  FROM wm a JOIN wm b ON b.cid = a.cid AND b.w = a.w + 1),
      |npos AS MATERIALIZED (SELECT cid, nw - fw - 1 AS nbits FROM clips),
      |pos AS MATERIALIZED (SELECT cid, t.i AS p0
      |  FROM npos, unnest(generate_series(0, nbits - 8)) t(i)),
      |fp AS MATERIALIZED (SELECT p.cid, p.p0,
      |    sum(b.b * (1::BIGINT << (7 - (b.p - p.p0)))) AS fp
      |  FROM pos p JOIN bits b ON b.cid = p.cid
      |    AND b.p >= p.p0 AND b.p <= p.p0 + 7
      |  GROUP BY p.cid, p.p0),
      |sets AS MATERIALIZED (SELECT DISTINCT cid, fp FROM fp),
      |sizes AS MATERIALIZED (SELECT cid, count(*) AS nfp
      |  FROM sets GROUP BY cid),
      |keep AS MATERIALIZED (SELECT fp FROM sets GROUP BY fp
      |  HAVING count(*) <= 1000),
      |fk AS MATERIALIZED (SELECT s.cid, s.fp FROM sets s JOIN keep USING (fp)),
      |inter AS MATERIALIZED (SELECT x.cid AS idA, y.cid AS idB,
      |    count(*) AS ninter
      |  FROM fk x JOIN fk y ON x.fp = y.fp AND x.cid < y.cid
      |  GROUP BY 1, 2),
      |j AS (SELECT idA, idB,
      |    CAST(floor(ninter * 1.0 / (a.nfp + b.nfp - ninter) * 10000 + 0.5)
      |      AS BIGINT) AS match_e4
      |  FROM inter JOIN sizes a ON a.cid = idA JOIN sizes b ON b.cid = idB)
      |SELECT idA, idB, match_e4 FROM j WHERE match_e4 >= 5000
      |ORDER BY idA, idB""".stripMargin

  // ---- q159 semantic image dedup (block-mean embedding → SemDeDup) ------
  // Multimodal.imageSemDedupVictims over 16×16 synthesized grays: 9
  // orthogonal plane-wave scenes × 3 re-grains (fresh ±20 md5 noise per
  // image id) — the regime a thresholded bit hash misses (pHash flips >3
  // bits on a re-grain; ImageSemDedupSpec pins recall 0 there) but the
  // centered block-mean embedding catches (noise averages down inside
  // 2×2 blocks, scenes are orthogonal waves). The wave table is shared
  // integer literals (the PhashCosE4 discipline); the oracle replays
  // pixels → 8×8 block means (sum·2500, exact) → mean-center (÷64,
  // binary-exact) → the q133 IVF assignment/verify/components chain.
  // doc_ids 27..31 carry text payloads: no embedding row, never a victim.
  private def q159Wave(f: Int, x: Int): Int =
    math.round(10.0 * math.cos(math.Pi * 2 * f * x / 16)).toInt

  def q159Media(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.filter(col("doc_id") < 32).select(col("doc_id")).as[Long]
      .map { id =>
        if (id >= 27)
          graft.operators.Multimodal.MediaRecord(
            id, s"not an image: $id".getBytes("UTF-8"), "text/plain")
        else {
          val pat = (id % 9).toInt
          val (fx, fy) = (pat % 3 + 1, (pat / 3) % 3 + 1)
          def noise(x: Int, y: Int): Int = {
            val hex = java.security.MessageDigest.getInstance("MD5")
              .digest(s"$id:$x:$y".getBytes("UTF-8")).take(4)
              .map("%02x".format(_)).mkString
            (java.lang.Long.parseLong(hex, 16) % 41L).toInt - 20
          }
          graft.operators.Multimodal.MediaRecord(id,
            graft.operators.Multimodal.encodeGrayPixelsPng(16, 16,
              Array.tabulate(256) { p =>
                val (x, y) = (p % 16, p / 16)
                128 + q159Wave(fx, x) * q159Wave(fy, y) + noise(x, y)
              }),
            "image/png")
        }
      }
  }

  val q159: Q = (s, d) => {
    val media = q159Media(graft.core.Ops.widen(Tables.documents(s, d)))
    graft.operators.Multimodal.imageSemDedupVictims(media, grid = 8,
        thresholdE4 = 9000L, centroidEvery = 4)
      .orderBy("id")
  }

  val q159Sql: String = {
    val waveLits = (1 to 3).flatMap(f =>
      (0 until 16).map(x => q159Wave(f, x))).mkString(", ")
    val cos = graft.operators.Similarity.cosineDuckSql("a.v", "b.v")
    s"""WITH RECURSIVE
       |ids AS MATERIALIZED (
       |  SELECT doc_id AS id FROM documents WHERE doc_id < 27),
       |wave AS MATERIALIZED (
       |  SELECT t.i // 16 + 1 AS f, t.i % 16 AS x,
       |    ([$waveLits])[t.i + 1] AS c
       |  FROM range(48) t(i)),
       |px AS MATERIALIZED (
       |  SELECT i.id, x.x AS x, y.y AS y,
       |    128 + wx.c * wy.c
       |      + (('0x' || substr(md5(i.id::VARCHAR || ':' || x.x::VARCHAR
       |          || ':' || y.y::VARCHAR), 1, 8))::BIGINT % 41 - 20) AS p
       |  FROM ids i
       |  CROSS JOIN range(16) x(x)
       |  CROSS JOIN range(16) y(y)
       |  JOIN wave wx ON wx.f = (i.id % 9) % 3 + 1 AND wx.x = x.x
       |  JOIN wave wy ON wy.f = ((i.id % 9) // 3) % 3 + 1 AND wy.x = y.y),
       |g AS MATERIALIZED (
       |  SELECT id, (y // 2) * 8 + (x // 2) AS pos,
       |    CAST(sum(p) * 2500 AS BIGINT) AS e4
       |  FROM px GROUP BY 1, 2),
       |mu AS MATERIALIZED (SELECT id, sum(e4) / 64.0 AS m
       |  FROM g GROUP BY id),
       |v0 AS MATERIALIZED (
       |  SELECT g.id, list(CAST(g.e4 AS DOUBLE) - mu.m ORDER BY g.pos) AS v
       |  FROM g JOIN mu USING (id) GROUP BY g.id, mu.m),
       |v AS MATERIALIZED (SELECT id, v FROM v0
       |  WHERE list_dot_product(v, v) > 0),
       |cent AS MATERIALIZED (SELECT id AS cid, v AS cv FROM v
       |  WHERE ('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT % 4 = 0),
       |assigned AS MATERIALIZED (
       |  SELECT id, v, cid FROM (
       |    SELECT v.id, v.v, c.cid,
       |      row_number() OVER (PARTITION BY v.id
       |        ORDER BY ${graft.operators.Similarity
                  .cosineDuckSql("v.v", "c.cv")} DESC, c.cid ASC) AS rn
       |    FROM v CROSS JOIN cent c) t(id, v, cid, rn)
       |  WHERE rn <= 2),
       |p AS MATERIALIZED (
       |  SELECT DISTINCT a.id AS idA, b.id AS idB
       |  FROM assigned a JOIN assigned b USING (cid)
       |  WHERE a.id < b.id AND $cos >= 0.9),
       |undirected AS (
       |  SELECT idA AS src, idB AS dst FROM p
       |  UNION ALL SELECT idB, idA FROM p),
       |nodes AS (SELECT DISTINCT src AS id FROM undirected),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT u.src, reach.r FROM undirected u
       |  JOIN reach ON reach.id = u.dst),
       |lab AS (SELECT id, CAST(min(r) AS BIGINT) AS label
       |  FROM reach GROUP BY id)
       |SELECT CAST(id AS BIGINT) AS id, label AS kept_id FROM lab
       |WHERE id <> label ORDER BY id""".stripMargin
  }

  // ---- q160 image increment vs persisted pHash + exact state -------------
  // Increment.curateImageIncrement twice over (b1 bootstraps the state,
  // b2 runs against it, then b2 RERUNS under the same batch id — the
  // q157 idempotence-through-the-oracle discipline). Images are the q146
  // linear 16×16 grays parametrized by (seed, v): v=1 nudges source
  // pixel (0,0) by +9 — the q147 planted near-dup transform. Exact
  // payload equality ⟺ identical (seed, v) (deterministic encoder over
  // param-determined pixels); near-dup is the exact pigeonhole hamming
  // ≤ 3, which the oracle replays as brute-force hamming over the
  // replayed pHash chain (the verified superset). Planted per src id:
  // %6==0 exact-within-b1, %6==1 near-within-b1 (whose b2 echo +900
  // then near-dups the STATE canonical — its exact key never entered
  // state because the b1 variant was rejected), %6==2 exact-vs-state
  // plus an undecodable, %6==3 near-vs-state, %6==4 a within-b2 near
  // pair, %6==5 fresh.
  def q160Media(docs: org.apache.spark.sql.DataFrame, batch: String)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    def im(cid: Long, seed: Long, v: Int) =
      graft.operators.Multimodal.MediaRecord(cid,
        graft.operators.Multimodal.encodeGrayPixelsPng(16, 16,
          Array.tabulate(256) { p =>
            val (x, y) = (p % 16, p / 16)
            ((seed * 31 + y * 16 + x * 17 +
              (if (v == 1 && x == 0 && y == 0) 9 else 0)) % 256).toInt
          }),
        "image/png")
    docs.filter(col("doc_id") < 24).select(col("doc_id")).as[Long]
      .flatMap { id =>
        if (batch == "b1")
          Seq(im(id, id, 0)) ++
            (if (id % 6 == 0) Seq(im(id + 100, id, 0)) else Nil) ++
            (if (id % 6 == 1) Seq(im(id + 200, id, 1)) else Nil) ++
            (if (id % 6 == 2) Seq(graft.operators.Multimodal.MediaRecord(
              id + 800, s"not an image $id".getBytes("UTF-8"),
              "text/plain")) else Nil)
        else
          (if (id % 6 == 2) Seq(im(id + 300, id, 0)) else Nil) ++
            (if (id % 6 == 3) Seq(im(id + 400, id, 1)) else Nil) ++
            (if (id % 6 == 1) Seq(im(id + 900, id, 1)) else Nil) ++
            (if (id % 6 == 4) Seq(im(id + 500, id + 1000, 0),
              im(id + 600, id + 1000, 1)) else Nil) ++
            (if (id % 6 == 5) Seq(im(id + 700, id + 2000, 0)) else Nil)
      }
  }

  val q160: Q = (s, d) => {
    import graft.pipeline.Increment
    val docs = graft.core.Ops.widen(Tables.documents(s, d))
    val fp = dataFingerprint(
      docs.filter(col("doc_id") < 24).select(col("doc_id")))
    memoizedReplay(s, "q160", d, fp) {
      val dir = scratchDir("graft_q160_state")
      Increment.curateImageIncrement(q160Media(docs, "b1"), dir, "b1")
      Increment.curateImageIncrement(q160Media(docs, "b2"), dir, "b2")
      Increment.curateImageIncrement(q160Media(docs, "b2"), dir, "b2")
      Increment.readLedger(s, dir)
        .select(col("batch_id"), col("id"), col("admitted"),
          col("reason"), col("dup_of"))
        .orderBy("batch_id", "id")
    }
  }

  /** The q160 oracle, with the first round's batch label parametric:
    * q160 labels it "b1" (a bootstrap increment); q178 labels it "base"
    * (the image re-curation's funnel verdicts persisted under the
    * rebuilt root) — the ALGEBRA is identical, which is exactly the
    * funnel≡bootstrap-increment parity the probe pair pins.
    */
  private def q160SqlWith(round1Label: String): String = {
    def replay(t: String, bt: String, st: String): String =
      s"""${t}_ex_st AS MATERIALIZED (SELECT c.cid, min(sc.cid) AS dup_of
         |  FROM clips c JOIN clips sc ON sc.seed = c.seed AND sc.v = c.v
         |  WHERE c.cid IN (SELECT cid FROM $bt)
         |    AND sc.cid IN (SELECT cid FROM $st)
         |  GROUP BY c.cid),
         |${t}_p1 AS MATERIALIZED (SELECT cid FROM $bt
         |  WHERE cid NOT IN (SELECT cid FROM ${t}_ex_st)),
         |${t}_keep AS MATERIALIZED (SELECT seed, v, min(cid) AS keep
         |  FROM clips WHERE cid IN (SELECT cid FROM ${t}_p1)
         |  GROUP BY seed, v),
         |${t}_ex_in AS MATERIALIZED (SELECT c.cid, k.keep AS dup_of
         |  FROM clips c JOIN ${t}_keep k
         |    ON k.seed = c.seed AND k.v = c.v
         |  WHERE c.cid IN (SELECT cid FROM ${t}_p1) AND c.cid <> k.keep),
         |${t}_p2 AS MATERIALIZED (SELECT cid FROM ${t}_p1
         |  WHERE cid NOT IN (SELECT cid FROM ${t}_ex_in)),
         |${t}_nd_st AS MATERIALIZED (
         |  SELECT a.cid, min(b.cid) AS dup_of
         |  FROM h a JOIN h b
         |    ON bit_count(xor(a.phash, b.phash)) <= 3
         |  WHERE a.cid IN (SELECT cid FROM ${t}_p2)
         |    AND b.cid IN (SELECT cid FROM $st)
         |  GROUP BY a.cid),
         |${t}_p3 AS MATERIALIZED (SELECT cid FROM ${t}_p2
         |  WHERE cid NOT IN (SELECT cid FROM ${t}_nd_st)),
         |${t}_edges AS MATERIALIZED (
         |  SELECT a.cid AS src, b.cid AS dst
         |  FROM h a JOIN h b ON a.cid < b.cid
         |    AND bit_count(xor(a.phash, b.phash)) <= 3
         |  WHERE a.cid IN (SELECT cid FROM ${t}_p3)
         |    AND b.cid IN (SELECT cid FROM ${t}_p3)),
         |${t}_und AS (SELECT src, dst FROM ${t}_edges
         |  UNION ALL SELECT dst, src FROM ${t}_edges),
         |${t}_reach(id, r) AS (
         |  SELECT src, src FROM ${t}_und
         |  UNION
         |  SELECT u.src, ${t}_reach.r FROM ${t}_und u
         |  JOIN ${t}_reach ON ${t}_reach.id = u.dst),
         |${t}_nd_in AS (SELECT id AS cid, min(r) AS dup_of
         |  FROM ${t}_reach GROUP BY id HAVING id <> min(r)),
         |${t}_adm AS MATERIALIZED (SELECT cid FROM ${t}_p3
         |  WHERE cid NOT IN (SELECT cid FROM ${t}_nd_in))""".stripMargin
    def verdicts(t: String, b: String, undec: String): String =
      s"""  SELECT '$b' AS batch_id, cid AS id, FALSE AS admitted,
         |    'undecodable' AS reason, cid AS dup_of FROM $undec
         |  UNION ALL SELECT '$b', cid, FALSE, 'exact_dup', dup_of
         |  FROM ${t}_ex_st
         |  UNION ALL SELECT '$b', cid, FALSE, 'exact_dup', dup_of
         |  FROM ${t}_ex_in
         |  UNION ALL SELECT '$b', cid, FALSE, 'near_dup', dup_of
         |  FROM ${t}_nd_st
         |  UNION ALL SELECT '$b', cid, FALSE, 'near_dup', dup_of
         |  FROM ${t}_nd_in
         |  UNION ALL SELECT '$b', cid, TRUE, 'admitted', cid
         |  FROM ${t}_adm""".stripMargin
    s"""WITH RECURSIVE
       |ids AS MATERIALIZED (
       |  SELECT doc_id AS id FROM documents WHERE doc_id < 24),
       |clips AS MATERIALIZED (
       |  SELECT id AS cid, id AS seed, 0 AS v, 'b1' AS b FROM ids
       |  UNION ALL SELECT id + 100, id, 0, 'b1' FROM ids WHERE id % 6 = 0
       |  UNION ALL SELECT id + 200, id, 1, 'b1' FROM ids WHERE id % 6 = 1
       |  UNION ALL SELECT id + 300, id, 0, 'b2' FROM ids WHERE id % 6 = 2
       |  UNION ALL SELECT id + 400, id, 1, 'b2' FROM ids WHERE id % 6 = 3
       |  UNION ALL SELECT id + 900, id, 1, 'b2' FROM ids WHERE id % 6 = 1
       |  UNION ALL SELECT id + 500, id + 1000, 0, 'b2' FROM ids
       |  WHERE id % 6 = 4
       |  UNION ALL SELECT id + 600, id + 1000, 1, 'b2' FROM ids
       |  WHERE id % 6 = 4
       |  UNION ALL SELECT id + 700, id + 2000, 0, 'b2' FROM ids
       |  WHERE id % 6 = 5),
       |undec1 AS MATERIALIZED (SELECT id + 800 AS cid FROM ids
       |  WHERE id % 6 = 2),
       |undec2 AS MATERIALIZED (SELECT cid FROM clips WHERE FALSE),
       |ct AS MATERIALIZED (
       |  SELECT t.k // 32 AS k, t.k % 32 AS x,
       |    ([$pHashCosLiterals])[t.k + 1] AS c
       |  FROM range(256) t(k)),
       |g32 AS MATERIALIZED (
       |  SELECT cid, x.x AS x, y.y AS y,
       |    ((seed * 31 + (y.y // 2) * 16 + (x.x // 2) * 17 +
       |        CASE WHEN v = 1 AND x.x // 2 = 0 AND y.y // 2 = 0
       |          THEN 9 ELSE 0 END) % 256) * 10000 AS e4
       |  FROM clips CROSS JOIN range(32) x(x) CROSS JOIN range(32) y(y)),
       |rowp AS MATERIALIZED (
       |  SELECT g.cid, c.k AS u, g.y AS y,
       |    CAST(sum(g.e4 * c.c) AS BIGINT) AS a
       |  FROM g32 g JOIN ct c ON c.x = g.x GROUP BY 1, 2, 3),
       |coef AS MATERIALIZED (
       |  SELECT r.cid, c.k * 8 + r.u AS k,
       |    CAST(sum(r.a * c.c) AS BIGINT) AS f
       |  FROM rowp r JOIN ct c ON c.x = r.y GROUP BY 1, 2),
       |med AS MATERIALIZED (
       |  SELECT cid, f AS m FROM (
       |    SELECT cid, f,
       |      row_number() OVER (PARTITION BY cid ORDER BY f) AS rn
       |    FROM coef WHERE k > 0) WHERE rn = 32),
       |h AS MATERIALIZED (
       |  SELECT c.cid,
       |    CAST(sum(CASE WHEN c.k > 0 AND c.f > m.m THEN
       |        CASE WHEN c.k = 63 THEN -9223372036854775808
       |             ELSE CAST(1 AS BIGINT) << CAST(c.k AS INTEGER) END
       |      ELSE 0 END) AS BIGINT) AS phash
       |  FROM coef c JOIN med m USING (cid) GROUP BY c.cid),
       |bt1 AS MATERIALIZED (SELECT cid FROM clips WHERE b = 'b1'),
       |bt2 AS MATERIALIZED (SELECT cid FROM clips WHERE b = 'b2'),
       |s0 AS MATERIALIZED (SELECT cid FROM clips WHERE FALSE),
       |${replay("r1", "bt1", "s0")},
       |s1 AS MATERIALIZED (SELECT cid FROM r1_adm),
       |${replay("r2", "bt2", "s1")},
       |out AS (
       |${verdicts("r1", round1Label, "undec1")}
       |  UNION ALL
       |${verdicts("r2", "b2", "undec2")})
       |SELECT batch_id, CAST(id AS BIGINT) AS id, admitted, reason,
       |  CAST(dup_of AS BIGINT) AS dup_of
       |FROM out ORDER BY batch_id, id""".stripMargin
  }

  val q160Sql: String = q160SqlWith("b1")

  // ---- q178 image re-curation → versioned root → increment ---------------
  // Recurate.runImage end-to-end (r17 verdict #2): the CurateImages
  // funnel over the accumulated raw media pool (q160's b1 cases — the
  // planted exact/near dups and the undecodable), state rebuilt from
  // the admitted survivors into a versioned root (pHash index + exact
  // keys under batch `base`) and swapped through the commit-marker
  // pointer, then ONE image increment served from the RESOLVED root
  // (q160's b2 cases: exact-vs-state, near-vs-state, the state-
  // canonical echo, within-batch pair, fresh), then the increment
  // RERUN under its batch id (the q157/q160 idempotence discipline).
  // Output: the published root's ledger — batch `base` (the funnel's
  // verdicts) plus `b2`. The oracle is q160's replay with the first
  // round labeled `base`: the funnel and a bootstrap increment share
  // one algebra, and this probe pair pins that parity through the
  // oracle.
  val q178: Q = (s, d) => {
    import graft.pipeline.{Increment, Recurate, Restore}
    val docs = graft.core.Ops.widen(Tables.documents(s, d))
    val fp = dataFingerprint(
      docs.filter(col("doc_id") < 24).select(col("doc_id")))
    memoizedReplay(s, "q178", d, fp) {
      val wh = scratchDir("graft_q178_wh")
      val r = Recurate.runImage(s, wh, "imgstate", "t1",
        q160Media(docs, "b1"))
      val root = Restore.resolveVersioned(s, wh, "imgstate").get.toString
      require(root == r.versionDir, s"pointer $root != ${r.versionDir}")
      Increment.curateImageIncrement(q160Media(docs, "b2"), root, "b2")
      Increment.curateImageIncrement(q160Media(docs, "b2"), root, "b2")
      Increment.readLedger(s, root)
        .select(col("batch_id"), col("id"), col("admitted"),
          col("reason"), col("dup_of"))
        .orderBy("batch_id", "id")
    }
  }

  val q178Sql: String = q160SqlWith("base")

  // ---- q161 video increment vs persisted keyframe + exact state ----------
  // Increment.curateVideoIncrement twice over (b1 bootstraps the state,
  // b2 runs against it, then b2 RERUNS under the same batch id — the
  // q157/q160 idempotence-through-the-oracle discipline). Videos are the
  // q153 3-keyframe MP4s with lossless PNG samples: frame f of clip
  // (seed, v) has pixel (x,y) = (seed*31 + f*53 + y*16 + x*17 + nudge)
  // % 256, nudge = 9 at (0,0) of frame 0 when v = 1 — frame 0 then
  // near-matches (hamming <= 3) while frames 1..2 stay exact, so a
  // (seed,0)/(seed,1) pair temporal-Jaccards at 1e4 >= the 5000 gate.
  // Exact payload equality <=> identical (seed, v) (deterministic
  // encoder over param-determined pixels). The oracle replays the q153
  // per-frame pHash chain, aggregates brute-force frame pairs into the
  // symmetric near-match Jaccard (exact: the band join is a verified
  // superset), and replays the funnel per batch. Planted per src id:
  // %6==0 exact-within-b1, %6==1 near-within-b1 (whose b2 echo +900
  // then near-dups the STATE canonical — its exact key never entered
  // state because the b1 variant was rejected), %6==2 exact-vs-state
  // plus an unparseable payload (no_frames), %6==3 near-vs-state,
  // %6==4 a within-b2 near pair, %6==5 fresh.
  def q161Media(docs: org.apache.spark.sql.DataFrame, batch: String)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    def vid(cid: Long, seed: Long, v: Int) =
      graft.operators.Multimodal.MediaRecord(cid,
        graft.operators.Multimodal.encodeSamplesMp4(1000, 3000,
          (0 to 2).map(f => graft.operators.Multimodal.encodeGrayPixelsPng(
            16, 16, Array.tabulate(256) { p =>
              val (x, y) = (p % 16, p / 16)
              val nudge = if (v == 1 && f == 0 && x == 0 && y == 0) 9 else 0
              ((seed * 31 + f * 53 + y * 16 + x * 17 + nudge) % 256).toInt
            }))),
        "video/mp4")
    docs.filter(col("doc_id") < 24).select(col("doc_id")).as[Long]
      .flatMap { id =>
        if (batch == "b1")
          Seq(vid(id, id, 0)) ++
            (if (id % 6 == 0) Seq(vid(id + 100, id, 0)) else Nil) ++
            (if (id % 6 == 1) Seq(vid(id + 200, id, 1)) else Nil) ++
            (if (id % 6 == 2) Seq(graft.operators.Multimodal.MediaRecord(
              id + 800, s"not a video $id".getBytes("UTF-8"),
              "text/plain")) else Nil)
        else
          (if (id % 6 == 2) Seq(vid(id + 300, id, 0)) else Nil) ++
            (if (id % 6 == 3) Seq(vid(id + 400, id, 1)) else Nil) ++
            (if (id % 6 == 1) Seq(vid(id + 900, id, 1)) else Nil) ++
            (if (id % 6 == 4) Seq(vid(id + 500, id + 1000, 0),
              vid(id + 600, id + 1000, 1)) else Nil) ++
            (if (id % 6 == 5) Seq(vid(id + 700, id + 2000, 0)) else Nil)
      }
  }

  val q161: Q = (s, d) => {
    import graft.pipeline.Increment
    val docs = graft.core.Ops.widen(Tables.documents(s, d))
    val fp = dataFingerprint(
      docs.filter(col("doc_id") < 24).select(col("doc_id")))
    memoizedReplay(s, "q161", d, fp) {
      val dir = scratchDir("graft_q161_state")
      Increment.curateVideoIncrement(q161Media(docs, "b1"), dir, "b1")
      Increment.curateVideoIncrement(q161Media(docs, "b2"), dir, "b2")
      Increment.curateVideoIncrement(q161Media(docs, "b2"), dir, "b2")
      Increment.readLedger(s, dir)
        .select(col("batch_id"), col("id"), col("admitted"),
          col("reason"), col("dup_of"))
        .orderBy("batch_id", "id")
    }
  }

  val q161Sql: String = {
    def replay(t: String, bt: String, st: String): String =
      s"""${t}_ex_st AS MATERIALIZED (SELECT c.cid, min(sc.cid) AS dup_of
         |  FROM clips c JOIN clips sc ON sc.seed = c.seed AND sc.v = c.v
         |  WHERE c.cid IN (SELECT cid FROM $bt)
         |    AND sc.cid IN (SELECT cid FROM $st)
         |  GROUP BY c.cid),
         |${t}_p1 AS MATERIALIZED (SELECT cid FROM $bt
         |  WHERE cid NOT IN (SELECT cid FROM ${t}_ex_st)),
         |${t}_keep AS MATERIALIZED (SELECT seed, v, min(cid) AS keep
         |  FROM clips WHERE cid IN (SELECT cid FROM ${t}_p1)
         |  GROUP BY seed, v),
         |${t}_ex_in AS MATERIALIZED (SELECT c.cid, k.keep AS dup_of
         |  FROM clips c JOIN ${t}_keep k
         |    ON k.seed = c.seed AND k.v = c.v
         |  WHERE c.cid IN (SELECT cid FROM ${t}_p1) AND c.cid <> k.keep),
         |${t}_p2 AS MATERIALIZED (SELECT cid FROM ${t}_p1
         |  WHERE cid NOT IN (SELECT cid FROM ${t}_ex_in)),
         |${t}_nd_st AS MATERIALIZED (
         |  SELECT v.src AS cid, min(v.dst) AS dup_of FROM vps v
         |  WHERE v.src IN (SELECT cid FROM ${t}_p2)
         |    AND v.dst IN (SELECT cid FROM $st)
         |  GROUP BY v.src),
         |${t}_p3 AS MATERIALIZED (SELECT cid FROM ${t}_p2
         |  WHERE cid NOT IN (SELECT cid FROM ${t}_nd_st)),
         |${t}_edges AS MATERIALIZED (
         |  SELECT ca AS src, cb AS dst FROM vp
         |  WHERE ca IN (SELECT cid FROM ${t}_p3)
         |    AND cb IN (SELECT cid FROM ${t}_p3)),
         |${t}_und AS (SELECT src, dst FROM ${t}_edges
         |  UNION ALL SELECT dst, src FROM ${t}_edges),
         |${t}_reach(id, r) AS (
         |  SELECT src, src FROM ${t}_und
         |  UNION
         |  SELECT u.src, ${t}_reach.r FROM ${t}_und u
         |  JOIN ${t}_reach ON ${t}_reach.id = u.dst),
         |${t}_nd_in AS (SELECT id AS cid, min(r) AS dup_of
         |  FROM ${t}_reach GROUP BY id HAVING id <> min(r)),
         |${t}_adm AS MATERIALIZED (SELECT cid FROM ${t}_p3
         |  WHERE cid NOT IN (SELECT cid FROM ${t}_nd_in))""".stripMargin
    def verdicts(t: String, b: String, undec: String): String =
      s"""  SELECT '$b' AS batch_id, cid AS id, FALSE AS admitted,
         |    'no_frames' AS reason, cid AS dup_of FROM $undec
         |  UNION ALL SELECT '$b', cid, FALSE, 'exact_dup', dup_of
         |  FROM ${t}_ex_st
         |  UNION ALL SELECT '$b', cid, FALSE, 'exact_dup', dup_of
         |  FROM ${t}_ex_in
         |  UNION ALL SELECT '$b', cid, FALSE, 'near_dup', dup_of
         |  FROM ${t}_nd_st
         |  UNION ALL SELECT '$b', cid, FALSE, 'near_dup', dup_of
         |  FROM ${t}_nd_in
         |  UNION ALL SELECT '$b', cid, TRUE, 'admitted', cid
         |  FROM ${t}_adm""".stripMargin
    s"""WITH RECURSIVE
       |ids AS MATERIALIZED (
       |  SELECT doc_id AS id FROM documents WHERE doc_id < 24),
       |clips AS MATERIALIZED (
       |  SELECT id AS cid, id AS seed, 0 AS v, 'b1' AS b FROM ids
       |  UNION ALL SELECT id + 100, id, 0, 'b1' FROM ids WHERE id % 6 = 0
       |  UNION ALL SELECT id + 200, id, 1, 'b1' FROM ids WHERE id % 6 = 1
       |  UNION ALL SELECT id + 300, id, 0, 'b2' FROM ids WHERE id % 6 = 2
       |  UNION ALL SELECT id + 400, id, 1, 'b2' FROM ids WHERE id % 6 = 3
       |  UNION ALL SELECT id + 900, id, 1, 'b2' FROM ids WHERE id % 6 = 1
       |  UNION ALL SELECT id + 500, id + 1000, 0, 'b2' FROM ids
       |  WHERE id % 6 = 4
       |  UNION ALL SELECT id + 600, id + 1000, 1, 'b2' FROM ids
       |  WHERE id % 6 = 4
       |  UNION ALL SELECT id + 700, id + 2000, 0, 'b2' FROM ids
       |  WHERE id % 6 = 5),
       |undec1 AS MATERIALIZED (SELECT id + 800 AS cid FROM ids
       |  WHERE id % 6 = 2),
       |undec2 AS MATERIALIZED (SELECT cid FROM clips WHERE FALSE),
       |ct AS MATERIALIZED (
       |  SELECT t.k // 32 AS k, t.k % 32 AS x,
       |    ([$pHashCosLiterals])[t.k + 1] AS c
       |  FROM range(256) t(k)),
       |fr AS MATERIALIZED (
       |  SELECT cid, seed, v, f.f AS f FROM clips, range(3) f(f)),
       |g32 AS MATERIALIZED (
       |  SELECT cid, f, x.x AS x, y.y AS y,
       |    ((seed * 31 + f * 53 + (y.y // 2) * 16 + (x.x // 2) * 17 +
       |        CASE WHEN v = 1 AND f = 0 AND x.x // 2 = 0 AND y.y // 2 = 0
       |          THEN 9 ELSE 0 END) % 256) * 10000 AS e4
       |  FROM fr CROSS JOIN range(32) x(x) CROSS JOIN range(32) y(y)),
       |rowp AS MATERIALIZED (
       |  SELECT g.cid, g.f, c.k AS u, g.y AS y,
       |    CAST(sum(g.e4 * c.c) AS BIGINT) AS a
       |  FROM g32 g JOIN ct c ON c.x = g.x GROUP BY 1, 2, 3, 4),
       |coef AS MATERIALIZED (
       |  SELECT r.cid, r.f, c.k * 8 + r.u AS k,
       |    CAST(sum(r.a * c.c) AS BIGINT) AS fc
       |  FROM rowp r JOIN ct c ON c.x = r.y GROUP BY 1, 2, 3),
       |med AS MATERIALIZED (
       |  SELECT cid, f, fc AS m FROM (
       |    SELECT cid, f, fc,
       |      row_number() OVER (PARTITION BY cid, f ORDER BY fc) AS rn
       |    FROM coef WHERE k > 0) WHERE rn = 32),
       |h AS MATERIALIZED (
       |  SELECT c.cid, c.f,
       |    CAST(sum(CASE WHEN c.k > 0 AND c.fc > m.m THEN
       |        CASE WHEN c.k = 63 THEN -9223372036854775808
       |             ELSE CAST(1 AS BIGINT) << CAST(c.k AS INTEGER) END
       |      ELSE 0 END) AS BIGINT) AS phash
       |  FROM coef c JOIN med m USING (cid, f) GROUP BY 1, 2),
       |nf AS MATERIALIZED (SELECT cid, count(*) AS nf FROM h GROUP BY 1),
       |fp AS MATERIALIZED (
       |  SELECT a.cid AS ca, a.f AS fa, b.cid AS cb, b.f AS fb
       |  FROM h a JOIN h b ON a.cid < b.cid
       |  WHERE bit_count(xor(a.phash, b.phash)) <= 3),
       |vp AS MATERIALIZED (
       |  SELECT g.ca, g.cb FROM (
       |    SELECT ca, cb,
       |      count(DISTINCT fa) AS ma, count(DISTINCT fb) AS mb
       |    FROM fp GROUP BY 1, 2) g
       |  JOIN nf na ON na.cid = g.ca JOIN nf nb ON nb.cid = g.cb
       |  WHERE floor((g.ma + g.mb) * 10000.0 / (na.nf + nb.nf) + 0.5)
       |    >= 5000),
       |vps AS MATERIALIZED (SELECT ca AS src, cb AS dst FROM vp
       |  UNION ALL SELECT cb, ca FROM vp),
       |bt1 AS MATERIALIZED (SELECT cid FROM clips WHERE b = 'b1'),
       |bt2 AS MATERIALIZED (SELECT cid FROM clips WHERE b = 'b2'),
       |s0 AS MATERIALIZED (SELECT cid FROM clips WHERE FALSE),
       |${replay("r1", "bt1", "s0")},
       |s1 AS MATERIALIZED (SELECT cid FROM r1_adm),
       |${replay("r2", "bt2", "s1")},
       |out AS (
       |${verdicts("r1", "b1", "undec1")}
       |  UNION ALL
       |${verdicts("r2", "b2", "undec2")})
       |SELECT batch_id, CAST(id AS BIGINT) AS id, admitted, reason,
       |  CAST(dup_of AS BIGINT) AS dup_of
       |FROM out ORDER BY batch_id, id""".stripMargin
  }

  // ---- q173 audio increment (exact + fingerprint + SEMANTIC stage) --------
  // Increment.curateAudioIncrement twice over (b1 bootstraps, b2 runs
  // against the accumulated state, then b2 RERUNS under the same batch
  // id — the q157/q160/q161 idempotence-through-the-oracle discipline),
  // with the r17 SEMANTIC sub-state enabled: pooled energy-profile
  // embeddings (dim 16, e4 bucket means over 4-window time fractions,
  // mean-centered) SemDeDup what the delta-bit fingerprint misses.
  // Clips are param-determined WAVs: window i of clip (seed, form) has
  // constant amplitude 2000 + 150·(md5₃₂(seed:i/4) mod 5 − 2) +
  // 30·(md5₃₂(salt:seed:i) mod 3 − 1) — bucket LEVELS are the scene
  // identity, per-window WOBBLE makes the bit stream scene-rich. Forms:
  // 0 = base (64 windows), 1 = EXTENDED (76 windows — shares bit
  // positions 0..62 with the base, fingerprint Jaccard ≈ 0.79 ≥ 0.5:
  // the planted NEAR-dup), 2 = 2× RESAMPLE (every frame doubled: bucket
  // means identical ⇒ cosine 1, but every sub-fingerprint value gains
  // an interleaved zero ⇒ fingerprint recall 0: the planted SEM-dup),
  // 3 = resample with fresh wobble grain (salt w2). Planted per src id:
  // %6==0 exact-within-b1 then exact-vs-state, %6==1 ext-near-within-b1
  // then w2-resample→sem-vs-state, %6==2 a no_fingerprint payload then
  // ext-near-vs-state, %6==3 a within-b2 sem pair, %6==4 a within-b2
  // near pair, %6==5 fresh. The oracle replays window means →
  // fingerprints → Jaccard pairs → embeddings → the pinned-centroid
  // (md5 mod 4) IVF assignment/verify/components chain, per batch.
  private def q173H32(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString, 16)

  private def q173Amp(seed: Long, i: Int, salt: String): Int =
    2000 + 150 * ((q173H32(s"$seed:${i / 4}") % 5L).toInt - 2) +
      30 * ((q173H32(s"$salt:$seed:$i") % 3L).toInt - 1)

  private def q173Clip(cid: Long, seed: Long, form: Int)
      : graft.operators.Multimodal.MediaRecord = {
    val W = 50
    val bytes = form match {
      case 0 | 1 =>
        val nWin = if (form == 0) 64 else 76
        graft.operators.Multimodal.encodePcm16Wav(8000, 1,
          Array.tabulate(nWin * W)(f => q173Amp(seed, f / W, "w").toShort))
      case f =>
        val salt = if (f == 2) "w" else "w2"
        graft.operators.Multimodal.encodePcm16Wav(16000, 1,
          Array.tabulate(2 * 64 * W)(fr =>
            q173Amp(seed, fr / (2 * W), salt).toShort))
    }
    graft.operators.Multimodal.MediaRecord(cid, bytes, "audio/wav")
  }

  def q173Media(docs: org.apache.spark.sql.DataFrame, batch: String)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.filter(col("doc_id") < 24).select(col("doc_id")).as[Long]
      .flatMap { id =>
        if (batch == "b1")
          Seq(q173Clip(id, id, 0)) ++
            (if (id % 6 == 0) Seq(q173Clip(id + 100, id, 0)) else Nil) ++
            (if (id % 6 == 1) Seq(q173Clip(id + 200, id, 1)) else Nil) ++
            (if (id % 6 == 2) Seq(graft.operators.Multimodal.MediaRecord(
              id + 800, s"not audio $id".getBytes("UTF-8"),
              "text/plain")) else Nil)
        else
          (if (id % 6 == 0) Seq(q173Clip(id + 300, id, 0)) else Nil) ++
            (if (id % 6 == 1) Seq(q173Clip(id + 900, id, 3)) else Nil) ++
            (if (id % 6 == 2) Seq(q173Clip(id + 400, id, 1)) else Nil) ++
            (if (id % 6 == 3) Seq(q173Clip(id + 500, id + 1000, 0),
              q173Clip(id + 600, id + 1000, 2)) else Nil) ++
            (if (id % 6 == 4) Seq(q173Clip(id + 650, id + 3000, 0),
              q173Clip(id + 660, id + 3000, 1)) else Nil) ++
            (if (id % 6 == 5) Seq(q173Clip(id + 700, id + 2000, 0))
             else Nil)
      }
  }

  val q173: Q = (s, d) => {
    import graft.pipeline.Increment
    val docs = graft.core.Ops.widen(Tables.documents(s, d))
    val fp = dataFingerprint(
      docs.filter(col("doc_id") < 24).select(col("doc_id")))
    memoizedReplay(s, "q173", d, fp) {
      val dir = scratchDir("graft_q173_state")
      val cfg = Increment.AudioIncrementConfig(
        semDedupThresholdE4 = Some(9000L), semDim = 16,
        semCentroidEvery = 4)
      Increment.curateAudioIncrement(q173Media(docs, "b1"), dir, "b1", cfg)
      Increment.curateAudioIncrement(q173Media(docs, "b2"), dir, "b2", cfg)
      Increment.curateAudioIncrement(q173Media(docs, "b2"), dir, "b2", cfg)
      Increment.readLedger(s, dir)
        .select(col("batch_id"), col("id"), col("admitted"),
          col("reason"), col("dup_of"))
        .orderBy("batch_id", "id")
    }
  }

  val q173Sql: String = {
    val cosNew = graft.operators.Similarity.cosineDuckSql("n.v", "c.cv")
    val cosPair = graft.operators.Similarity.cosineDuckSql("a.v", "b.v")
    val cosSt = graft.operators.Similarity.cosineDuckSql("n.v", "o.v")
    // fp half of one funnel round: batch pool $bt vs admitted state $st
    // (exact by (seed, form) equality, near by fingerprint Jaccard) —
    // ends at ${t}_pf, the fingerprint-survivor pool
    def replayFp(t: String, bt: String, st: String): String =
      s"""${t}_ex_st AS MATERIALIZED (SELECT c.cid, min(sc.cid) AS dup_of
         |  FROM clips c JOIN clips sc
         |    ON sc.seed = c.seed AND sc.form = c.form
         |  WHERE c.cid IN (SELECT cid FROM $bt)
         |    AND sc.cid IN (SELECT cid FROM $st)
         |  GROUP BY c.cid),
         |${t}_p1 AS MATERIALIZED (SELECT cid FROM $bt
         |  WHERE cid NOT IN (SELECT cid FROM ${t}_ex_st)),
         |${t}_keep AS MATERIALIZED (SELECT seed, form, min(cid) AS keep
         |  FROM clips WHERE cid IN (SELECT cid FROM ${t}_p1)
         |  GROUP BY seed, form),
         |${t}_ex_in AS MATERIALIZED (SELECT c.cid, k.keep AS dup_of
         |  FROM clips c JOIN ${t}_keep k
         |    ON k.seed = c.seed AND k.form = c.form
         |  WHERE c.cid IN (SELECT cid FROM ${t}_p1) AND c.cid <> k.keep),
         |${t}_p2 AS MATERIALIZED (SELECT cid FROM ${t}_p1
         |  WHERE cid NOT IN (SELECT cid FROM ${t}_ex_in)),
         |${t}_nd_st AS MATERIALIZED (
         |  SELECT v.src AS cid, min(v.dst) AS dup_of FROM fpps v
         |  WHERE v.src IN (SELECT cid FROM ${t}_p2)
         |    AND v.dst IN (SELECT cid FROM $st)
         |  GROUP BY v.src),
         |${t}_p3 AS MATERIALIZED (SELECT cid FROM ${t}_p2
         |  WHERE cid NOT IN (SELECT cid FROM ${t}_nd_st)),
         |${t}_edges AS MATERIALIZED (
         |  SELECT ca AS src, cb AS dst FROM fpp
         |  WHERE ca IN (SELECT cid FROM ${t}_p3)
         |    AND cb IN (SELECT cid FROM ${t}_p3)),
         |${t}_und AS (SELECT src, dst FROM ${t}_edges
         |  UNION ALL SELECT dst, src FROM ${t}_edges),
         |${t}_reach(id, r) AS (
         |  SELECT src, src FROM ${t}_und
         |  UNION
         |  SELECT u.src, ${t}_reach.r FROM ${t}_und u
         |  JOIN ${t}_reach ON ${t}_reach.id = u.dst),
         |${t}_nd_in AS MATERIALIZED (SELECT id AS cid, min(r) AS dup_of
         |  FROM ${t}_reach GROUP BY id HAVING id <> min(r)),
         |${t}_pf AS MATERIALIZED (SELECT cid FROM ${t}_p3
         |  WHERE cid NOT IN (SELECT cid FROM ${t}_nd_in))""".stripMargin
    // sem half: the ${t}_pf pool assigns top-2 cells vs $cent, dedups
    // vs the $sv state vectors (shared cell, cosine >= 0.9, min old),
    // then within batch (components, min-id canonical)
    def replaySem(t: String, cent: String, sv: String): String =
      s"""${t}_nas AS MATERIALIZED (
         |  SELECT id, v, cid FROM (
         |    SELECT n.id, n.v, c.cid,
         |      row_number() OVER (PARTITION BY n.id
         |        ORDER BY $cosNew DESC, c.cid ASC) AS rn
         |    FROM emb n JOIN $cent c ON TRUE
         |    WHERE n.id IN (SELECT cid FROM ${t}_pf)) t(id, v, cid, rn)
         |  WHERE rn <= 2),
         |${t}_sem_st AS MATERIALIZED (
         |  SELECT n.id AS cid, min(o.id) AS dup_of
         |  FROM ${t}_nas n JOIN $sv o USING (cid)
         |  WHERE n.id <> o.id AND $cosSt >= 0.9
         |  GROUP BY n.id),
         |${t}_p4 AS MATERIALIZED (SELECT cid FROM ${t}_pf
         |  WHERE cid NOT IN (SELECT cid FROM ${t}_sem_st)),
         |${t}_sedges AS MATERIALIZED (
         |  SELECT DISTINCT a.id AS src, b.id AS dst
         |  FROM ${t}_nas a JOIN ${t}_nas b USING (cid)
         |  WHERE a.id < b.id
         |    AND a.id IN (SELECT cid FROM ${t}_p4)
         |    AND b.id IN (SELECT cid FROM ${t}_p4)
         |    AND $cosPair >= 0.9),
         |${t}_sund AS (SELECT src, dst FROM ${t}_sedges
         |  UNION ALL SELECT dst, src FROM ${t}_sedges),
         |${t}_sreach(id, r) AS (
         |  SELECT src, src FROM ${t}_sund
         |  UNION
         |  SELECT u.src, ${t}_sreach.r FROM ${t}_sund u
         |  JOIN ${t}_sreach ON ${t}_sreach.id = u.dst),
         |${t}_sem_in AS MATERIALIZED (SELECT id AS cid, min(r) AS dup_of
         |  FROM ${t}_sreach GROUP BY id HAVING id <> min(r)),
         |${t}_adm AS MATERIALIZED (SELECT cid FROM ${t}_p4
         |  WHERE cid NOT IN (SELECT cid FROM ${t}_sem_in))""".stripMargin
    def verdicts(t: String, b: String, undec: String): String =
      s"""  SELECT '$b' AS batch_id, cid AS id, FALSE AS admitted,
         |    'no_fingerprint' AS reason, cid AS dup_of FROM $undec
         |  UNION ALL SELECT '$b', cid, FALSE, 'exact_dup', dup_of
         |  FROM ${t}_ex_st
         |  UNION ALL SELECT '$b', cid, FALSE, 'exact_dup', dup_of
         |  FROM ${t}_ex_in
         |  UNION ALL SELECT '$b', cid, FALSE, 'near_dup', dup_of
         |  FROM ${t}_nd_st
         |  UNION ALL SELECT '$b', cid, FALSE, 'near_dup', dup_of
         |  FROM ${t}_nd_in
         |  UNION ALL SELECT '$b', cid, FALSE, 'sem_dup', dup_of
         |  FROM ${t}_sem_st
         |  UNION ALL SELECT '$b', cid, FALSE, 'sem_dup', dup_of
         |  FROM ${t}_sem_in
         |  UNION ALL SELECT '$b', cid, TRUE, 'admitted', cid
         |  FROM ${t}_adm""".stripMargin
    s"""WITH RECURSIVE
       |ids AS MATERIALIZED (
       |  SELECT doc_id AS id FROM documents WHERE doc_id < 24),
       |clips AS MATERIALIZED (
       |  SELECT id AS cid, id AS seed, 0 AS form, 'b1' AS b FROM ids
       |  UNION ALL SELECT id + 100, id, 0, 'b1' FROM ids WHERE id % 6 = 0
       |  UNION ALL SELECT id + 200, id, 1, 'b1' FROM ids WHERE id % 6 = 1
       |  UNION ALL SELECT id + 300, id, 0, 'b2' FROM ids WHERE id % 6 = 0
       |  UNION ALL SELECT id + 900, id, 3, 'b2' FROM ids WHERE id % 6 = 1
       |  UNION ALL SELECT id + 400, id, 1, 'b2' FROM ids WHERE id % 6 = 2
       |  UNION ALL SELECT id + 500, id + 1000, 0, 'b2' FROM ids
       |  WHERE id % 6 = 3
       |  UNION ALL SELECT id + 600, id + 1000, 2, 'b2' FROM ids
       |  WHERE id % 6 = 3
       |  UNION ALL SELECT id + 650, id + 3000, 0, 'b2' FROM ids
       |  WHERE id % 6 = 4
       |  UNION ALL SELECT id + 660, id + 3000, 1, 'b2' FROM ids
       |  WHERE id % 6 = 4
       |  UNION ALL SELECT id + 700, id + 2000, 0, 'b2' FROM ids
       |  WHERE id % 6 = 5),
       |undec1 AS MATERIALIZED (SELECT id + 800 AS cid FROM ids
       |  WHERE id % 6 = 2),
       |undec2 AS MATERIALIZED (SELECT cid FROM clips WHERE FALSE),
       |wm AS MATERIALIZED (
       |  SELECT c.cid, w.i AS i,
       |    (2000
       |      + 150 * (('0x' || substr(md5(c.seed::VARCHAR || ':' ||
       |          ((CASE WHEN c.form >= 2 THEN w.i // 2 ELSE w.i END) // 4)
       |            ::VARCHAR), 1, 8))::BIGINT % 5 - 2)
       |      + 30 * (('0x' || substr(md5(
       |          (CASE WHEN c.form = 3 THEN 'w2' ELSE 'w' END) || ':' ||
       |          c.seed::VARCHAR || ':' ||
       |          (CASE WHEN c.form >= 2 THEN w.i // 2 ELSE w.i END)
       |            ::VARCHAR), 1, 8))::BIGINT % 3 - 1))
       |      * CAST(10000 AS BIGINT) AS m,
       |    CASE c.form WHEN 0 THEN 64 WHEN 1 THEN 76 ELSE 128 END AS nwin
       |  FROM clips c JOIN range(128) w(i)
       |    ON w.i < CASE c.form WHEN 0 THEN 64 WHEN 1 THEN 76
       |      ELSE 128 END),
       |bits AS MATERIALIZED (
       |  SELECT a.cid, a.i,
       |    CASE WHEN b.m > a.m THEN 1 ELSE 0 END AS bit
       |  FROM wm a JOIN wm b ON b.cid = a.cid AND b.i = a.i + 1),
       |nb AS MATERIALIZED (SELECT cid, max(i) AS mx FROM bits GROUP BY 1),
       |fpv AS MATERIALIZED (
       |  SELECT DISTINCT p.cid, CAST(sum(
       |      CAST(b.bit AS BIGINT) << CAST(19 - (b.i - p.i) AS INTEGER))
       |    AS BIGINT) AS fp
       |  FROM (SELECT bi.cid, bi.i FROM bits bi JOIN nb
       |          ON nb.cid = bi.cid AND bi.i <= nb.mx - 19) p
       |  JOIN bits b ON b.cid = p.cid AND b.i BETWEEN p.i AND p.i + 19
       |  GROUP BY p.cid, p.i),
       |sizes AS MATERIALIZED (SELECT cid, count(*) AS nfp FROM fpv
       |  GROUP BY 1),
       |fpp AS MATERIALIZED (
       |  SELECT g.ca, g.cb FROM (
       |    SELECT a.cid AS ca, b.cid AS cb, count(*) AS ninter
       |    FROM fpv a JOIN fpv b ON a.fp = b.fp AND a.cid < b.cid
       |    GROUP BY 1, 2) g
       |  JOIN sizes na ON na.cid = g.ca JOIN sizes nb ON nb.cid = g.cb
       |  WHERE floor(g.ninter * 1.0 / (na.nfp + nb.nfp - g.ninter)
       |      * 10000 + 0.5) >= 5000),
       |fpps AS MATERIALIZED (SELECT ca AS src, cb AS dst FROM fpp
       |  UNION ALL SELECT cb, ca FROM fpp),
       |bkt AS MATERIALIZED (
       |  SELECT cid, (i * 16) // nwin AS pos,
       |    floor(sum(m) * 1.0 / count(*) + 0.5) AS bv
       |  FROM wm GROUP BY cid, (i * 16) // nwin),
       |mu AS MATERIALIZED (SELECT cid, sum(bv) / 16.0 AS m
       |  FROM bkt GROUP BY cid),
       |emb0 AS MATERIALIZED (
       |  SELECT b.cid AS id, list(b.bv - mu.m ORDER BY b.pos) AS v
       |  FROM bkt b JOIN mu USING (cid) GROUP BY b.cid, mu.m),
       |emb AS MATERIALIZED (SELECT id, v FROM emb0
       |  WHERE list_dot_product(v, v) > 0),
       |bt1 AS MATERIALIZED (SELECT cid FROM clips WHERE b = 'b1'),
       |bt2 AS MATERIALIZED (SELECT cid FROM clips WHERE b = 'b2'),
       |s0 AS MATERIALIZED (SELECT cid FROM clips WHERE FALSE),
       |sv0 AS MATERIALIZED (
       |  SELECT e.id, e.v, CAST(0 AS BIGINT) AS cid FROM emb e
       |  WHERE FALSE),
       |${replayFp("r1", "bt1", "s0")},
       |cent1 AS MATERIALIZED (
       |  SELECT id AS cid, v AS cv FROM emb
       |  WHERE id IN (SELECT cid FROM r1_pf)
       |    AND ('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT % 4 = 0),
       |${replaySem("r1", "cent1", "sv0")},
       |s1 AS MATERIALIZED (SELECT cid FROM r1_adm),
       |sv1 AS MATERIALIZED (
       |  SELECT id, v, cid FROM (
       |    SELECT e.id, e.v, c.cid,
       |      row_number() OVER (PARTITION BY e.id
       |        ORDER BY ${graft.operators.Similarity
                  .cosineDuckSql("e.v", "c.cv")} DESC, c.cid ASC) AS rn
       |    FROM emb e JOIN cent1 c ON TRUE
       |    WHERE e.id IN (SELECT cid FROM r1_adm)) n(id, v, cid, rn)
       |  WHERE rn <= 2),
       |${replayFp("r2", "bt2", "s1")},
       |${replaySem("r2", "cent1", "sv1")},
       |out AS (
       |${verdicts("r1", "b1", "undec1")}
       |  UNION ALL
       |${verdicts("r2", "b2", "undec2")})
       |SELECT batch_id, CAST(id AS BIGINT) AS id, admitted, reason,
       |  CAST(dup_of AS BIGINT) AS dup_of
       |FROM out ORDER BY batch_id, id""".stripMargin
  }

  // ---- q174 video increment (exact + frame-hash + SEMANTIC stage) ---------
  // Increment.curateVideoIncrement twice over (b1 bootstraps, b2 runs
  // against the accumulated state, then b2 RERUNS under the same batch
  // id), with the r17 SEMANTIC sub-state enabled: pooled keyframe
  // block-mean embeddings (8×8 grid over 16×16 frames = 2×2 boxes,
  // e4-exact sums·2500, pooled over 3 frames, mean-centered) SemDeDup
  // the RE-GRAINED re-encodes per-frame pHash misses. Clips are
  // 3-keyframe MP4s with lossless PNG samples parametrized by (pattern,
  // grain, v): pixel (x,y) of every frame = 128 + wave(fx,x)·wave(fy,y)
  // + md5-noise(grain,f,x,y) in ±15, +9 at (0,0) of frame 0 when v=1
  // (the q161 near-dup nudge; fx = pat%7+1, fy = (pat/7)%7+1 — 49
  // orthogonal scenes, the q159 wave-table discipline). Same GRAIN +
  // nudge ⇒ frame-hash near pair; same PATTERN under a fresh grain ⇒
  // pHash flips > 3 bits per frame (temporal Jaccard 0) while block
  // means barely move ⇒ the sem stage's catch. Planted per src id:
  // %6==0 exact-within-b1 then exact-vs-state, %6==1 nudge-near-within-
  // b1 then its b2 echo near-vs-state, %6==2 an unparseable payload
  // then re-grain→sem-vs-state, %6==3 re-grain→sem-within-b1 then a
  // fresh-scene within-b2 sem pair, %6==4 a within-b2 near pair,
  // %6==5 fresh. The oracle replays pixels → per-frame pHash (the q161
  // DCT chain) → temporal Jaccard → block-mean embeddings → the
  // pinned-centroid IVF assignment/verify/components chain, per batch.
  private def q174Wave(f: Int, x: Int): Int =
    math.round(10.0 * math.cos(math.Pi * 2 * f * x / 16)).toInt

  private def q174Clip(cid: Long, pat: Long, grain: Long, v: Int)
      : graft.operators.Multimodal.MediaRecord = {
    val (fx, fy) = ((pat % 7).toInt + 1, ((pat / 7) % 7).toInt + 1)
    def noise(f: Int, x: Int, y: Int): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$grain:$f:$x:$y".getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 31L).toInt - 15
    }
    graft.operators.Multimodal.MediaRecord(cid,
      graft.operators.Multimodal.encodeSamplesMp4(1000, 3000,
        (0 to 2).map(f => graft.operators.Multimodal.encodeGrayPixelsPng(
          16, 16, Array.tabulate(256) { p =>
            val (x, y) = (p % 16, p / 16)
            val nudge = if (v == 1 && f == 0 && x == 0 && y == 0) 9 else 0
            128 + q174Wave(fx, x) * q174Wave(fy, y) + noise(f, x, y) +
              nudge
          }))),
      "video/mp4")
  }

  def q174Media(docs: org.apache.spark.sql.DataFrame, batch: String)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.filter(col("doc_id") < 24).select(col("doc_id")).as[Long]
      .flatMap { id =>
        if (batch == "b1")
          Seq(q174Clip(id, id, id, 0)) ++
            (if (id % 6 == 0) Seq(q174Clip(id + 100, id, id, 0)) else Nil) ++
            (if (id % 6 == 1) Seq(q174Clip(id + 200, id, id, 1)) else Nil) ++
            (if (id % 6 == 2) Seq(graft.operators.Multimodal.MediaRecord(
              id + 800, s"not a video $id".getBytes("UTF-8"),
              "text/plain")) else Nil) ++
            (if (id % 6 == 3) Seq(q174Clip(id + 250, id, id + 41, 0))
             else Nil)
        else
          (if (id % 6 == 0) Seq(q174Clip(id + 300, id, id, 0)) else Nil) ++
            (if (id % 6 == 1) Seq(q174Clip(id + 900, id, id, 1)) else Nil) ++
            (if (id % 6 == 2) Seq(q174Clip(id + 400, id, id + 42, 0))
             else Nil) ++
            (if (id % 6 == 3) Seq(q174Clip(id + 500, id + 24, id + 43, 0),
              q174Clip(id + 600, id + 24, id + 44, 0)) else Nil) ++
            (if (id % 6 == 4) Seq(q174Clip(id + 550, id + 24, id + 45, 0),
              q174Clip(id + 560, id + 24, id + 45, 1)) else Nil) ++
            (if (id % 6 == 5) Seq(q174Clip(id + 700, id + 24, id + 46, 0))
             else Nil)
      }
  }

  val q174: Q = (s, d) => {
    import graft.pipeline.Increment
    val docs = graft.core.Ops.widen(Tables.documents(s, d))
    val fp = dataFingerprint(
      docs.filter(col("doc_id") < 24).select(col("doc_id")))
    memoizedReplay(s, "q174", d, fp) {
      val dir = scratchDir("graft_q174_state")
      val cfg = Increment.VideoIncrementConfig(
        semDedupThresholdE4 = Some(9000L), semGrid = 8,
        semCentroidEvery = 4)
      Increment.curateVideoIncrement(q174Media(docs, "b1"), dir, "b1", cfg)
      Increment.curateVideoIncrement(q174Media(docs, "b2"), dir, "b2", cfg)
      Increment.curateVideoIncrement(q174Media(docs, "b2"), dir, "b2", cfg)
      Increment.readLedger(s, dir)
        .select(col("batch_id"), col("id"), col("admitted"),
          col("reason"), col("dup_of"))
        .orderBy("batch_id", "id")
    }
  }

  val q174Sql: String = {
    val waveLits = (1 to 7).flatMap(f =>
      (0 until 16).map(x => q174Wave(f, x))).mkString(", ")
    val cosNew = graft.operators.Similarity.cosineDuckSql("n.v", "c.cv")
    val cosPair = graft.operators.Similarity.cosineDuckSql("a.v", "b.v")
    val cosSt = graft.operators.Similarity.cosineDuckSql("n.v", "o.v")
    def replayFp(t: String, bt: String, st: String): String =
      s"""${t}_ex_st AS MATERIALIZED (SELECT c.cid, min(sc.cid) AS dup_of
         |  FROM clips c JOIN clips sc ON sc.pat = c.pat
         |    AND sc.grain = c.grain AND sc.v = c.v
         |  WHERE c.cid IN (SELECT cid FROM $bt)
         |    AND sc.cid IN (SELECT cid FROM $st)
         |  GROUP BY c.cid),
         |${t}_p1 AS MATERIALIZED (SELECT cid FROM $bt
         |  WHERE cid NOT IN (SELECT cid FROM ${t}_ex_st)),
         |${t}_keep AS MATERIALIZED (
         |  SELECT pat, grain, v, min(cid) AS keep
         |  FROM clips WHERE cid IN (SELECT cid FROM ${t}_p1)
         |  GROUP BY pat, grain, v),
         |${t}_ex_in AS MATERIALIZED (SELECT c.cid, k.keep AS dup_of
         |  FROM clips c JOIN ${t}_keep k ON k.pat = c.pat
         |    AND k.grain = c.grain AND k.v = c.v
         |  WHERE c.cid IN (SELECT cid FROM ${t}_p1) AND c.cid <> k.keep),
         |${t}_p2 AS MATERIALIZED (SELECT cid FROM ${t}_p1
         |  WHERE cid NOT IN (SELECT cid FROM ${t}_ex_in)),
         |${t}_nd_st AS MATERIALIZED (
         |  SELECT v.src AS cid, min(v.dst) AS dup_of FROM vps v
         |  WHERE v.src IN (SELECT cid FROM ${t}_p2)
         |    AND v.dst IN (SELECT cid FROM $st)
         |  GROUP BY v.src),
         |${t}_p3 AS MATERIALIZED (SELECT cid FROM ${t}_p2
         |  WHERE cid NOT IN (SELECT cid FROM ${t}_nd_st)),
         |${t}_edges AS MATERIALIZED (
         |  SELECT ca AS src, cb AS dst FROM vp
         |  WHERE ca IN (SELECT cid FROM ${t}_p3)
         |    AND cb IN (SELECT cid FROM ${t}_p3)),
         |${t}_und AS (SELECT src, dst FROM ${t}_edges
         |  UNION ALL SELECT dst, src FROM ${t}_edges),
         |${t}_reach(id, r) AS (
         |  SELECT src, src FROM ${t}_und
         |  UNION
         |  SELECT u.src, ${t}_reach.r FROM ${t}_und u
         |  JOIN ${t}_reach ON ${t}_reach.id = u.dst),
         |${t}_nd_in AS MATERIALIZED (SELECT id AS cid, min(r) AS dup_of
         |  FROM ${t}_reach GROUP BY id HAVING id <> min(r)),
         |${t}_pf AS MATERIALIZED (SELECT cid FROM ${t}_p3
         |  WHERE cid NOT IN (SELECT cid FROM ${t}_nd_in))""".stripMargin
    def replaySem(t: String, cent: String, sv: String): String =
      s"""${t}_nas AS MATERIALIZED (
         |  SELECT id, v, cid FROM (
         |    SELECT n.id, n.v, c.cid,
         |      row_number() OVER (PARTITION BY n.id
         |        ORDER BY $cosNew DESC, c.cid ASC) AS rn
         |    FROM emb n JOIN $cent c ON TRUE
         |    WHERE n.id IN (SELECT cid FROM ${t}_pf)) t(id, v, cid, rn)
         |  WHERE rn <= 2),
         |${t}_sem_st AS MATERIALIZED (
         |  SELECT n.id AS cid, min(o.id) AS dup_of
         |  FROM ${t}_nas n JOIN $sv o USING (cid)
         |  WHERE n.id <> o.id AND $cosSt >= 0.9
         |  GROUP BY n.id),
         |${t}_p4 AS MATERIALIZED (SELECT cid FROM ${t}_pf
         |  WHERE cid NOT IN (SELECT cid FROM ${t}_sem_st)),
         |${t}_sedges AS MATERIALIZED (
         |  SELECT DISTINCT a.id AS src, b.id AS dst
         |  FROM ${t}_nas a JOIN ${t}_nas b USING (cid)
         |  WHERE a.id < b.id
         |    AND a.id IN (SELECT cid FROM ${t}_p4)
         |    AND b.id IN (SELECT cid FROM ${t}_p4)
         |    AND $cosPair >= 0.9),
         |${t}_sund AS (SELECT src, dst FROM ${t}_sedges
         |  UNION ALL SELECT dst, src FROM ${t}_sedges),
         |${t}_sreach(id, r) AS (
         |  SELECT src, src FROM ${t}_sund
         |  UNION
         |  SELECT u.src, ${t}_sreach.r FROM ${t}_sund u
         |  JOIN ${t}_sreach ON ${t}_sreach.id = u.dst),
         |${t}_sem_in AS MATERIALIZED (SELECT id AS cid, min(r) AS dup_of
         |  FROM ${t}_sreach GROUP BY id HAVING id <> min(r)),
         |${t}_adm AS MATERIALIZED (SELECT cid FROM ${t}_p4
         |  WHERE cid NOT IN (SELECT cid FROM ${t}_sem_in))""".stripMargin
    def verdicts(t: String, b: String, undec: String): String =
      s"""  SELECT '$b' AS batch_id, cid AS id, FALSE AS admitted,
         |    'no_frames' AS reason, cid AS dup_of FROM $undec
         |  UNION ALL SELECT '$b', cid, FALSE, 'exact_dup', dup_of
         |  FROM ${t}_ex_st
         |  UNION ALL SELECT '$b', cid, FALSE, 'exact_dup', dup_of
         |  FROM ${t}_ex_in
         |  UNION ALL SELECT '$b', cid, FALSE, 'near_dup', dup_of
         |  FROM ${t}_nd_st
         |  UNION ALL SELECT '$b', cid, FALSE, 'near_dup', dup_of
         |  FROM ${t}_nd_in
         |  UNION ALL SELECT '$b', cid, FALSE, 'sem_dup', dup_of
         |  FROM ${t}_sem_st
         |  UNION ALL SELECT '$b', cid, FALSE, 'sem_dup', dup_of
         |  FROM ${t}_sem_in
         |  UNION ALL SELECT '$b', cid, TRUE, 'admitted', cid
         |  FROM ${t}_adm""".stripMargin
    s"""WITH RECURSIVE
       |ids AS MATERIALIZED (
       |  SELECT doc_id AS id FROM documents WHERE doc_id < 24),
       |clips AS MATERIALIZED (
       |  SELECT id AS cid, id AS pat, id AS grain, 0 AS v, 'b1' AS b
       |  FROM ids
       |  UNION ALL SELECT id + 100, id, id, 0, 'b1' FROM ids
       |  WHERE id % 6 = 0
       |  UNION ALL SELECT id + 200, id, id, 1, 'b1' FROM ids
       |  WHERE id % 6 = 1
       |  UNION ALL SELECT id + 250, id, id + 41, 0, 'b1' FROM ids
       |  WHERE id % 6 = 3
       |  UNION ALL SELECT id + 300, id, id, 0, 'b2' FROM ids
       |  WHERE id % 6 = 0
       |  UNION ALL SELECT id + 900, id, id, 1, 'b2' FROM ids
       |  WHERE id % 6 = 1
       |  UNION ALL SELECT id + 400, id, id + 42, 0, 'b2' FROM ids
       |  WHERE id % 6 = 2
       |  UNION ALL SELECT id + 500, id + 24, id + 43, 0, 'b2' FROM ids
       |  WHERE id % 6 = 3
       |  UNION ALL SELECT id + 600, id + 24, id + 44, 0, 'b2' FROM ids
       |  WHERE id % 6 = 3
       |  UNION ALL SELECT id + 550, id + 24, id + 45, 0, 'b2' FROM ids
       |  WHERE id % 6 = 4
       |  UNION ALL SELECT id + 560, id + 24, id + 45, 1, 'b2' FROM ids
       |  WHERE id % 6 = 4
       |  UNION ALL SELECT id + 700, id + 24, id + 46, 0, 'b2' FROM ids
       |  WHERE id % 6 = 5),
       |undec1 AS MATERIALIZED (SELECT id + 800 AS cid FROM ids
       |  WHERE id % 6 = 2),
       |undec2 AS MATERIALIZED (SELECT cid FROM clips WHERE FALSE),
       |wave AS MATERIALIZED (
       |  SELECT t.i // 16 + 1 AS f, t.i % 16 AS x,
       |    ([$waveLits])[t.i + 1] AS c
       |  FROM range(112) t(i)),
       |fr AS MATERIALIZED (
       |  SELECT cid, pat, grain, v, f.f AS f FROM clips, range(3) f(f)),
       |px AS MATERIALIZED (
       |  SELECT r.cid, r.f, x.x AS x, y.y AS y,
       |    128 + wx.c * wy.c
       |      + (('0x' || substr(md5(r.grain::VARCHAR || ':' ||
       |          r.f::VARCHAR || ':' || x.x::VARCHAR || ':' ||
       |          y.y::VARCHAR), 1, 8))::BIGINT % 31 - 15)
       |      + CASE WHEN r.v = 1 AND r.f = 0 AND x.x = 0 AND y.y = 0
       |          THEN 9 ELSE 0 END AS p
       |  FROM fr r
       |  CROSS JOIN range(16) x(x)
       |  CROSS JOIN range(16) y(y)
       |  JOIN wave wx ON wx.f = r.pat % 7 + 1 AND wx.x = x.x
       |  JOIN wave wy ON wy.f = (r.pat // 7) % 7 + 1 AND wy.x = y.y),
       |ct AS MATERIALIZED (
       |  SELECT t.k // 32 AS k, t.k % 32 AS x,
       |    ([$pHashCosLiterals])[t.k + 1] AS c
       |  FROM range(256) t(k)),
       |g32 AS MATERIALIZED (
       |  SELECT p.cid, p.f, x.x AS x, y.y AS y, p.p * 10000 AS e4
       |  FROM px p
       |  JOIN range(32) x(x) ON x.x // 2 = p.x
       |  JOIN range(32) y(y) ON y.y // 2 = p.y),
       |rowp AS MATERIALIZED (
       |  SELECT g.cid, g.f, c.k AS u, g.y AS y,
       |    CAST(sum(g.e4 * c.c) AS BIGINT) AS a
       |  FROM g32 g JOIN ct c ON c.x = g.x GROUP BY 1, 2, 3, 4),
       |coef AS MATERIALIZED (
       |  SELECT r.cid, r.f, c.k * 8 + r.u AS k,
       |    CAST(sum(r.a * c.c) AS BIGINT) AS fc
       |  FROM rowp r JOIN ct c ON c.x = r.y GROUP BY 1, 2, 3),
       |med AS MATERIALIZED (
       |  SELECT cid, f, fc AS m FROM (
       |    SELECT cid, f, fc,
       |      row_number() OVER (PARTITION BY cid, f ORDER BY fc) AS rn
       |    FROM coef WHERE k > 0) WHERE rn = 32),
       |h AS MATERIALIZED (
       |  SELECT c.cid, c.f,
       |    CAST(sum(CASE WHEN c.k > 0 AND c.fc > m.m THEN
       |        CASE WHEN c.k = 63 THEN -9223372036854775808
       |             ELSE CAST(1 AS BIGINT) << CAST(c.k AS INTEGER) END
       |      ELSE 0 END) AS BIGINT) AS phash
       |  FROM coef c JOIN med m USING (cid, f) GROUP BY 1, 2),
       |nf AS MATERIALIZED (SELECT cid, count(*) AS nf FROM h GROUP BY 1),
       |fp AS MATERIALIZED (
       |  SELECT a.cid AS ca, a.f AS fa, b.cid AS cb, b.f AS fb
       |  FROM h a JOIN h b ON a.cid < b.cid
       |  WHERE bit_count(xor(a.phash, b.phash)) <= 3),
       |vp AS MATERIALIZED (
       |  SELECT g.ca, g.cb FROM (
       |    SELECT ca, cb,
       |      count(DISTINCT fa) AS ma, count(DISTINCT fb) AS mb
       |    FROM fp GROUP BY 1, 2) g
       |  JOIN nf na ON na.cid = g.ca JOIN nf nb ON nb.cid = g.cb
       |  WHERE floor((g.ma + g.mb) * 10000.0 / (na.nf + nb.nf) + 0.5)
       |    >= 5000),
       |vps AS MATERIALIZED (SELECT ca AS src, cb AS dst FROM vp
       |  UNION ALL SELECT cb, ca FROM vp),
       |gf AS MATERIALIZED (
       |  SELECT cid, f, (y // 2) * 8 + (x // 2) AS pos,
       |    CAST(sum(p) * 2500 AS BIGINT) AS e4
       |  FROM px GROUP BY 1, 2, 3),
       |bkt AS MATERIALIZED (
       |  SELECT cid, pos, floor(sum(e4) * 1.0 / count(*) + 0.5) AS bv
       |  FROM gf GROUP BY cid, pos),
       |mu AS MATERIALIZED (SELECT cid, sum(bv) / 64.0 AS m
       |  FROM bkt GROUP BY cid),
       |emb0 AS MATERIALIZED (
       |  SELECT b.cid AS id, list(b.bv - mu.m ORDER BY b.pos) AS v
       |  FROM bkt b JOIN mu USING (cid) GROUP BY b.cid, mu.m),
       |emb AS MATERIALIZED (SELECT id, v FROM emb0
       |  WHERE list_dot_product(v, v) > 0),
       |bt1 AS MATERIALIZED (SELECT cid FROM clips WHERE b = 'b1'),
       |bt2 AS MATERIALIZED (SELECT cid FROM clips WHERE b = 'b2'),
       |s0 AS MATERIALIZED (SELECT cid FROM clips WHERE FALSE),
       |sv0 AS MATERIALIZED (
       |  SELECT e.id, e.v, CAST(0 AS BIGINT) AS cid FROM emb e
       |  WHERE FALSE),
       |${replayFp("r1", "bt1", "s0")},
       |cent1 AS MATERIALIZED (
       |  SELECT id AS cid, v AS cv FROM emb
       |  WHERE id IN (SELECT cid FROM r1_pf)
       |    AND ('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT % 4 = 0),
       |${replaySem("r1", "cent1", "sv0")},
       |s1 AS MATERIALIZED (SELECT cid FROM r1_adm),
       |sv1 AS MATERIALIZED (
       |  SELECT id, v, cid FROM (
       |    SELECT e.id, e.v, c.cid,
       |      row_number() OVER (PARTITION BY e.id
       |        ORDER BY ${graft.operators.Similarity
                  .cosineDuckSql("e.v", "c.cv")} DESC, c.cid ASC) AS rn
       |    FROM emb e JOIN cent1 c ON TRUE
       |    WHERE e.id IN (SELECT cid FROM r1_adm)) n(id, v, cid, rn)
       |  WHERE rn <= 2),
       |${replayFp("r2", "bt2", "s1")},
       |${replaySem("r2", "cent1", "sv1")},
       |out AS (
       |${verdicts("r1", "b1", "undec1")}
       |  UNION ALL
       |${verdicts("r2", "b2", "undec2")})
       |SELECT batch_id, CAST(id AS BIGINT) AS id, admitted, reason,
       |  CAST(dup_of AS BIGINT) AS dup_of
       |FROM out ORDER BY batch_id, id""".stripMargin
  }

  // ---- q169/q170 N-modality paired verdicts --------------------------------
  // Paired.pairedVerdictsN / pairedDocVerdictsN over SQL-expressible
  // synthetic ledgers (the funnel ledgers themselves are pinned by
  // q157/q160/q161/q165; these probes pin the COMPOSITION): three
  // modality ledgers derived deterministically from documents, pairs
  // covering both-admit / media-decides / text-decides / missing-media /
  // missing-doc(none here: all doc_ids < 60 are in the text ledger) /
  // unknown-modality cases. The oracle replays the exact join semantics
  // and, for q170, the deciding-pair precedence: (declared modality
  // order, then media_id) among rejecting pairs, text rejection first.
  private def q169Fixtures(s: SparkSession, d: String)
      : (DataFrame, Seq[(String, DataFrame)], DataFrame) = {
    val docs = Tables.documents(s, d).filter(col("doc_id") < 60)
      .select(col("doc_id"))
    val tLed = docs.select(col("doc_id").as("id"),
      (col("doc_id") % 3 =!= 0).as("admitted"),
      when(col("doc_id") % 3 === 0, lit("exact_dup"))
        .otherwise(lit("admitted")).as("reason"),
      when(col("doc_id") % 3 === 0, greatest(col("doc_id") - 3, lit(0L)))
        .otherwise(col("doc_id")).cast("long").as("dup_of"))
    val iLed = docs.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 1000L).as("id"),
        (col("doc_id") % 5 =!= 0).as("admitted"),
        when(col("doc_id") % 5 === 0, lit("near_dup"))
          .otherwise(lit("admitted")).as("reason"),
        when(col("doc_id") % 5 === 0, col("doc_id") + 990L)
          .otherwise(col("doc_id") + 1000L).cast("long").as("dup_of"))
    val aLed = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 2000L).as("id"),
        (col("doc_id") % 7 =!= 0).as("admitted"),
        when(col("doc_id") % 7 === 0, lit("exact_dup"))
          .otherwise(lit("admitted")).as("reason"),
        when(col("doc_id") % 7 === 0, col("doc_id") + 1979L)
          .otherwise(col("doc_id") + 2000L).cast("long").as("dup_of"))
    val pairs = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), lit("image").as("modality"),
        (col("doc_id") + 1000L).as("media_id"))
      .unionByName(docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), lit("audio").as("modality"),
          (col("doc_id") + 2000L).as("media_id")))
      .unionByName(docs.filter(col("doc_id") % 13 === 0)
        .select(col("doc_id"), lit("image").as("modality"),
          (col("doc_id") + 1001L).as("media_id")))
      .unionByName(docs.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id"), lit("video").as("modality"),
          (col("doc_id") + 3000L).as("media_id")))
    (tLed, Seq("image" -> iLed, "audio" -> aLed), pairs)
  }

  val q169: Q = (s, d) => {
    val (tLed, mods, pairs) = q169Fixtures(s, d)
    graft.pipeline.Paired.pairedVerdictsN(tLed, mods, pairs)
      .select(col("doc_id"), col("modality"),
        col("media_id").cast("long").as("media_id"), col("admitted"),
        col("reason"), col("dup_of"))
      .orderBy("doc_id", "modality", "media_id")
  }

  /** The q169 pair-verdict CTE with the text-ledger table parametric —
    * q179 replays the SAME composition against two text-root vintages.
    */
  private def q169PvCte(name: String, tl: String): String =
    s"""$name AS (
       |  SELECT p.doc_id, p.modality, CAST(p.media_id AS BIGINT)
       |      AS media_id,
       |    CASE WHEN p.modality NOT IN ('image', 'audio') THEN FALSE
       |      ELSE coalesce(t.adm, FALSE) AND coalesce(m.adm, FALSE) END
       |      AS admitted,
       |    CASE
       |      WHEN p.modality NOT IN ('image', 'audio')
       |        THEN p.modality || ':unknown_modality'
       |      WHEN t.adm IS NULL THEN 'text:missing'
       |      WHEN NOT t.adm THEN 'text:' || t.reason
       |      WHEN m.adm IS NULL THEN p.modality || ':missing'
       |      WHEN NOT m.adm THEN p.modality || ':' || m.reason
       |      ELSE 'admitted' END AS reason,
       |    CAST(CASE
       |      WHEN p.modality NOT IN ('image', 'audio') THEN p.doc_id
       |      WHEN t.adm IS NULL THEN p.doc_id
       |      WHEN NOT t.adm THEN t.dup_of
       |      WHEN m.adm IS NULL THEN p.doc_id
       |      WHEN NOT m.adm THEN m.dup_of
       |      ELSE p.doc_id END AS BIGINT) AS dup_of
       |  FROM pairs p
       |  LEFT JOIN $tl t ON t.id = p.doc_id
       |  LEFT JOIN ml m
       |    ON m.modality = p.modality AND m.id = p.media_id)""".stripMargin

  private val q169Ctes: String =
    s"""d AS (SELECT doc_id FROM documents WHERE doc_id < 60),
       |tl AS (SELECT doc_id AS id, doc_id % 3 <> 0 AS adm,
       |  CASE WHEN doc_id % 3 = 0 THEN 'exact_dup' ELSE 'admitted' END
       |    AS reason,
       |  CAST(CASE WHEN doc_id % 3 = 0 THEN greatest(doc_id - 3, 0)
       |    ELSE doc_id END AS BIGINT) AS dup_of FROM d),
       |il AS (SELECT doc_id + 1000 AS id, doc_id % 5 <> 0 AS adm,
       |  CASE WHEN doc_id % 5 = 0 THEN 'near_dup' ELSE 'admitted' END
       |    AS reason,
       |  CAST(CASE WHEN doc_id % 5 = 0 THEN doc_id + 990
       |    ELSE doc_id + 1000 END AS BIGINT) AS dup_of
       |  FROM d WHERE doc_id % 2 = 0),
       |al AS (SELECT doc_id + 2000 AS id, doc_id % 7 <> 0 AS adm,
       |  CASE WHEN doc_id % 7 = 0 THEN 'exact_dup' ELSE 'admitted' END
       |    AS reason,
       |  CAST(CASE WHEN doc_id % 7 = 0 THEN doc_id + 1979
       |    ELSE doc_id + 2000 END AS BIGINT) AS dup_of
       |  FROM d WHERE doc_id % 3 = 0),
       |pairs AS (
       |  SELECT doc_id, 'image' AS modality, doc_id + 1000 AS media_id
       |  FROM d WHERE doc_id % 2 = 0
       |  UNION ALL SELECT doc_id, 'audio', doc_id + 2000
       |  FROM d WHERE doc_id % 3 = 0
       |  UNION ALL SELECT doc_id, 'image', doc_id + 1001
       |  FROM d WHERE doc_id % 13 = 0
       |  UNION ALL SELECT doc_id, 'video', doc_id + 3000
       |  FROM d WHERE doc_id % 11 = 0),
       |ml AS (SELECT 'image' AS modality, * FROM il
       |  UNION ALL SELECT 'audio', * FROM al),
       |${q169PvCte("pv", "tl")}""".stripMargin

  val q169Sql: String =
    s"""WITH $q169Ctes
       |SELECT doc_id, modality, media_id, admitted, reason, dup_of
       |FROM pv ORDER BY doc_id, modality, media_id""".stripMargin

  val q170: Q = (s, d) => {
    val (tLed, mods, pairs) = q169Fixtures(s, d)
    graft.pipeline.Paired.pairedDocVerdictsN(tLed, mods, pairs)
      .select(col("doc_id"), col("admitted"), col("reason"),
        col("dup_of"))
      .orderBy("doc_id")
  }

  val q170Sql: String =
    s"""WITH $q169Ctes,
       |dec AS (
       |  SELECT doc_id, reason, dup_of FROM (
       |    SELECT doc_id, reason, dup_of, row_number() OVER (
       |      PARTITION BY doc_id ORDER BY
       |        CASE modality WHEN 'image' THEN 0 WHEN 'audio' THEN 1
       |          ELSE 2 END, media_id) AS rn
       |    FROM pv WHERE NOT admitted) WHERE rn = 1)
       |SELECT t.id AS doc_id,
       |  (t.adm AND dec.reason IS NULL) AS admitted,
       |  CASE WHEN NOT t.adm THEN 'text:' || t.reason
       |    WHEN dec.reason IS NOT NULL THEN dec.reason
       |    ELSE 'admitted' END AS reason,
       |  CAST(CASE WHEN NOT t.adm THEN t.dup_of
       |    WHEN dec.reason IS NOT NULL THEN dec.dup_of
       |    ELSE t.id END AS BIGINT) AS dup_of
       |FROM tl t LEFT JOIN dec ON dec.doc_id = t.id
       |ORDER BY doc_id""".stripMargin

  // ---- q179 root-resolved paired verdicts across recurations -------------
  // Paired.pairedVerdictsResolved (r17 verdict #4): the q169 ledgers
  // published as COMMITTED versioned state roots (seed state + the
  // synthetic ledger under batch `base`, the Recurate.publishState
  // path), composed by RESOLVING each modality's current root; then the
  // TEXT root re-curates (a new version with moved gates: %4==1 docs
  // now quality-rejected, everything else admitted) and the SAME pairs
  // re-compose. Output: both phases' verdicts. Pins the documented
  // per-modality-latest contract — after the swap the text-decided
  // rows flip to the new root's verdicts while the image/audio roots
  // (older rebuilds) keep deciding their sides — and the version-
  // vector resolution itself (phase `pre` must reflect v1 even though
  // v2 exists by output time: the pre verdicts were materialized from
  // the resolved immutable root before the swap).
  val q179: Q = (s, d) => {
    import graft.pipeline.{Increment, Paired, Recurate}
    val (tLed, mods, pairs) = q169Fixtures(s, d)
    val docs = Tables.documents(s, d).filter(col("doc_id") < 60)
      .select(col("doc_id"))
    memoizedReplay(s, "q179", d, dataFingerprint(docs)) {
      val wh = scratchDir("graft_q179_wh")
      def publishLedgerRoot(db: String, token: String,
                            led: DataFrame): Unit = {
        Recurate.publishState(s, wh, db, token) { root =>
          Increment.initStateFromCurated(s, root,
            docs.sparkSession.range(999999L, 1000000L)
              .select(col("id").as("doc_id"),
                concat_ws(" ", (1 to 12).map(i => lit(s"seed$i")): _*)
                  .as("text")),
            "doc_id", "text")
          led.withColumn("batch_id", lit("base"))
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(s"$root/ledger")
        }
        (): Unit
      }
      publishLedgerRoot("txt", "1", tLed)
      for ((m, led) <- mods)
        publishLedgerRoot(if (m == "image") "img" else "aud", "1", led)
      val dbs = Seq("image" -> "img", "audio" -> "aud")
      def shape(df: DataFrame, phase: String) =
        df.select(lit(phase).as("phase"), col("doc_id"), col("modality"),
          col("media_id").cast("long").as("media_id"), col("admitted"),
          col("reason"), col("dup_of"))
      // phase pre MATERIALIZES from the resolved v1 root before the swap
      val pre = shape(Paired.pairedVerdictsResolved(s, wh, "txt", dbs,
        pairs).verdicts, "pre").localCheckpoint(eager = true)
      val tl2 = docs.select(col("doc_id").as("id"),
        (col("doc_id") % 4 =!= 1).as("admitted"),
        when(col("doc_id") % 4 === 1, lit("quality"))
          .otherwise(lit("admitted")).as("reason"),
        col("doc_id").cast("long").as("dup_of"))
      publishLedgerRoot("txt", "2", tl2)
      val post = shape(Paired.pairedVerdictsResolved(s, wh, "txt", dbs,
        pairs).verdicts, "post")
      pre.unionByName(post)
        .orderBy("phase", "doc_id", "modality", "media_id")
    }
  }

  val q179Sql: String =
    s"""WITH $q169Ctes,
       |tl2 AS (SELECT doc_id AS id, doc_id % 4 <> 1 AS adm,
       |  CASE WHEN doc_id % 4 = 1 THEN 'quality' ELSE 'admitted' END
       |    AS reason,
       |  CAST(doc_id AS BIGINT) AS dup_of FROM d),
       |${q169PvCte("pv2", "tl2")},
       |outp AS (
       |  SELECT 'pre' AS phase, * FROM pv
       |  UNION ALL SELECT 'post', * FROM pv2)
       |SELECT phase, doc_id, modality, media_id, admitted, reason,
       |  dup_of
       |FROM outp ORDER BY phase, doc_id, modality, media_id""".stripMargin

  private[probes] val queries: Map[String, Q] = Map(
    "q173_audio_increment" -> q173,
    "q174_video_increment_sem" -> q174,
    "q169_paired_nmodal" -> q169,
    "q170_paired_doc_nmodal" -> q170,
    "q161_video_increment" -> q161,
    "q160_image_increment" -> q160,
    "q178_image_recurate" -> q178,
    "q179_paired_resolved" -> q179,
    "q159_image_semdedup" -> q159,
    "q158_audio_neardup" -> q158,
    "q153_video_neardup" -> q153,
    "q36_multimodal_decode" -> q36,
    "q80_media_meta" -> q80,
    "q82_image_decode" -> q82,
    "q84_audio_decode" -> q84,
    "q85_mp4_meta" -> q85,
    "q94_mjpeg_decode" -> q94,
    "q101_image_resize" -> q101,
    "q102_audio_windows" -> q102,
    "q103_image_ahash" -> q103,
    "q104_image_neardup" -> q104,
    "q146_image_phash" -> q146,
    "q147_phash_neardup" -> q147)

  private[probes] val oracleSql: Map[String, String] = Map(
    "q173_audio_increment" -> q173Sql,
    "q174_video_increment_sem" -> q174Sql,
    "q169_paired_nmodal" -> q169Sql,
    "q170_paired_doc_nmodal" -> q170Sql,
    "q161_video_increment" -> q161Sql,
    "q160_image_increment" -> q160Sql,
    "q178_image_recurate" -> q178Sql,
    "q179_paired_resolved" -> q179Sql,
    "q159_image_semdedup" -> q159Sql,
    "q158_audio_neardup" -> q158Sql,
    "q153_video_neardup" -> q153Sql,
    "q36_multimodal_decode" -> q36Sql,
    "q80_media_meta" -> q80Sql,
    "q82_image_decode" -> q82Sql,
    "q84_audio_decode" -> q84Sql,
    "q85_mp4_meta" -> q85Sql,
    "q94_mjpeg_decode" -> q94Sql,
    "q101_image_resize" -> q101Sql,
    "q102_audio_windows" -> q102Sql,
    "q103_image_ahash" -> q103Sql,
    "q104_image_neardup" -> q104Sql,
    "q146_image_phash" -> q146Sql,
    "q147_phash_neardup" -> q147Sql)
}
