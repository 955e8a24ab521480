package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

/** Semantic image dedup via deterministic block-mean embeddings: the
  * re-grained-copy regime (same scene, different pixel noise) where the
  * thresholded bit hash loses and the continuous embedding wins.
  */
class ImageSemDedupSpec extends SparkSpec {
  import spark.implicits._

  // integer plane-wave table: w(f, x) = round(10 cos(2π f x / 16)) — the
  // PhashCosE4 shared-constants discipline (an oracle embeds the same
  // literals; no cross-engine cos parity ever relied on)
  private def wv(f: Int, x: Int): Int =
    math.round(10.0 * math.cos(math.Pi * 2 * f * x / 16)).toInt

  private def noise(id: Long, x: Int, y: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:$x:$y".getBytes("UTF-8")).take(4)
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % 41L).toInt - 20
  }

  /** 16×16 gray image: orthogonal plane-wave scene (fx, fy) from the
    * PATTERN id + per-(own id) pixel noise at ±20.
    */
  private def img(id: Long, pattern: Long): MediaRecord = {
    val fx = (pattern % 3).toInt + 1
    val fy = ((pattern / 3) % 3).toInt + 1
    MediaRecord(id, Multimodal.encodeGrayPixelsPng(16, 16,
      Array.tabulate(256) { p =>
        val (x, y) = (p % 16, p / 16)
        128 + wv(fx, x) * wv(fy, y) + noise(id, x, y)
      }), "image/png")
  }

  test("re-grained copies (same scene, fresh noise) are inside embedding " +
      "cosine but beyond pHash hamming 3 — the regime the embedding adds") {
    // 9 scenes × 3 re-grains each; every trio is one semantic cluster
    val media = (0 until 9).flatMap(pat => (0 until 3).map(g =>
      img(pat * 100L + g, pat))) :+
      MediaRecord(999L, "not an image".getBytes("UTF-8"), "text/plain")
    val ds = media.toDS()
    val victims = Multimodal.imageSemDedupVictims(ds, grid = 8,
        thresholdE4 = 9000L, centroidEvery = 4)
      .as[(Long, Long)].collect().toMap
    // every non-canonical re-grain falls to its scene's min id
    for (pat <- 0 until 9; g <- 1 until 3)
      assert(victims.get(pat * 100L + g).contains(pat * 100L),
        s"scene $pat grain $g: ${victims.get(pat * 100L + g)}")
    // no cross-scene victims (orthogonal waves), undecodable never pairs
    assert(victims.size == 18, s"$victims")
    // pHash at the exact same pairs: the re-grain flips > 3 bits — the
    // planted cluster is INVISIBLE to the bit hash (recall 0 here)
    val ph = Multimodal.imagePHashNearDupPairs(ds, maxHamming = 3)
      .as[(Long, Long, Long)].collect()
    assert(ph.isEmpty, s"pHash unexpectedly caught re-grains: ${ph.toSeq}")
    // constant image → zero centered vector → filtered, never a victim
    val withFlat = ds.union(Seq(
      MediaRecord(9000L, Multimodal.encodeGrayPng(16, 16, 90), "image/png"),
      MediaRecord(9001L, Multimodal.encodeGrayPng(16, 16, 90), "image/png"))
      .toDS())
    val v2 = Multimodal.imageSemDedupVictims(withFlat, grid = 8,
        thresholdE4 = 9000L, centroidEvery = 4)
      .as[(Long, Long)].collect().toMap
    assert(!v2.contains(9000L) && !v2.contains(9001L))
  }
}
