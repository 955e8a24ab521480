package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val counts = Seq(
    ("alpha", 100L), ("beta", 40L), ("gamma", 7L), ("delta", 1L)
  ).toDF("key", "cnt")

  test("cmsCounters: every depth row conserves the total mass") {
    val ctr = Sketches.cmsCounters(counts, "key", "cnt", depth = 4, width = 64)
      .select("j", "bucket", "c").as[(Int, Long, Long)].collect().toSeq
    assert(ctr.map(_._1).toSet === Set(0, 1, 2, 3))
    assert(ctr.forall { case (_, b, _) => b >= 0 && b < 64 })
    // each of the 4 hash rows partitions the keys → per-j sums all equal 148
    val perJ = ctr.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(perJ.values.toSet === Set(148L))
  }

  test("cmsEstimates: one-sided error, exact when collision-free, " +
      "unseen key bounded by residents") {
    val ctr = Sketches.cmsCounters(counts, "key", "cnt")
    val exact = Map("alpha" -> 100L, "beta" -> 40L, "gamma" -> 7L,
      "delta" -> 1L)
    val est = Sketches.cmsEstimates(
        exact.keys.toSeq.toDF("key"), "key", ctr)
      .as[(String, Long)].collect().toMap
    // CMS never underestimates
    exact.foreach { case (k, c) => assert(est(k) >= c, k) }
    // 4 keys in 4×64 buckets: at least one of the 4 rows is collision-free
    // for every key, so the min recovers the exact count
    exact.foreach { case (k, c) => assert(est(k) === c, k) }
    // an unseen key reads whatever buckets it lands in — bounded above by
    // the largest resident, never negative
    val unseen = Sketches.cmsEstimates(Seq("zeta").toDF("key"), "key", ctr)
      .as[(String, Long)].collect().head._2
    assert(unseen >= 0L && unseen <= 148L)
  }

  test("hllRegisters: duplicate-insensitive, bounded registers") {
    val once = Sketches.hllRegisters(
      Seq("a", "b", "c", "d", "e").toDF("k"), "k")
    val dup = Sketches.hllRegisters(
      (Seq("a", "b", "c", "d", "e") ++ Seq.fill(50)("a")).toDF("k"), "k")
    val o = once.as[(Long, Long)].collect().toSet
    assert(o === dup.as[(Long, Long)].collect().toSet)
    assert(o.forall { case (b, r) => b >= 0 && b < 64 && r >= 1 && r <= 55 })
    assert(o.size <= 5)
  }

  test("hllEstimate: small sets take the linear-counting branch and land " +
      "near the truth; register math is integral") {
    def estOf(n: Int): (Long, Long, Long) =
      Sketches.hllEstimate(Sketches.hllRegisters(
          (1 to n).map(i => s"key-$i").toDF("k"), "k"))
        .select("s55", "zeros", "est_e6").as[(Long, Long, Long)]
        .collect().head
    val (s55, zeros, e6) = estOf(20)
    // ≤ 20 occupied registers, each contributing 2^(55−rho) < 2^55
    assert(zeros >= 44L)
    assert(s55 > zeros * (1L << 55))
    assert(s55 < 64L * (1L << 55))
    // linear counting on a 20-element set with m=64 stays within ~25%
    assert(e6 > 15L * 1000000L && e6 < 25L * 1000000L)
    // determinism: bit-identical re-run
    assert(estOf(20) === ((s55, zeros, e6)))
    // monotone-ish growth: 200 keys estimate well above 100 keys'
    assert(estOf(200)._3 > estOf(100)._3)
  }
}
