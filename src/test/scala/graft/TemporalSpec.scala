package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  // quotes: (key, t, qid, px)
  private def quotes = Seq(
    ("a", 10L, 1L, 1.0), ("a", 20L, 2L, 2.0), ("a", 20L, 3L, 3.0),
    ("b", 5L, 4L, 4.0)
  ).toDF("k", "sec", "qid", "px")
    .withColumn("qt", expr("timestamp_seconds(sec)"))

  // trades: (key, t, tid)
  private def trades = Seq(
    ("a", 9L, 100L),  // before any quote
    ("a", 10L, 101L), // exactly at quote 1
    ("a", 25L, 102L), // after the tied quotes at t=20
    ("b", 5L, 103L),  // exactly at b's only quote
    ("c", 7L, 104L)   // key with no quotes at all
  ).toDF("k", "sec", "tid").withColumn("tt", expr("timestamp_seconds(sec)"))

  test("asofJoin picks latest at-or-before right row, max tieBreak on ties") {
    val got = Temporal.asofJoin(
      trades.select("k", "tt", "tid"), "k", "tt",
      quotes.select("k", "qt", "qid", "px"), "k", "qt",
      payload = Seq("qid", "px"), tieBreak = "qid")
      .select("tid", "qid", "px").as[(Long, Option[Long], Option[Double])]
      .collect().map { case (t, q, p) => t -> ((q, p)) }.toMap
    assert(got(100L) == ((None, None)))            // no quote yet
    assert(got(101L) == ((Some(1L), Some(1.0))))   // inclusive: same-ts match
    assert(got(102L) == ((Some(3L), Some(3.0))))   // tie at t=20 → max qid
    assert(got(103L) == ((Some(4L), Some(4.0))))
    assert(got(104L) == ((None, None)))            // unseen key → null payload
  }

  test("asofJoin exclusive drops the same-timestamp right row") {
    val got = Temporal.asofJoin(
      trades.select("k", "tt", "tid"), "k", "tt",
      quotes.select("k", "qt", "qid", "px"), "k", "qt",
      payload = Seq("qid"), tieBreak = "qid", inclusive = false)
      .select("tid", "qid").as[(Long, Option[Long])].collect().toMap
    assert(got(101L).isEmpty)  // quote at exactly t=10 no longer visible
    assert(got(103L).isEmpty)
    assert(got(102L).contains(3L))
  }

  test("asofJoin preserves every left row and supports outPrefix") {
    val out = Temporal.asofJoin(
      trades, "k", "tt", quotes, "k", "qt",
      payload = Seq("qid"), tieBreak = "qid", outPrefix = "q_")
    assert(out.count() == trades.count())
    assert(out.columns.contains("q_qid"))
    // left columns come through unchanged
    assert(trades.columns.forall(out.columns.contains))
  }

  test("rangeJoin matches the brute-force interval join, including bucket-boundary windows") {
    val left = Seq(("a", 100L, 1L), ("a", 3600L, 2L), ("a", 3599L, 3L),
      ("b", 50L, 4L)).toDF("k", "sec", "lid")
      .withColumn("lt", expr("timestamp_seconds(sec)"))
    val right = Seq(("a", 0L, 10L), ("a", 99L, 11L), ("a", 100L, 12L),
      ("a", 3500L, 13L), ("a", 7300L, 14L), ("b", 49L, 15L), ("c", 1L, 16L))
      .toDF("k", "sec", "rid").withColumn("rt", expr("timestamp_seconds(sec)"))

    val got = Temporal.rangeJoin(
      left.select("k", "lt", "lid"), "k", "lt",
      right.select("k", "rt", "rid"), "k", "rt",
      lowerSec = -3600L, upperSec = 0L, payload = Seq("rid"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet

    val lr = left.select("k", "sec", "lid").as[(String, Long, Long)].collect()
    val rr = right.select("k", "sec", "rid").as[(String, Long, Long)].collect()
    val brute = (for {
      (lk, lsec, lid) <- lr; (rk, rsec, rid) <- rr
      if lk == rk && rsec >= lsec - 3600 && rsec <= lsec
    } yield (lid, rid)).toSet
    assert(got == brute)
    assert(brute.contains((2L, 10L)))  // exactly window-width apart
    assert(got.nonEmpty)
  }

  test("rangeJoin plans as an equi join (no nested-loop, no cartesian)") {
    val left = Seq(("a", 1L)).toDF("k", "lid")
      .withColumn("lt", expr("timestamp_seconds(lid)"))
    val right = Seq(("a", 2L)).toDF("k", "rid")
      .withColumn("rt", expr("timestamp_seconds(rid)"))
    val plan = Temporal.rangeJoin(left, "k", "lt", right, "k", "rt",
      -60L, 0L, Seq("rid")).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("asofJoinBucketed == asofJoin bit-for-bit across bucket widths, " +
       "inclusive and exclusive, hot key + null-payload lefts") {
    // one hot key with 200 events over 2000s, rights every 7s; bucket
    // widths chosen so matches land within-bucket, cross-bucket, and
    // many-buckets-back (the t<35 lefts with W=10 reach back via carry)
    val left = ((1 to 200).map(i => ("hot", i * 10L, i.toLong)) ++
      Seq(("cold", 55L, 900L), ("never", 5L, 901L)))
      .toDF("k", "sec", "lid")
      .withColumn("lt", expr("timestamp_seconds(sec)")).drop("sec")
    val right = ((1 to 280).map(i => ("hot", i * 7L, 1000L + i, i * 1.5)) ++
      Seq(("cold", 55L, 2000L, 9.9), ("cold", 55L, 2001L, 8.8))) // same-ts tie
      .toDF("k", "sec", "rid", "px")
      .withColumn("rt", expr("timestamp_seconds(sec)")).drop("sec")

    for (inclusive <- Seq(true, false); w <- Seq(10L, 60L, 3600L)) {
      val want = Temporal.asofJoin(left, "k", "lt", right, "k", "rt",
          payload = Seq("rid", "px"), tieBreak = "rid", inclusive = inclusive)
        .select("lid", "rid", "px")
        .as[(Long, Option[Long], Option[Double])].collect().toSet
      val got = Temporal.asofJoinBucketed(left, "k", "lt", right, "k", "rt",
          payload = Seq("rid", "px"), tieBreak = "rid", bucketSec = w,
          inclusive = inclusive)
        .select("lid", "rid", "px")
        .as[(Long, Option[Long], Option[Double])].collect().toSet
      assert(got == want, s"inclusive=$inclusive W=$w: " +
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("asofJoinBucketed plans no cartesian/nested-loop; windows are " +
       "(key, bucket)-partitioned except the bucket-summary carry") {
    val left = Seq(("a", 1L)).toDF("k", "lid")
      .withColumn("lt", expr("timestamp_seconds(lid)"))
    val right = Seq(("a", 2L)).toDF("k", "rid")
      .withColumn("rt", expr("timestamp_seconds(rid)"))
    val plan = Temporal.asofJoinBucketed(left, "k", "lt", right, "k", "rt",
        payload = Seq("rid"), tieBreak = "rid", bucketSec = 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    // the event-sized window must carry the bucket column in its partition
    // spec — a Window partitioned on the key alone over raw events would be
    // the hot-key straggler this operator exists to avoid. Exactly ONE
    // key-only window is allowed: the cross-bucket carry over bucket
    // summaries (history compressed by the per-bucket aggregate).
    val windows = plan.linesIterator.filter(_.contains("Window [")).toList
    val (bucketed, keyOnly) = windows.partition(_.contains("__k1"))
    assert(bucketed.nonEmpty, windows.mkString("\n"))
    assert(keyOnly.size == 1, windows.mkString("\n"))
  }

  test("asofJoinNative == asofJoin bit-for-bit: hot key, ties, null keys, " +
       "null timestamps, inclusive and exclusive") {
    val left = ((1 to 200).map(i => (Option("hot"), Option(i * 10L), i.toLong)) ++
      Seq((Some("cold"), Some(55L), 900L), (Some("never"), Some(5L), 901L),
        (None: Option[String], Some(30L), 902L), (Some("hot"), None: Option[Long], 903L)))
      .toDF("k", "sec", "lid")
      .withColumn("lt", expr("timestamp_seconds(sec)")).drop("sec")
    val right = ((1 to 280).map(i => (Option("hot"), Option(i * 7L), 1000L + i, i * 1.5)) ++
      Seq((Some("cold"), Some(55L), 2000L, 9.9), (Some("cold"), Some(55L), 2001L, 8.8),
        (None: Option[String], Some(20L), 2002L, 7.7),
        (Some("hot"), None: Option[Long], 2003L, 6.6)))
      .toDF("k", "sec", "rid", "px")
      .withColumn("rt", expr("timestamp_seconds(sec)")).drop("sec")

    for (inclusive <- Seq(true, false)) {
      val want = Temporal.asofJoin(left, "k", "lt", right, "k", "rt",
          payload = Seq("rid", "px"), tieBreak = "rid", inclusive = inclusive)
        .select("lid", "rid", "px")
        .as[(Long, Option[Long], Option[Double])].collect().toSet
      val got = Temporal.asofJoinNative(left, "k", "lt", right, "k", "rt",
          payload = Seq("rid", "px"), tieBreak = "rid", inclusive = inclusive)
        .select("lid", "rid", "px")
        .as[(Long, Option[Long], Option[Double])].collect().toSet
      assert(got == want, s"inclusive=$inclusive: " +
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("asofJoinNative plans the custom exec — no window, no built-in join — " +
       "and answers the canonical vectors") {
    val df = Temporal.asofJoinNative(
      trades.select("k", "tt", "tid"), "k", "tt",
      quotes.select("k", "qt", "qid", "px"), "k", "qt",
      payload = Seq("qid", "px"), tieBreak = "qid")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(2000))
    assert(!plan.contains("Window ["), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    val got = df.select("tid", "qid", "px")
      .as[(Long, Option[Long], Option[Double])]
      .collect().map { case (t, q, p) => t -> ((q, p)) }.toMap
    assert(got(100L) == ((None, None)))
    assert(got(101L) == ((Some(1L), Some(1.0))))
    assert(got(102L) == ((Some(3L), Some(3.0))))
    assert(got(103L) == ((Some(4L), Some(4.0))))
    assert(got(104L) == ((None, None)))
  }

  test("asofJoinNative picks the same row as the composition on duplicate " +
       "(key, ts, tieBreak) rights — full-payload-struct tie order") {
    val left = Seq(("k", 30L, 1L)).toDF("k", "sec", "lid")
      .withColumn("lt", expr("timestamp_seconds(sec)"))
    // two rights identical except the payload value: the composition's
    // __p-ascending order always carries the greater payload
    val right = Seq(("k", 10L, 5L, "a"), ("k", 10L, 5L, "b"))
      .toDF("k", "sec", "rid", "pay")
      .withColumn("rt", expr("timestamp_seconds(sec)"))
    val want = Temporal.asofJoin(left.select("k", "lt", "lid"), "k", "lt",
        right.select("k", "rt", "rid", "pay"), "k", "rt",
        payload = Seq("pay"), tieBreak = "rid")
      .select("pay").as[String].head()
    val got = Temporal.asofJoinNative(left.select("k", "lt", "lid"), "k", "lt",
        right.select("k", "rt", "rid", "pay"), "k", "rt",
        payload = Seq("pay"), tieBreak = "rid")
      .select("pay").as[String].head()
    assert(want == "b" && got == "b")
  }

  test("asofJoinNative rejects mismatched key/ts types at build time") {
    val left = Seq((1, 10L, 1L)).toDF("k", "sec", "lid")
      .withColumn("lt", expr("timestamp_seconds(sec)"))
    val right = Seq((1L, 5L, 9L)).toDF("k", "sec", "rid")
      .withColumn("rt", expr("timestamp_seconds(sec)"))
    val ex = intercept[IllegalArgumentException] {
      Temporal.asofJoinNative(left.select("k", "lt", "lid"), "k", "lt",
        right.select("k", "rt", "rid"), "k", "rt",
        payload = Seq("rid"), tieBreak = "rid")
    }
    assert(ex.getMessage.contains("type mismatch"))
  }

  test("asofJoinNativeKeys == asofJoinKeys over a composite key") {
    // (k1, k2) composite: same k1 with different k2 must NOT match
    val left = Seq(("a", 1L, 10L, 1L), ("a", 2L, 10L, 2L),
      ("b", 1L, 20L, 3L), ("a", 1L, 30L, 4L))
      .toDF("k1", "k2", "sec", "lid")
      .withColumn("lt", expr("timestamp_seconds(sec)")).drop("sec")
    val right = Seq(("a", 1L, 5L, 100L), ("a", 2L, 9L, 101L),
      ("a", 1L, 25L, 102L), ("b", 2L, 1L, 103L))
      .toDF("k1", "k2", "sec", "rid")
      .withColumn("rt", expr("timestamp_seconds(sec)")).drop("sec")

    for (inclusive <- Seq(true, false)) {
      val got = Temporal.asofJoinNativeKeys(left, Seq("k1", "k2"), "lt",
          right, Seq("k1", "k2"), "rt", payload = Seq("rid"),
          tieBreak = "rid", inclusive = inclusive)
        .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
      assert(got == Map(
        1L -> Some(100L),  // (a,1) at 10 → rid 100 at 5
        2L -> Some(101L),  // (a,2) at 10 → rid 101 at 9 (not (a,1)'s rows)
        3L -> None,        // (b,1) has no right rows — (b,2) must not leak
        4L -> Some(102L))) // (a,1) at 30 → rid 102 at 25
    }
  }

  test("asofJoinNative disambiguates self-join inputs and supports outPrefix") {
    val base = quotes.select("k", "qt", "qid", "px")
    val out = Temporal.asofJoinNative(
      base.select("k", "qt", "qid"), "k", "qt",
      base, "k", "qt",
      payload = Seq("px"), tieBreak = "qid", outPrefix = "m_")
    assert(out.columns.toSeq == Seq("k", "qt", "qid", "m_px"))
    // every quote matches itself-or-the-tied-max at its own timestamp
    val got = out.select("qid", "m_px").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(1.0))
    assert(got(2L).contains(3.0)) // tie at t=20: max qid (3) wins
    assert(got(3L).contains(3.0))
    assert(got(4L).contains(4.0))
  }

  test("asofJoin plans one exchange on the key and no join operator at all") {
    val plan = Temporal.asofJoin(
      trades.select("k", "tt", "tid"), "k", "tt",
      quotes.select("k", "qt", "qid"), "k", "qt",
      payload = Seq("qid"), tieBreak = "qid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asofJoin must not plan a join:\n$plan")
    assert(plan.contains("Window"))
  }
}
