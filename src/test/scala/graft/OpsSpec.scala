package graft

import org.apache.spark.sql.functions._
import graft.core.Ops

class OpsSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    // (key, seq, payload)
    ("a", 1, "a1"), ("a", 3, "a3"), ("a", 2, "a2"),
    ("b", 7, "b7"), ("b", 5, "b5"),
    ("c", 9, "c9")
  ).toDF("k", "seq", "v")

  test("latestPerGroup keeps exactly the newest row per key") {
    val got = Ops.latestPerGroup(events, Seq("k"), Seq(col("seq").desc))
      .select("k", "v").as[(String, String)].collect().toSet
    assert(got == Set(("a", "a3"), ("b", "b7"), ("c", "c9")))
  }

  test("victimsPerGroup is the complement of latestPerGroup") {
    val got = Ops.victimsPerGroup(events, Seq("k"), Seq(col("seq").desc))
      .select("v").as[String].collect().toSet
    assert(got == Set("a1", "a2", "b5"))
  }

  test("antiJoinAppend keeps local rows and appends only-absent remote keys") {
    val local = Seq((1, "l1"), (2, "l2")).toDF("id", "v")
    val remote = Seq((2, "r2"), (3, "r3")).toDF("id", "v")
    val got = Ops.antiJoinAppend(local, remote, Seq("id"))
      .as[(Int, String)].collect().toSet
    assert(got == Set((1, "l1"), (2, "l2"), (3, "r3")))
    // idempotence: re-merging the same remote adds nothing
    val again = Ops.antiJoinAppend(
      Ops.antiJoinAppend(local, remote, Seq("id")), remote, Seq("id"))
    assert(again.count() == 3)
  }

  test("conditionalOverwrite only rewrites matching rows") {
    val df = Seq((1, -5.0), (2, 3.0)).toDF("id", "bal")
    val got = Ops.conditionalOverwrite(df, "bal", col("bal") < 0, lit(0.0))
      .as[(Int, Double)].collect().toSet
    assert(got == Set((1, 0.0), (2, 3.0)))
  }

  test("predicateDelete treats null predicate as keep") {
    val df = Seq((1, Some("F")), (2, Some("O")), (3, None))
      .toDF("id", "status")
    val got = Ops.predicateDelete(df, col("status") === "F")
      .select("id").as[Int].collect().toSet
    assert(got == Set(2, 3))
  }

  test("deleteInSubquery removes keys present in victims") {
    val df = Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "v")
    val victims = Seq(Tuple1(2)).toDF("id")
    val got = Ops.deleteInSubquery(df, Seq("id"), victims)
      .select("id").as[Int].collect().toSet
    assert(got == Set(1, 3))
  }

  test("lastWins prefers the higher-priority slice per key") {
    val s1 = Seq(("a", 1, "old-a"), ("b", 1, "old-b")).toDF("k", "seq", "v")
    val s2 = Seq(("a", 1, "new-a")).toDF("k", "seq", "v")
    val got = Ops.lastWins(Seq((s1, 1), (s2, 2)), Seq("k"), Seq(col("seq").desc))
      .select("k", "v").as[(String, String)].collect().toSet
    assert(got == Set(("a", "new-a"), ("b", "old-b")))
  }

  test("exactPercentiles matches Spark's buffering percentile bit-for-bit " +
       "(groups spanning partitions, dup values, size-1 group)") {
    val rows = (1 to 97).map(i => ("g1", (i * 37 % 100).toDouble)) ++
      (1 to 11).map(i => ("g2", (i % 4).toDouble)) ++ // dup-heavy
      Seq(("g3", 42.0)) // single-row group: every p hits the one value
    val df = rows.toDF("g", "v")
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    // numRanges=8 forces groups to SPAN range partitions — the property the
    // operator exists for
    val got = Ops.exactPercentiles(df, Seq("g"), "v", ps, numRanges = 8)
      .select("g", "p", "value").as[(String, Double, Double)]
      .collect().map { case (g, p, v) => (g, p) -> v }.toMap
    val want = df.groupBy("g")
      .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("q"))
      .select(col("g"), posexplode(col("q")))
      .collect().map(r => (r.getString(0), ps(r.getInt(1))) -> r.getDouble(2))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, v) =>
      assert(got(k) == v, s"$k: got ${got(k)}, want $v") // exact, not approx
    }
  }

  test("truncate and addColumnIfAbsent") {
    val df = Seq((1, "x")).toDF("id", "v")
    assert(Ops.truncate(df).count() == 0)
    assert(Ops.addColumnIfAbsent(df, "v2", col("v")).columns.toSeq ==
      Seq("id", "v", "v2"))
    // no-op when present
    assert(Ops.addColumnIfAbsent(df, "v", lit("zzz"))
      .select("v").as[String].head() == "x")
  }

  test("globalRank pinned: ranks stay unique and contiguous when the " +
      "output is persisted (the cross-branch cache hazard regression)") {
    // under a cache boundary the unpinned form's two internal branches
    // can re-evaluate the range exchange with disagreeing partition ids
    // and mint duplicate ranks (measured round 11, nondeterministic);
    // pinned materializes the within frame once. Wide-ish input through
    // a round-robin repartition — the shape that reproduced it.
    val df = spark.range(50000)
      .select((col("id") % 977).as("k"), col("id").as("u"))
      .repartition(8)
    for (_ <- 1 to 3) {
      val ranked = Ops.globalRank(df, Seq(col("k"), col("u")), "rnk",
        pinned = true).persist()
      try {
        val n = ranked.count()
        assert(n == 50000L)
        val distinctRanks = ranked.select("rnk").distinct().count()
        assert(distinctRanks == n, s"duplicate ranks: $distinctRanks != $n")
        val mm = ranked.agg(min("rnk"), max("rnk")).head()
        assert(mm.getLong(0) == 1L && mm.getLong(1) == n)
      } finally ranked.unpersist()
    }
  }

  test("globalRank DEFAULT is pinned: a persist consumer that never " +
      "heard of the cache hazard still gets unique contiguous ranks") {
    // round-12 ADVICE (confirmed): pinned was opt-in, so any future
    // persist/localCheckpoint consumer silently inherited the
    // nondeterministic-rank hazard. The default is now pinned = true —
    // this exercises the DEFAULT path under the reproducing shape.
    val df = spark.range(50000)
      .select((col("id") % 977).as("k"), col("id").as("u"))
      .repartition(8)
    for (_ <- 1 to 3) {
      val ranked = Ops.globalRank(df, Seq(col("k"), col("u")), "rnk")
        .persist()
      try {
        val n = ranked.count()
        assert(n == 50000L)
        val distinctRanks = ranked.select("rnk").distinct().count()
        assert(distinctRanks == n, s"duplicate ranks: $distinctRanks != $n")
        val mm = ranked.agg(min("rnk"), max("rnk")).head()
        assert(mm.getLong(0) == 1L && mm.getLong(1) == n)
      } finally ranked.unpersist()
    }
  }

  test("exactPercentiles DEFAULT is pinned: a persist consumer gets " +
      "stable, correct percentiles (same cache hazard as globalRank)") {
    // round-13 verdict: the sibling operator shares globalRank's
    // two-branch range-exchange hazard but kept the unsafe opt-in
    // default. Default is now pinned = true — exercise the DEFAULT path
    // under a persist consumer against Spark's buffering percentile.
    val df = spark.range(50000)
      .select((col("id") % 7).as("g"),
        (col("id") * 37 % 10007).cast("double").as("v"))
      .repartition(8)
    val ps = Seq(0.1, 0.5, 0.9)
    val want = df.groupBy("g")
      .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("q"))
      .select(col("g"), posexplode(col("q")))
      .select(col("g"), element_at(typedLit(ps), col("pos") + 1).as("p"),
        col("col").as("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    for (_ <- 1 to 3) {
      val got = Ops.exactPercentiles(df, Seq("g"), "v", ps, numRanges = 8)
        .persist()
      try {
        assert(got.count() == 7L * ps.size)
        for (r <- got.collect()) {
          val k = (r.getLong(r.fieldIndex("g")),
            r.getDouble(r.fieldIndex("p")))
          assert(r.getDouble(r.fieldIndex("value")) == want(k),
            s"group/p $k diverged under persist")
        }
      } finally got.unpersist()
    }
  }
}
