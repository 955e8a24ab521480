package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (hand-checked vectors)") {
    // x=0b11, y=0b01, 2 bits each: z = x0<<0 | y0<<1 | x1<<2 | y1<<3
    //   = 1 | 1<<1 | 1<<2 | 0<<3 = 0b0111 = 7
    val got = Seq((3L, 1L), (0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L))
      .toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), bits = 2).as("z"))
      .as[Long].collect().toSeq
    assert(got == Seq(7L, 0L, 1L, 2L, 15L))
  }

  test("zValue masks values beyond `bits` instead of colliding dimensions") {
    // x = 4 = 0b100 with bits=2 keeps only 0b00
    val got = Seq((4L, 1L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), bits = 2).as("z"))
      .as[Long].head()
    assert(got == 2L) // y's low bit at position 1 only
  }

  test("scaleToBits rank-scales distinct values across cells; a tie group " +
       "shares one cell") {
    // heavily skewed input: 900 zeros + 100 distinct large values
    val df = (Seq.fill(900)(0L) ++ (1 to 100).map(i => 1000000L + i))
      .toDF("v")
    val rows = Layout.scaleToBits(df, "v", "s", bits = 4)
      .select("v", "s").as[(Long, Long)].collect()
    val scaled = rows.map(_._2)
    assert(scaled.forall(s => s >= 0 && s < 16))
    assert(scaled.max == 15L) // top rank reaches the top cell
    // the 900-zero tie group is ONE value — deterministically one cell
    // (its min rank), not arrival-order-spread across cells
    assert(rows.filter(_._1 == 0L).map(_._2).distinct.toSeq == Seq(0L))
    // the distinct large values spread over the upper cells by rank
    // (min-max scaling would collapse them against the 1e6 gap)
    assert(rows.filter(_._1 > 0L).map(_._2).distinct.length >= 3)
  }

  test("scaleToBits gives equal values the same cell (tie determinism)") {
    val df = (Seq.fill(100)(7L) ++ Seq.fill(100)(9L) ++ Seq(1L, 99L)).toDF("v")
    val cells = Layout.scaleToBits(df, "v", "s", bits = 6)
      .groupBy("v").agg(countDistinct("s").as("nc"), min("s").as("cell"))
      .select("v", "nc").as[(Long, Long)].collect().toMap
    // every tie group maps to exactly one cell — no arrival-order leak
    assert(cells.values.forall(_ == 1L), cells.toString)
  }

  test("z-ordered layout intersects ~sqrt-fraction of partitions on a box " +
       "predicate where a single-column sort intersects all of them") {
    val n = 1 << 14
    // two independent uniform dimensions (bit-reverse decorrelates y)
    def bitrev10(v: Long): Long =
      (0 until 10).map(i => ((v >> i) & 1L) << (9 - i)).sum
    val base = (0L until n).map { i =>
      (i % 1024, bitrev10((i / 7) % 1024))
    }.toDF("x", "y")
    val parts = 32

    // per-partition (min,max) of both dims = exactly the file stats a
    // lake would keep; a box predicate can skip a partition iff its
    // stats-rectangle misses the box
    def statsOf(df: org.apache.spark.sql.DataFrame): Array[(Long, Long, Long, Long)] =
      df.withColumn("__p", spark_partition_id())
        .groupBy("__p")
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .select("x0", "x1", "y0", "y1")
        .as[(Long, Long, Long, Long)].collect()

    def touched(st: Array[(Long, Long, Long, Long)],
                bx0: Long, bx1: Long, by0: Long, by1: Long): Int =
      st.count { case (x0, x1, y0, y1) =>
        x1 >= bx0 && x0 <= bx1 && y1 >= by0 && y0 <= by1 }

    val zed = Layout.zorderByRange(base, Seq("x", "y"), bits = 10,
      numFiles = parts)
    val xSorted = base.repartitionByRange(parts, col("x"))
      .sortWithinPartitions("x")
    val zStats = statsOf(zed)
    val xStats = statsOf(xSorted)

    // (a) predicate on the NON-sorted dimension (y only, one-eighth
    // width): the x-sorted layout cannot prune AT ALL — every partition's
    // y-range is full-width — while the z layout keeps y-ranges tight
    val zY = touched(zStats, 0L, 1023L, 256L, 383L)
    val xY = touched(xStats, 0L, 1023L, 256L, 383L)
    assert(xY == parts, s"x-sort should touch all partitions on y ($xY)")
    assert(zY * 2 <= parts,
      s"z-order touched $zY of $parts partitions on a y-only predicate")

    // (b) box on BOTH dims: the x-sort prunes on x (the box is 1/8 of x),
    // z prunes on both — z must stay in the same league, not regress
    val zBox = touched(zStats, 256L, 383L, 256L, 383L)
    val xBox = touched(xStats, 256L, 383L, 256L, 383L)
    assert(zBox <= xBox + 2,
      s"z-order box pruning ($zBox) regressed vs x-sort ($xBox)")

    info(s"y-only predicate: z-order $zY/$parts vs x-sort $xY/$parts; " +
      s"box: z-order $zBox/$parts vs x-sort $xBox/$parts")

    // and the z layout loses nothing: same rows
    assert(zed.count() == n)
  }
}
