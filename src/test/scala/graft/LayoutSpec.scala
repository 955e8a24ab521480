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

  // independent reference implementation of the xy2d recurrence — the
  // classic driver-side loop the column unroll must reproduce
  private def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("withHilbert matches the reference xy2d recurrence on random points") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(200)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val got = pts.toDF("x", "y")
    val rows = Layout.withHilbert(got, "x", "y", "h", bits = 10)
      .select("x", "y", "h").as[(Long, Long, Long)].collect()
    for ((x, y, h) <- rows)
      assert(h == xy2d(10, x, y), s"($x,$y): got $h want ${xy2d(10, x, y)}")
  }

  test("withHilbert is a bijection over the full order-3 grid") {
    val grid = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)).toDF("x", "y")
    val ds = Layout.withHilbert(grid, "x", "y", "h", bits = 3)
      .select("h").as[Long].collect().sorted.toSeq
    assert(ds == (0L until 64L).toSeq) // every curve position exactly once
  }

  test("consecutive Hilbert positions are grid NEIGHBORS (the no-long-jump " +
       "property Morton order lacks)") {
    val grid = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)).toDF("x", "y")
    val byD = Layout.withHilbert(grid, "x", "y", "h", bits = 4)
      .select("h", "x", "y").as[(Long, Long, Long)].collect()
      .sortBy(_._1).map { case (_, x, y) => (x, y) }
    val jumps = byD.sliding(2).map { case Array((x0, y0), (x1, y1)) =>
      math.abs(x1 - x0) + math.abs(y1 - y0) }.toSeq
    assert(jumps.forall(_ == 1L), s"max step ${jumps.max}")
    // Morton order on the same grid DOES jump (the contrast that makes
    // Hilbert the better clustering curve)
    val byZ = grid.select(col("x"), col("y"),
        Layout.zValue(Seq(col("x"), col("y")), bits = 4).as("z"))
      .select("z", "x", "y").as[(Long, Long, Long)].collect()
      .sortBy(_._1).map { case (_, x, y) => (x, y) }
    val zJumps = byZ.sliding(2).map { case Array((x0, y0), (x1, y1)) =>
      math.abs(x1 - x0) + math.abs(y1 - y0) }.toSeq
    assert(zJumps.max > 1L)
  }

  test("withHilbert masks values beyond `bits` like zValue") {
    val got = Seq((8L, 1L)).toDF("x", "y") // x = 0b1000 with bits=3 → 0
    val h = Layout.withHilbert(got, "x", "y", "h", bits = 3)
      .select("h").as[Long].head()
    assert(h == xy2d(3, 0L, 1L))
  }

  // reference implementation of Skilling's transpose algorithm — the
  // driver-side loop withHilbertN must reproduce
  private def hilbertN(bits: Int, coords: Seq[Long]): Long = {
    val d = coords.size
    val X = coords.toArray
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      for (i <- 0 until d) {
        if ((X(i) & q) != 0) X(0) ^= p
        else { val t = (X(0) ^ X(i)) & p; X(0) ^= t; X(i) ^= t }
      }
      q >>= 1
    }
    for (i <- 1 until d) X(i) ^= X(i - 1)
    var t = 0L
    var qq = 1L << (bits - 1)
    while (qq > 1) { if ((X(d - 1) & qq) != 0) t ^= qq - 1; qq >>= 1 }
    for (i <- 0 until d) X(i) ^= t
    (for (j <- 0 until bits; i <- 0 until d)
      yield ((X(i) >> j) & 1L) << (j * d + (d - 1 - i))).sum
  }

  test("withHilbertN matches the reference Skilling loop on random 3-D points") {
    val rnd = new scala.util.Random(5)
    val pts = Seq.fill(150)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong,
      rnd.nextInt(256).toLong))
    val rows = Layout.withHilbertN(pts.toDF("x", "y", "z"),
        Seq("x", "y", "z"), "h", bits = 8)
      .select("x", "y", "z", "h").as[(Long, Long, Long, Long)].collect()
    for ((x, y, z, h) <- rows)
      assert(h == hilbertN(8, Seq(x, y, z)), s"($x,$y,$z)")
  }

  test("withHilbertN is a bijection with grid-neighbor adjacency over the " +
       "full order-3 3-D grid") {
    val grid = (for (x <- 0L until 8L; y <- 0L until 8L; z <- 0L until 8L)
      yield (x, y, z)).toDF("x", "y", "z")
    val byH = Layout.withHilbertN(grid, Seq("x", "y", "z"), "h", bits = 3)
      .select("h", "x", "y", "z").as[(Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(byH.map(_._1).toSeq == (0L until 512L).toSeq) // bijective
    val steps = byH.sliding(2).map { case Array((_, x0, y0, z0), (_, x1, y1, z1)) =>
      math.abs(x1 - x0) + math.abs(y1 - y0) + math.abs(z1 - z0) }.toSeq
    assert(steps.forall(_ == 1L), s"max jump ${steps.max}") // true Hilbert
  }

  test("hilbert layout prunes a box predicate at least as well as z-order") {
    val n = 1 << 14
    def bitrev10(v: Long): Long =
      (0 until 10).map(i => ((v >> i) & 1L) << (9 - i)).sum
    val base = (0L until n).map { i =>
      (i % 1024, bitrev10((i / 7) % 1024))
    }.toDF("x", "y")
    val parts = 32

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

    val hStats = statsOf(Layout.hilbertByRange(base, "x", "y", bits = 10,
      numFiles = parts))
    val zStats = statsOf(Layout.zorderByRange(base, Seq("x", "y"), bits = 10,
      numFiles = parts))
    // average over a grid of box predicates: Hilbert's tighter per-file
    // rectangles must not lose to Morton, and both must prune hard
    val boxes = for (bx <- 0L until 1024L by 256L; by <- 0L until 1024L by 256L)
      yield (bx, bx + 127L, by, by + 127L)
    val hT = boxes.map { case (a, b, c, dd) => touched(hStats, a, b, c, dd) }.sum
    val zT = boxes.map { case (a, b, c, dd) => touched(zStats, a, b, c, dd) }.sum
    info(s"box-grid partitions touched: hilbert $hT vs z-order $zT " +
      s"of ${parts * boxes.size}")
    assert(hT <= zT, s"hilbert ($hT) should prune at least as well as z ($zT)")
    assert(hT * 3 <= parts * boxes.size,
      s"hilbert pruning too weak: $hT of ${parts * boxes.size}")
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
