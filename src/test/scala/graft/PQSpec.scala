package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Product quantization: encode/ADC semantics against hand-computable
  * ground truth, trained-codebook convergence, and determinism of the
  * fixed-point training arithmetic.
  */
class PQSpec extends SparkSpec {
  import spark.implicits._

  private val m = 2
  private val subDim = 2

  // codebook with two well-separated entries per subspace: sub 0 splits on
  // the first pair of dims, sub 1 on the second
  private val cb = Seq(
    (0, 0, Seq(0.0, 0.0)), (0, 1, Seq(10.0, 10.0)),
    (1, 0, Seq(0.0, 0.0)), (1, 1, Seq(-10.0, -10.0)))
  private def cbDf = Similarity.pqCodebookDf(spark, cb)

  // vectors constructed dim-pair by dim-pair near specific codebook entries
  private val vecs = Seq(
    (1L, Seq(0.1, -0.1, 0.2, 0.1)),    // codes (0, 0)
    (2L, Seq(9.8, 10.1, 0.0, -0.3)),   // codes (1, 0)
    (3L, Seq(10.2, 9.7, -9.9, -10.2)), // codes (1, 1)
    (4L, Seq(0.3, 0.0, -10.1, -9.8)))  // codes (0, 1)
  private def vecDf = vecs.toDF("id", "v")

  test("pqEncode assigns each subvector to its nearest codebook entry") {
    val got = Similarity.pqEncode(vecDf, cbDf, m, subDim)
      .orderBy("id", "sub")
      .as[(Long, Int, Int)].collect().toSeq
    assert(got === Seq(
      (1L, 0, 0), (1L, 1, 0),
      (2L, 0, 1), (2L, 1, 0),
      (3L, 0, 1), (3L, 1, 1),
      (4L, 0, 0), (4L, 1, 1)))
  }

  test("pqEncode breaks exact-distance ties on the smaller code id") {
    val tied = Similarity.pqCodebookDf(spark,
      Seq((0, 0, Seq(1.0, 0.0)), (0, 1, Seq(-1.0, 0.0))))
    val got = Similarity.pqEncode(
        Seq((7L, Seq(0.0, 5.0))).toDF("id", "v"), tied, 1, 2)
      .as[(Long, Int, Int)].collect().toSeq
    assert(got === Seq((7L, 0, 0)))
  }

  test("pqAdcTopK with an exactly-reconstructing codebook ranks by true " +
      "squared L2 distance") {
    // every distinct subvector is its own code → ADC distance == exact
    // squared L2 between the original vectors
    val subs = vecs.flatMap { case (_, v) =>
      Seq(v.take(2), v.drop(2)) }.distinct
    val exact = (for {
      s <- 0 until m
      (sv, c) <- subs.zipWithIndex
    } yield (s, c, sv))
    val exactCb = Similarity.pqCodebookDf(spark, exact)
    val codes = Similarity.pqEncode(vecDf, exactCb, m, subDim)
    val got = Similarity.pqAdcTopK(codes, exactCb,
        vecDf.filter(col("id") === 1L), m, subDim, k = 3)
      .orderBy("rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // per-subspace e4 rounding happens BEFORE the sum, mirroring the LUT
    def adc(a: Seq[Double], b: Seq[Double]): Long =
      Seq((a.take(2), b.take(2)), (a.drop(2), b.drop(2))).map {
        case (x, y) =>
          val d = x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum
          math.floor(d * 1e4 + 0.5).toLong
      }.sum
    val v1 = vecs.head._2
    val expect = vecs.tail
      .map { case (id, v) => (id, adc(v1, v)) }
      .sortBy { case (id, dist) => (dist, id) }
      .zipWithIndex
      .map { case ((id, dist), i) => (1L, id, dist, (i + 1).toLong) }
    assert(got === expect)
  }

  test("ivfPqTopK with every cell probed equals pqAdcTopK over the corpus") {
    val data = (0 until 40).map { i =>
      (i.toLong, Seq(math.sin(i * 1.7), math.cos(i * 0.9),
        math.sin(i * 0.31 + 1), math.cos(i * 2.3 + 2)))
    }.toDF("id", "v")
    val queries = data.filter(col("id") % 10 === 0)
    val cents = Similarity.buildIvf(data, numCells = 4, iters = 1)
    val viaIvf = Similarity.ivfPqTopK(data, cents, cbDf, queries,
        nprobe = 4, m = m, subDim = subDim, k = 3)
      .orderBy("vec_id", "rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val direct = Similarity.pqAdcTopK(
        Similarity.pqEncode(data, cbDf, m, subDim), cbDf, queries,
        m, subDim, k = 3)
      .orderBy("vec_id", "rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(viaIvf === direct)
    assert(viaIvf.nonEmpty)
  }

  test("ivfPqTopK with nprobe=1 returns at most k candidates per query, " +
      "all from probed cells, ranked densely") {
    val data = (0 until 40).map { i =>
      (i.toLong, Seq(math.sin(i * 1.7), math.cos(i * 0.9),
        math.sin(i * 0.31 + 1), math.cos(i * 2.3 + 2)))
    }.toDF("id", "v")
    val queries = data.filter(col("id") % 10 === 0)
    val cents = Similarity.buildIvf(data, numCells = 4, iters = 1)
    val got = Similarity.ivfPqTopK(data, cents, cbDf, queries,
        nprobe = 1, m = m, subDim = subDim, k = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val byQ = got.groupBy(_._1)
    assert(byQ.nonEmpty)
    for ((_, rows) <- byQ) {
      assert(rows.length <= 3)
      assert(rows.map(_._4).sorted === (1 to rows.length).map(_.toLong))
    }
  }

  test("persisted IVF-PQ index: indexed query equals the in-memory path; " +
      "scan reads codes, not embeddings") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    val data = (0 until 40).map { i =>
      (i.toLong, Seq(math.sin(i * 1.7), math.cos(i * 0.9),
        math.sin(i * 0.31 + 1), math.cos(i * 2.3 + 2)))
    }.toDF("id", "v")
    val queries = data.filter(col("id") % 10 === 0)
    val cents = Similarity.buildIvf(data, numCells = 4, iters = 1)
    Similarity.writeIvfPqIndex(data, cents, cbDf, dir, m, subDim)
    val direct = Similarity.ivfPqTopK(data, cents, cbDf, queries,
        nprobe = 2, m = m, subDim = subDim, k = 3)
      .orderBy("vec_id", "rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val viaIndex = Similarity.ivfPqTopKIndexed(spark, dir, queries,
      nprobe = 2, m = m, subDim = subDim, k = 3)
    val got = viaIndex.orderBy("vec_id", "rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === direct)
    assert(got.nonEmpty)
    // column pruning: the assigned scan must not read the stored float
    // payload — ADC works from codes alone (the point of PQ)
    val p = viaIndex.queryExecution.executedPlan.toString
    val assignedScans = p.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("codes")).toList
    assert(assignedScans.nonEmpty, p.take(3000))
    assert(assignedScans.forall(!_.contains("vb")),
      "assigned scan reads the embedding column:\n" +
        assignedScans.mkString("\n"))
    // partition pruning: the probe join dynamically prunes cid partitions
    // (same contract as the plain IVF index, PlanContractSpec)
    assert(p.contains("dynamicpruningexpression"),
      "probe join must dynamically prune cid partitions:\n" +
        p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
  }

  test("ivfPqTopKRefined with all cells probed and a corpus-wide " +
      "shortlist recovers exact bruteForceTopK ordering") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_r").toString
    val data = (0 until 40).map { i =>
      (i.toLong, Seq(math.sin(i * 1.7), math.cos(i * 0.9),
        math.sin(i * 0.31 + 1), math.cos(i * 2.3 + 2)))
    }.toDF("id", "v")
    val queries = data.filter(col("id") % 10 === 0)
    val cents = Similarity.buildIvf(data, numCells = 4, iters = 1)
    Similarity.writeIvfPqIndex(data, cents, cbDf, dir, m, subDim)
    val refined = Similarity.ivfPqTopKRefined(spark, dir, queries,
        nprobe = 4, m = m, subDim = subDim, shortlist = 39, k = 3)
      .orderBy("vec_id", "rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val exact = Similarity.bruteForceTopK(data, queries, k = 3)
      .orderBy("vec_id", "rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(refined === exact)
    assert(refined.nonEmpty)
  }

  test("ivfPqTopKResidual: within-cell ADC distances are EXACT when the " +
      "codebook reconstructs residuals (the residual-encoding payoff)") {
    // lattice: v = centroid + (one offset per subspace); codebook = the
    // offsets → residual encode is exact → ||qres − decode||² is the true
    // ||q − x||², sub-by-sub
    val cents = Seq((0L, Seq(10.0, 10.0, 10.0, 10.0)),
      (1L, Seq(-10.0, -10.0, -10.0, -10.0))).toDF("id", "v")
    val rcb = Seq(
      (0, 0, Seq(1.0, 0.0)), (0, 1, Seq(0.0, 2.0)),
      (1, 0, Seq(3.0, 0.0)), (1, 1, Seq(0.0, 4.0)))
    val rcbDf = Similarity.pqCodebookDf(spark, rcb)
    val vecs = for {
      (cell, base) <- Seq(0 -> 10.0, 1 -> -10.0)
      (a, bI) <- Seq((0, 0), (0, 1), (1, 0), (1, 1))
    } yield {
      val o0 = rcb(a)._3; val o1 = rcb(2 + bI)._3
      ((cell * 4 + a * 2 + bI).toLong,
        Seq(base + o0(0), base + o0(1), base + o1(0), base + o1(1)))
    }
    val data = vecs.toDF("id", "v")
    val queries = data.filter(col("id").isin(0L, 5L))
    val got = Similarity.ivfPqTopKResidual(data, cents, rcbDf, queries,
        nprobe = 1, m = m, subDim = subDim, k = 3)
      .orderBy("vec_id", "rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // expected: true sub-rounded squared distances to same-cell others
    def adc(a: Seq[Double], b: Seq[Double]): Long =
      Seq((a.take(2), b.take(2)), (a.drop(2), b.drop(2))).map {
        case (x, y) =>
          val d = x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum
          math.floor(d * 1e4 + 0.5).toLong
      }.sum
    val byId = vecs.toMap
    val expect = Seq(0L, 5L).flatMap { q =>
      val cell = q / 4
      vecs.filter(v => v._1 / 4 == cell && v._1 != q)
        .map { case (id, v) => (id, adc(byId(q), v)) }
        .sortBy { case (id, dist) => (dist, id) }
        .zipWithIndex
        .map { case ((id, dist), i) => (q, id, dist, (i + 1).toLong) }
    }
    assert(got === expect)
  }

  test("residual persisted index: indexed equals in-memory; raw and " +
      "residual query paths refuse each other's format") {
    val data = (0 until 40).map { i =>
      (i.toLong, Seq(math.sin(i * 1.7), math.cos(i * 0.9),
        math.sin(i * 0.31 + 1), math.cos(i * 2.3 + 2)))
    }.toDF("id", "v")
    val queries = data.filter(col("id") % 10 === 0)
    val cents = Similarity.buildIvf(data, numCells = 4, iters = 1)
    val dirR = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_res").toString
    Similarity.writeIvfPqIndex(data, cents, cbDf, dirR, m, subDim,
      residual = true)
    val direct = Similarity.ivfPqTopKResidual(data, cents, cbDf, queries,
        nprobe = 2, m = m, subDim = subDim, k = 3)
      .orderBy("vec_id", "rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val viaIndex = Similarity.ivfPqTopKResidualIndexed(spark, dirR,
        queries, nprobe = 2, m = m, subDim = subDim, k = 3)
      .orderBy("vec_id", "rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(viaIndex === direct)
    assert(viaIndex.nonEmpty)
    // format guards both ways
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopKIndexed(spark, dirR, queries, 2, m, subDim, 3)
    }
    val dirRaw = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_raw2").toString
    Similarity.writeIvfPqIndex(data, cents, cbDf, dirRaw, m, subDim)
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopKResidualIndexed(spark, dirRaw, queries, 2, m,
        subDim, 3)
    }
  }

  test("pqTrain converges to per-subspace cluster means on separated data") {
    // 20 vectors in two tight clusters per subspace; train k=2 per sub
    val data = (0 until 20).map { i =>
      val hi = i % 2 == 0
      (i.toLong, Seq(
        if (hi) 10.0 + i * 0.01 else 0.0 + i * 0.01,
        if (hi) 10.0 else 0.0,
        if (hi) -10.0 else 5.0,
        if (hi) -10.0 + i * 0.01 else 5.0))
    }.toDF("id", "v")
    val trained = Similarity.pqTrain(data, m, subDim, numCodes = 2, iters = 3)
      .orderBy("sub", "code")
      .as[(Int, Int, Seq[Double])].collect()
    assert(trained.length === 4)
    // each subspace ends with one centroid near each cluster mean
    for (s <- 0 until m) {
      val cvs = trained.filter(_._1 == s).map(_._3)
      val hiMean = data.as[(Long, Seq[Double])].collect()
        .filter(_._1 % 2 == 0).map(_._2.slice(s * 2, s * 2 + 2))
      def mean(rows: Array[Seq[Double]], d: Int) =
        rows.map(_(d)).sum / rows.length
      val target = Seq(mean(hiMean, 0), mean(hiMean, 1))
      assert(cvs.exists(cv =>
        cv.zip(target).forall { case (a, b) => math.abs(a - b) < 0.01 }),
        s"sub $s: no centroid near $target in ${cvs.toSeq}")
    }
  }

  test("pqTrain is deterministic (fixed-point means, hash-sampled seeds)") {
    val data = (0 until 50)
      .map(i => (i.toLong, Seq(i * 0.7 % 5, i * 1.3 % 7, i * 0.3 % 3,
        i * 2.1 % 11))).toDF("id", "v")
    def run() = Similarity.pqTrain(data, m, subDim, numCodes = 4, iters = 2)
      .orderBy("sub", "code")
      .as[(Int, Int, Seq[Double])].collect().toSeq
    assert(run() === run())
  }

  test("encode with a trained codebook separates the clusters") {
    // jittered so every vector is distinct: identical seed VALUES would
    // make assignment tie everywhere and legitimately kill one code
    val data = (0 until 20).map { i =>
      val hi = i % 2 == 0
      (i.toLong, Seq(
        (if (hi) 10.0 else 0.0) + i * 0.01,
        (if (hi) 10.0 else 0.0) - i * 0.01,
        (if (hi) -10.0 else 5.0) + i * 0.01,
        (if (hi) -10.0 else 5.0) - i * 0.01))
    }.toDF("id", "v")
    val trained = Similarity.pqTrain(data, m, subDim, numCodes = 2, iters = 4)
    val codes = Similarity.pqEncode(data, trained, m, subDim)
      .as[(Long, Int, Int)].collect()
    for (s <- 0 until m) {
      val bySub = codes.filter(_._2 == s)
      val hiCodes = bySub.filter(_._1 % 2 == 0).map(_._3).toSet
      val loCodes = bySub.filter(_._1 % 2 == 1).map(_._3).toSet
      assert(hiCodes.size === 1 && loCodes.size === 1 && hiCodes != loCodes,
        s"sub $s: clusters not separated ($hiCodes vs $loCodes)")
    }
  }

  test("pqDecode reconstructs the chosen centroids in subspace order") {
    val y = Similarity.pqDecode(
        Similarity.pqEncode(vecDf, cbDf, m, subDim), cbDf, m, subDim)
      .orderBy("id").as[(Long, Seq[Double])].collect().toSeq
    assert(y === Seq(
      (1L, Seq(0.0, 0.0, 0.0, 0.0)),
      (2L, Seq(10.0, 10.0, 0.0, 0.0)),
      (3L, Seq(10.0, 10.0, -10.0, -10.0)),
      (4L, Seq(0.0, 0.0, -10.0, -10.0))))
  }

  test("procrustesRotation recovers a planted orthogonal map and is " +
      "orthogonal itself") {
    // y = Q·x for a planted 4-D rotation Q (two independent 2-D plane
    // rotations): Procrustes on M = Σ x·yᵀ must return Q (the unique
    // argmax of tr(R·M) when Σ x·xᵀ is full rank)
    val th1 = 0.5; val th2 = -1.1
    val q = Seq(
      Seq(math.cos(th1), -math.sin(th1), 0.0, 0.0),
      Seq(math.sin(th1), math.cos(th1), 0.0, 0.0),
      Seq(0.0, 0.0, math.cos(th2), -math.sin(th2)),
      Seq(0.0, 0.0, math.sin(th2), math.cos(th2)))
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(200)(Seq.fill(4)(rnd.nextGaussian()))
    val mM = Seq.tabulate(4, 4)((i, j) =>
      xs.map(x => x(i) * q(j).zip(x).map { case (a, b) => a * b }.sum).sum)
    val r = Similarity.procrustesRotation(mM)
    for (i <- 0 until 4; j <- 0 until 4) {
      assert(math.abs(r(i)(j) - q(i)(j)) < 1e-9, s"R($i)($j)")
      val dot = (0 until 4).map(k => r(i)(k) * r(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"RRt($i)($j) = $dot")
    }
  }

  test("opqTrainNP lowers quantization error on a cross-subspace-" +
      "correlated corpus and never returns a non-orthogonal rotation") {
    // corpus whose dominant variance direction straddles the subspace
    // split (the OPQ regime): coordinate pairs (1,3) and (2,4) move
    // together, so contiguous pqSplit wastes codes on shared variance
    val rnd = new scala.util.Random(5)
    val data = Seq.tabulate(300) { i =>
      val t1 = rnd.nextGaussian() * 5; val t2 = rnd.nextGaussian() * 4
      (i.toLong, Seq(t1 + rnd.nextGaussian() * 0.1,
        t2 + rnd.nextGaussian() * 0.1,
        t1 + rnd.nextGaussian() * 0.1,
        t2 + rnd.nextGaussian() * 0.1))
    }.toDF("id", "v").localCheckpoint(true)
    def qErr(rot: Seq[Seq[Double]],
             cb: org.apache.spark.sql.DataFrame): Double = {
      val xr = data.select(col("id"),
        Similarity.rotateExpr(col("v"), rot).as("v")).localCheckpoint(true)
      val y = Similarity.pqDecode(
        Similarity.pqEncode(xr, cb, m, subDim), cb, m, subDim)
      xr.join(y, Seq("id"))
        .select(Similarity.sqDist(col("v"), col("y")).as("d"))
        .agg(sum("d")).head().getDouble(0)
    }
    val ident = Seq.tabulate(4, 4)((i, j) => if (i == j) 1.0 else 0.0)
    val rawCb = Similarity.pqTrain(data, m, subDim, numCodes = 4, iters = 2)
    val rawErr = qErr(ident, rawCb)
    val (rot, cbNp) = Similarity.opqTrainNP(data, dim = 4, m = m,
      subDim = subDim, numCodes = 4, pqIters = 2, altIters = 3)
    for (i <- 0 until 4; j <- 0 until 4) {
      val dot = (0 until 4).map(k => rot(i)(k) * rot(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"rotation not orthogonal at ($i, $j): $dot")
    }
    val npErr = qErr(rot, cbNp)
    assert(npErr < rawErr,
      s"NP-OPQ error $npErr did not improve on raw PQ $rawErr")
  }

  test("crossMoment: exact decimal sums match a local reference and an " +
      "over-BIGINT accumulation fails loudly instead of wrapping") {
    // parity on an ordinary corpus: m_e6(i,j) = Σ floor(x_i·y_j·1e6+0.5)
    val rnd = new scala.util.Random(17)
    val pairs = Seq.tabulate(120) { i =>
      (i.toLong, Seq.fill(3)(rnd.nextGaussian()),
        Seq.fill(3)(rnd.nextGaussian()))
    }
    val xs = pairs.map(p => (p._1, p._2)).toDF("id", "v")
    val ys = pairs.map(p => (p._1, p._3)).toDF("id", "y")
    val got = Similarity.crossMoment(xs, ys, dim = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (i <- 1 to 3; j <- 1 to 3) {
      val want = pairs.map(p =>
        math.floor(p._2(i - 1) * p._3(j - 1) * 1e6 + 0.5).toLong).sum
      assert(got((i, j)) == want, s"cell ($i,$j): ${got((i, j))} != $want")
    }
    // overflow: 300 rows of 3e5·3e5 products = Σ 2.7e19 e6-units > 2⁶³.
    // The round-12 ADVICE hazard: a plain BIGINT sum wraps SILENTLY here
    // (corrupting the OPQ rotation); the decimal(38,0) sum + loud guard
    // must raise instead.
    val bigv = Seq.tabulate(300)(i => (i.toLong, Seq(3e5))).toDF("id", "v")
    val bigy = Seq.tabulate(300)(i => (i.toLong, Seq(3e5))).toDF("id", "y")
    val ex = intercept[Exception] {
      Similarity.crossMoment(bigv, bigy, dim = 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("crossMoment")),
      s"expected a loud crossMoment overflow error, got: $ex")
  }
}
