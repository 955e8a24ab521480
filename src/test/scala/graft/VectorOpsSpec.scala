package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorAvg
import graft.operators.{Multimodal, Similarity}

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("VectorAvg aggregates element-wise means (typed path)") {
    val ds = Seq(
      ("a", Array(1.0, 2.0)), ("a", Array(3.0, 4.0)), ("b", Array(10.0, 0.0))
    ).toDS()
    val got = ds.groupByKey(_._1).mapValues(_._2)
      .agg(VectorAvg.toColumn.name("c"))
      .collect().toMap
    assert(got("a").toSeq == Seq(2.0, 3.0))
    assert(got("b").toSeq == Seq(10.0, 0.0))
  }

  test("kmeansStep computes exact fixed-point centroids per cell") {
    val vecs = Seq(
      (0L, Seq(1.0, 1.0)), (1L, Seq(1.0, 3.0)),   // near centroid 0
      (2L, Seq(-1.0, -1.0)), (3L, Seq(-3.0, -1.0)) // near centroid 2
    ).toDF("id", "v")
    val cent = vecs.filter(col("id") % 2 === 0)
    val got = Similarity.gatherCentroids(Similarity.kmeansStep(vecs, cent))
      .as[(Long, Seq[Double])].collect().toMap
    assert(got(0L) == Seq(1.0, 2.0))
    assert(got(2L) == Seq(-2.0, -1.0))
  }

  test("buildIvf converges to cluster means; index search matches brute force") {
    // two tight clusters around (10,0) and (0,10)
    val vecs = ((0 until 20).map(i => (i.toLong, Seq(10.0 + (i % 5) * 0.1, 0.1 * i))) ++
      (20 until 40).map(i => (i.toLong, Seq(0.1 * (i - 20), 10.0 + (i % 5) * 0.1))))
      .toDF("id", "v")
    val index = Similarity.buildIvf(vecs, numCells = 2, iters = 2)
    val cents = index.select(expr("transform(v, x -> cast(x as double))"))
      .as[Seq[Double]].collect()
    assert(cents.length == 2)
    // one centroid per cluster: x≫y for one, y≫x for the other
    assert(cents.count(c => c(0) > c(1)) == 1)
    assert(cents.count(c => c(1) > c(0)) == 1)

    val queries = vecs.filter(col("id").isin(0L, 25L))
    val brute = Similarity.bruteForceTopK(vecs, queries, 3)
      .select("vec_id", "other_id").as[(Long, Long)].collect().toSet
    val viaIndex = Similarity.ivfTopK(vecs, index, queries, nprobe = 1, k = 3)
      .select("vec_id", "other_id").as[(Long, Long)].collect().toSet
    // tight clusters: nprobe=1 already recovers exact neighbors
    assert(viaIndex == brute)
  }

  test("sqrtCells sizing rule: ceil(sqrt(N)) clamped to [1, 2^20]") {
    assert(Similarity.sqrtCells(0L) == 1)
    assert(Similarity.sqrtCells(1L) == 1)
    assert(Similarity.sqrtCells(100L) == 10)
    assert(Similarity.sqrtCells(101L) == 11)       // ceil, not floor
    assert(Similarity.sqrtCells(1000000L) == 1000)
    assert(Similarity.sqrtCells(Long.MaxValue) == (1 << 20)) // clamp
  }

  test("buildIvf with numCells <= 0 auto-sizes seeds by sqrtCells(count)") {
    val vecs = (0 until 20).map(i => (i.toLong, Seq(1.0 * i, 2.0)))
      .toDF("id", "v")
    // iters = 0 returns the seed set untouched: exactly ceil(sqrt(20)) = 5
    // deterministic hash-sampled seeds
    assert(Similarity.buildIvf(vecs, iters = 0).count() == 5)
    // explicit count still wins
    assert(Similarity.buildIvf(vecs, numCells = 3, iters = 0).count() == 3)
  }

  test("clusterBalancedSample: per-cell budget, md5-priority selection, " +
      "determinism") {
    // two tight clusters; centroids = one member of each
    val vecs = ((0 until 12).map(i => (i.toLong, Seq(10.0, 0.1 * i))) ++
      (12 until 24).map(i => (i.toLong, Seq(0.1 * (i - 12), 10.0))))
      .toDF("id", "v")
    val cent = vecs.filter(col("id").isin(0L, 12L))
    val got = Similarity.clusterBalancedSample(vecs, cent, k = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // 3 per cell, ranks 1..3, members stay in their own cluster
    assert(got.length === 6)
    val byCell = got.groupBy(_._1)
    assert(byCell.keySet === Set(0L, 12L))
    byCell.foreach { case (cid, rows) =>
      assert(rows.map(_._4).sorted === Seq(1L, 2L, 3L))
      val members = rows.map(_._2)
      if (cid == 0L) assert(members.forall(_ < 12))
      else assert(members.forall(_ >= 12))
      // kept = the 3 smallest md5 priorities of the cell, rank follows pri
      assert(rows.sortBy(_._4).map(_._3) === rows.map(_._3).sorted)
    }
    // deterministic re-run
    val again = Similarity.clusterBalancedSample(vecs, cent, k = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.toSet === again.toSet)
  }

  test("rpLsh buckets find planted near-dups without all-pairs compare") {
    // base vectors spread on a circle; planted = tiny perturbations of #0-#4
    val base = (0 until 50).map { i =>
      val a = i * 0.125
      (i.toLong, Seq(math.cos(a), math.sin(a), math.cos(2 * a), math.sin(3 * a)))
    }
    val planted = (0 until 5).map { i =>
      val v = base(i)._2
      (1000L + i, v.map(_ * 1.02 + 0.001))
    }
    val vecs = (base ++ planted).toDF("id", "v")
    val pairs = Similarity.rpLshNearDupPairs(vecs, numPlanes = 8, threshold = 0.999)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    // every planted pair found; nothing else at that threshold
    assert((0 until 5).forall(i => pairs.contains((i.toLong, 1000L + i))),
      pairs.toString)
  }

  test("quantizeInt8: values in [-127,127], reconstruction within scale/2") {
    val vecs = Seq(
      (1L, Seq(0.5, -1.0, 0.25)),   // max|x|=1.0 → scale=1/127
      (2L, Seq(0.0, 0.0, 0.0))      // all-zero → scale 1, qv all 0
    ).toDF("id", "v")
    val rows = Similarity.quantizeInt8(vecs)
      .select("id", "scale_e8", "pos", "qv")
      .as[(Long, Long, Int, Long)].collect()
    assert(rows.forall(r => r._4 >= -127 && r._4 <= 127))
    val origs = Map((1L, 0) -> 0.5, (1L, 1) -> -1.0, (1L, 2) -> 0.25,
      (2L, 0) -> 0.0, (2L, 1) -> 0.0, (2L, 2) -> 0.0)
    rows.foreach { case (id, se8, pos, qv) =>
      val scale = se8 / 1e8
      // scale/2 from round-half-up, plus |qv|·0.5e-8 from the e8-rounded
      // scale used for reconstruction (≤ 6.4e-7 at |qv| ≤ 127)
      assert(math.abs(qv * scale - origs((id, pos))) <= scale / 2 + 1e-6,
        s"($id,$pos)")
    }
    assert(rows.filter(_._1 == 2L).forall(_._4 == 0L))
  }

  test("quantizeBinary packs sign bits 32 per word (boundary bits, ragged dim)") {
    // dim=34: word 0 = bits 0..31, word 1 = bits 0..1 only
    val v = (0 until 34).map(i => if (i == 0 || i == 31 || i == 33) 1.0 else -1.0)
    val got = Seq(Tuple1(v)).toDF("v")
      .transform(df => Similarity.quantizeBinary(df, dim = 34))
      .select("words").as[Seq[Long]].head()
    assert(got == Seq((1L << 0) | (1L << 31), 1L << 1))
    // -0.0 counts as non-negative (sign-bit rule is >= 0, both engines)
    val z = Seq(Tuple1(Seq(-0.0, -1.0))).toDF("v")
      .transform(df => Similarity.quantizeBinary(df, dim = 2))
      .select("words").as[Seq[Long]].head()
    assert(z == Seq(1L))
  }

  test("hammingDist sums popcounts across words") {
    val got = Seq((Seq(0L, 255L), Seq(3L, 15L))).toDF("a", "b")
      .select(Similarity.hammingDist("a", "b").as("h")).as[Long].head()
    assert(got == 2L + 4L) // 0^3 = 2 bits, 255^15 = 4 bits
  }

  test("hammingTopK with corpus-wide shortlist equals bruteForceTopK") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(i =>
      (i, Seq.fill(64)(rnd.nextGaussian()))).toDF("id", "v")
    val q = vecs.filter(col("id") < 4)
    val exact = Similarity.bruteForceTopK(vecs, q, 5)
      .select("vec_id", "other_id", "score_e4", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    val got = Similarity.hammingTopK(vecs, q, dim = 64, k = 5, shortlist = 39)
      .select("vec_id", "other_id", "score_e4", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == exact) // rerank over everything ≡ exact top-k
  }

  test("hammingTopK: a small shortlist still recovers planted neighbors") {
    // 3 tight clusters of 10 in 64-dim; each query's true top-9 are its
    // cluster-mates — sign patterns separate clusters, so a shortlist of
    // 12 of 29 candidates must keep all 9
    val rnd = new scala.util.Random(11)
    val centers = Seq.fill(3)(Seq.fill(64)(rnd.nextGaussian() * 4))
    val vecs = (0 until 30).map { i =>
      (i.toLong, centers(i % 3).map(_ + rnd.nextGaussian() * 0.05))
    }.toDF("id", "v")
    val q = vecs.filter(col("id") < 3)
    val got = Similarity.hammingTopK(vecs, q, dim = 64, k = 9, shortlist = 12)
      .select("vec_id", "other_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (c <- 0L until 3L) {
      val mates = (0 until 30).map(_.toLong).filter(i => i % 3 == c && i != c).toSet
      assert(got(c) == mates, s"query $c: ${got(c)} vs $mates")
    }
  }

  test("covarianceUpper matches the direct population-covariance formula") {
    val vs = Seq(
      (1L, Seq(1.0, 0.0, 2.0)),
      (2L, Seq(0.0, 2.0, -1.0)),
      (3L, Seq(-1.0, 4.0, 0.5))).toDF("id", "v")
    val got = Similarity.covarianceUpper(vs, dim = 3)
      .select("i", "j", "n", "cov_e6")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1.toInt, r._2.toInt) -> ((r._3, r._4))).toMap
    assert(got.size == 6) // d(d+1)/2 upper-triangle entries
    val data = Seq(Seq(1.0, 0.0, 2.0), Seq(0.0, 2.0, -1.0),
      Seq(-1.0, 4.0, 0.5))
    val n = data.size
    for (((i, j), (gn, gcov)) <- got) {
      assert(gn == n.toLong)
      // replicate the operator's exact arithmetic: e6-rounded integer
      // sums, double-promoted cross term, final e6 floor
      val sp = data.map(v =>
        math.floor(v(i - 1) * v(j - 1) * 1e6 + 0.5).toLong).sum
      val si = data.map(v => math.floor(v(i - 1) * 1e6 + 0.5).toLong).sum
      val sj = data.map(v => math.floor(v(j - 1) * 1e6 + 0.5).toLong).sum
      val want = math.floor(
        (sp - si * 1.0 * sj / (n * 1e6)) / n + 0.5).toLong
      assert(gcov == want, s"($i,$j): $gcov vs $want")
      // and the e6 value sits within 1 ulp-of-e6 of the true covariance
      val mi = data.map(_(i - 1)).sum / n
      val mj = data.map(_(j - 1)).sum / n
      val trueCov = data.map(v => (v(i - 1) - mi) * (v(j - 1) - mj)).sum / n
      assert(math.abs(gcov - trueCov * 1e6) <= 2.0, s"($i,$j)")
    }
  }

  test("powerIterationTop recovers a planted dominant direction") {
    // vectors spread along (3, 4, 0)/5 with small orthogonal noise: the
    // covariance's top eigenvector is the planted axis
    val rnd = new scala.util.Random(3)
    val axis = Seq(0.6, 0.8, 0.0)
    val vs = (0 until 200).map { i =>
      val t = rnd.nextGaussian() * 5
      (i.toLong, axis.map(_ * t).zip(
        Seq.fill(3)(rnd.nextGaussian() * 0.05)).map { case (a, e) => a + e })
    }.toDF("id", "v")
    val cov = Similarity.covarianceUpper(vs, dim = 3)
    val v = Similarity.powerIterationTop(cov, dim = 3, steps = 5)
      .select("v_e6").as[Long].collect().map(_ / 1e6)
    val dot = math.abs(v(0) * 0.6 + v(1) * 0.8)
    assert(dot > 0.999, s"direction ${v.toSeq} vs planted $axis")
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 0.01,
      "unit norm")
  }

  test("power-iteration norm sums survive magnitudes whose squares wrap " +
       "a long (decimal-exact norm; direction still recovered)") {
    // planted dominant axis i=1 with cov_e6 ~ 5e12: the first iterate is
    // u ≈ (5e12, 1e6), so u·u ≈ 2.5e25 — a long multiply/sum wraps
    // silently there; the decimal norm path must still normalize
    // correctly and recover the axis
    val cov = Seq((1L, 1L, 5000000000000L), (1L, 2L, 0L),
      (2L, 2L, 1000000L)).toDF("i", "j", "cov_e6")
    val v = Similarity.powerIterationTop(cov, dim = 2, steps = 3)
      .orderBy("i").select("v_e6").as[Long].collect()
    assert(math.abs(v(0)) == 1000000L && math.abs(v(1)) <= 1L,
      s"direction ${v.toSeq}")
    // and the deflated k-form agrees on component 1
    val e = Similarity.topKEigen(cov, dim = 2, k = 1, steps = 3)
      .orderBy("i").select("v_e6").as[Long].collect()
    assert(e.toSeq == v.toSeq)
  }

  test("topKEigen: comp 1 equals powerIterationTop; deflation recovers a " +
      "planted second direction, near-orthogonal; rotation decorrelates") {
    // two planted orthogonal directions with distinct variances (5 ≫ 2)
    // plus small noise: eigenbasis ≈ the planted axes in variance order
    val rnd = new scala.util.Random(7)
    val a1 = Seq(0.6, 0.8, 0.0)
    val a2 = Seq(-0.8, 0.6, 0.0)
    val vs = (0 until 300).map { i =>
      val t1 = rnd.nextGaussian() * 5
      val t2 = rnd.nextGaussian() * 2
      (i.toLong, (0 until 3).map(d =>
        a1(d) * t1 + a2(d) * t2 + rnd.nextGaussian() * 0.05))
    }.toDF("id", "v")
    val cov = Similarity.covarianceUpper(vs, dim = 3)
    val eig = Similarity.topKEigen(cov, dim = 3, k = 2, steps = 5)
    val rot = Similarity.collectRotation(eig, dim = 3, k = 2)
    // component 1 must be bit-identical to the top-1 operator
    val top1 = Similarity.powerIterationTop(cov, dim = 3, steps = 5)
      .select("v_e6").as[Long].collect().toSeq
    val comp1e6 = eig.filter(col("comp") === 1).orderBy("i")
      .select("v_e6").as[Long].collect().toSeq
    assert(comp1e6 == top1)
    def dot(x: Seq[Double], y: Seq[Double]) =
      x.zip(y).map { case (a, b) => a * b }.sum
    assert(math.abs(dot(rot(0), a1)) > 0.99, rot(0).toString)
    assert(math.abs(dot(rot(1), a2)) > 0.99, rot(1).toString)
    assert(math.abs(dot(rot(0), rot(1))) < 0.02, "near-orthogonal")
    // rotateExpr projects onto the basis: the planted-axis coordinates
    val got = vs.select(Similarity.rotateExpr(col("v"), rot).as("r"))
      .select(expr("r[0]"), expr("r[1]")).as[(Double, Double)].collect()
    // empirical correlation between rotated coords ≈ 0 (decorrelated)
    val n = got.length
    val (mx, my) = (got.map(_._1).sum / n, got.map(_._2).sum / n)
    val cxy = got.map(p => (p._1 - mx) * (p._2 - my)).sum / n
    val (sx, sy) = (math.sqrt(got.map(p => math.pow(p._1 - mx, 2)).sum / n),
      math.sqrt(got.map(p => math.pow(p._2 - my, 2)).sum / n))
    assert(math.abs(cxy / (sx * sy)) < 0.1, s"corr=${cxy / (sx * sy)}")
  }

  test("eigenBasisLocal: orthonormal full basis, variance-ordered, " +
      "recovers planted directions; dim guard") {
    val rnd = new scala.util.Random(11)
    val a1 = Seq(0.6, 0.8, 0.0)
    val a2 = Seq(-0.8, 0.6, 0.0)
    val vs = (0 until 300).map { i =>
      val t1 = rnd.nextGaussian() * 5
      val t2 = rnd.nextGaussian() * 2
      (i.toLong, (0 until 3).map(d =>
        a1(d) * t1 + a2(d) * t2 + rnd.nextGaussian() * 0.1))
    }.toDF("id", "v")
    val cov = Similarity.covarianceUpper(vs, dim = 3)
    val rot = Similarity.eigenBasisLocal(cov, dim = 3, k = 3)
    def dot(x: Seq[Double], y: Seq[Double]) =
      x.zip(y).map { case (a, b) => a * b }.sum
    // R Rᵀ = I to tight tolerance (full orthonormality — what the
    // deflated path cannot deliver)
    for (a <- 0 until 3; b <- 0 until 3)
      assert(math.abs(dot(rot(a), rot(b)) - (if (a == b) 1.0 else 0.0))
        < 1e-9, s"RRt($a,$b)")
    assert(math.abs(dot(rot(0), a1)) > 0.99, rot(0).toString)
    assert(math.abs(dot(rot(1), a2)) > 0.99, rot(1).toString)
    intercept[IllegalArgumentException] {
      Similarity.eigenBasisLocal(cov, dim = 3, k = 3, maxDim = 2)
    }
  }

  test("opqAllocate deals descending eigenvalues one-at-a-time to the " +
      "lightest subspace; rows stay the basis rows") {
    // 4 dims, m=2 (cap 2): λ = [8, 4, 2, 1] → λ0 opens bucket A (log 2.08),
    // λ1 opens bucket B (1.39), λ2 joins B (lighter), λ3 joins A
    val basis = Seq(Seq(1.0, 0, 0, 0), Seq(0, 1.0, 0, 0),
      Seq(0, 0, 1.0, 0), Seq(0, 0, 0, 1.0))
    val got = Similarity.opqAllocate(basis, Seq(8.0, 4.0, 2.0, 1.0), m = 2)
    assert(got == Seq(basis(0), basis(3), basis(1), basis(2)), got.toString)
    intercept[IllegalArgumentException] {
      Similarity.opqAllocate(basis, Seq(1.0, 1, 1, 1), m = 3) // 4 % 3 != 0
    }
  }

  test("whitenRows: rotated-and-whitened coordinates have ~unit variance " +
      "per direction; near-null directions are floored, not exploded") {
    val rnd = new scala.util.Random(13)
    val a1 = Seq(0.6, 0.8, 0.0)
    val a2 = Seq(-0.8, 0.6, 0.0)
    val vs = (0 until 400).map { i =>
      val t1 = rnd.nextGaussian() * 5
      val t2 = rnd.nextGaussian() * 2
      (i.toLong, (0 until 3).map(d =>
        a1(d) * t1 + a2(d) * t2 + rnd.nextGaussian() * 0.1))
    }.toDF("id", "v")
    val cov = Similarity.covarianceUpper(vs, dim = 3)
    val (basis, lams) = Similarity.eigenBasisLocalWithValues(cov, 3, 3)
    assert(lams(0) > lams(1) && lams(1) > lams(2), lams.toString)
    val white = Similarity.whitenRows(basis, lams)
    val got = vs.select(Similarity.rotateExpr(col("v"), white).as("r"))
      .select(expr("r[0]"), expr("r[1]"), expr("r[2]"))
      .as[(Double, Double, Double)].collect()
    val n = got.length
    def varOf(xs: Seq[Double]) = {
      val m = xs.sum / n; xs.map(x => (x - m) * (x - m)).sum / n
    }
    for (c <- Seq(got.map(_._1).toSeq, got.map(_._2).toSeq, got.map(_._3).toSeq))
      assert(math.abs(varOf(c) - 1.0) < 0.15, s"var=${varOf(c)}")
    // λ floor: a zero eigenvalue scales by 1/sqrt(minLam), not infinity
    val floored = Similarity.whitenRows(Seq(Seq(1.0, 0.0)), Seq(0.0))
    assert(floored.head.head.isFinite && floored.head.head > 0)
  }

  test("Inventory.typed gives a Dataset[BackupFile]") {
    val inv = graft.sources.Inventory.fromListing(spark,
      Seq(("OCG_KE1_NBO-Mon.zip", "u1", "2024-01-10T08:00:00Z")),
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    val ds = graft.sources.Inventory.typed(inv)
    val row = ds.collect().head
    assert(row.instance == "OCG_KE1_NBO" && row.url == "u1")
  }

  test("sampleFrames takes every stride-th fixed-size slice") {
    val bytes = (0 until 100).map(_.toByte).toArray
    val frames = Multimodal.sampleFrames(bytes, frameSize = 10, stride = 3)
    assert(frames.length == 4)            // slices 0,3,6,9 of 10 total
    assert(frames.head.toSeq == (0 until 10).map(_.toByte))
    assert(frames(1).toSeq == (30 until 40).map(_.toByte))
    assert(frames.last.toSeq == (90 until 100).map(_.toByte))
  }

  test("zero-norm vectors: cosine is NULL in native, HOF, and rewritten forms") {
    val df = Seq(
      (1L, Seq(0.0, 0.0), Seq(1.0, 2.0)),  // zero left norm
      (2L, Seq(1.0, 0.0), Seq(0.0, 0.0)),  // zero right norm
      (3L, Seq(1.0, 0.0), Seq(1.0, 0.0))   // clean
    ).toDF("id", "va", "vb")
    val native = df.select(col("id"), Similarity.cosine("va", "vb").as("c"))
      .as[(Long, Option[Double])].collect().toMap
    val hof = df.select(col("id"), Similarity.cosineHof("va", "vb").as("c"))
      .as[(Long, Option[Double])].collect().toMap
    assert(native(1L).isEmpty && native(2L).isEmpty && native(3L).contains(1.0))
    assert(hof == native) // nullif-guarded HOF == native on every row
    // and the near-dup filter drops zero vectors instead of NaN-passing them
    val pairs = Similarity.cosineNearDupPairs(
      Seq((1L, Seq(0.0, 0.0)), (2L, Seq(0.0, 0.0)), (3L, Seq(1.0, 1.0)),
        (4L, Seq(1.0, 1.0))).toDF("id", "v"), threshold = 0.9)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(pairs == Set((3L, 4L))) // the zero-zero pair is NOT a near-dup
  }

  test("connectedComponents throws rather than truncating an unconverged chain") {
    // a 25-node path has diameter 24 > maxIters 3: must throw, not return
    // labels that silently split the single real component
    val pairs = (1L until 25L).map(i => (i, i + 1)).toDF("idA", "idB")
    intercept[IllegalStateException] {
      graft.operators.Dedup.connectedComponents(pairs, maxIters = 3)
    }
    // with room to converge the same chain is one component
    val labels = graft.operators.Dedup.connectedComponents(pairs, maxIters = 30)
      .as[(Long, Long)].collect().toMap
    assert(labels.values.toSet == Set(1L))
    spark.catalog.clearCache()
  }

  test("wsTokenCount: empty and whitespace-only text is 0 tokens") {
    val got = Seq("", "   ", "one", "one two").toDF("text")
      .select(graft.operators.TextStats.wsTokenCount(col("text")).as("n"))
      .as[Int].collect().toSeq
    assert(got == Seq(0, 0, 1, 2))
  }

  test("piiHits counts every category redactPii mutates (incl. phones)") {
    val t = "call +41 22 555 0042 or mail a@b.co see https://x.example/y"
    val got = Seq(t).toDF("text")
      .select(graft.operators.TextStats.piiHits(col("text")).as("h"),
        graft.operators.TextStats.redactPii(col("text")).as("r"))
      .as[(Int, String)].collect().head
    assert(got._1 == 3)
    assert(got._2 == "call <PHONE> or mail <EMAIL> see <URL>")
  }

  test("ivfTopKIndexed: persisted index reproduces ivfTopK exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_rt").toString
    val vecs = (0L until 60L).map { i =>
      val ang = i * 0.1
      (i, Seq(math.cos(ang), math.sin(ang), (i % 7).toDouble / 7.0))
    }.toDF("id", "v")
    val cents = Similarity.buildIvf(vecs, numCells = 4, iters = 2)
    val queries = vecs.filter(col("id") % 9 === 0)
    val fresh = Similarity.ivfTopK(vecs, cents, queries, nprobe = 2, k = 3)
      .orderBy("vec_id", "rank").collect().toSeq
    Similarity.writeIvfIndex(vecs, cents, dir)
    val indexed = Similarity.ivfTopKIndexed(spark, dir, queries, nprobe = 2, k = 3)
      .orderBy("vec_id", "rank").collect().toSeq
    assert(indexed == fresh)
    assert(fresh.nonEmpty)
  }

  test("appendToIvfIndex: (index A, append B) ≡ rebuild(A ∪ B) bit-exact; " +
      "drift report covers the touched cells") {
    def mk(i: Long) = {
      val ang = i * 0.07
      (i, Seq(math.cos(ang), math.sin(ang), (i % 5).toDouble / 5.0))
    }
    val a = (0L until 50L).map(mk).toDF("id", "v")
    val b = (100L until 130L).map(mk).toDF("id", "v")
    val all = a.unionByName(b)
    // centroids must be SHARED: assignment is frozen between retrains, so
    // the rebuild baseline uses the same quantizer the append path stores
    val cents = Similarity.buildIvf(a, numCells = 4, iters = 2)
    val incDir = java.nio.file.Files.createTempDirectory("graft_ivf_inc").toString
    val rebDir = java.nio.file.Files.createTempDirectory("graft_ivf_reb").toString
    Similarity.writeIvfIndex(a, cents, incDir)
    val drift = Similarity.appendToIvfIndex(spark, incDir, b, "b1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    Similarity.writeIvfIndex(all, cents, rebDir)
    val queries = all.filter(col("id") % 11 === 0)
    val inc = Similarity.ivfTopKIndexed(spark, incDir, queries, nprobe = 2, k = 4)
      .orderBy("vec_id", "rank").collect().toSeq
    val reb = Similarity.ivfTopKIndexed(spark, rebDir, queries, nprobe = 2, k = 4)
      .orderBy("vec_id", "rank").collect().toSeq
    assert(inc == reb)
    assert(inc.nonEmpty)
    // appended ids are actually findable through the index
    assert(inc.exists(_.getLong(1) >= 100L))
    // drift report: counts sum to the batch, scores are valid e4 cosines
    assert(drift.map(_._2).sum == 30L)
    assert(drift.forall { case (_, n, s) => n > 0 && s >= -10000 && s <= 10000 })
    // refuses a dir with no index
    intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndex(spark, "/tmp/graft_no_such_index", b, "b1")
    }
    // RETRY idempotence (round-12 ADVICE, confirmed): re-running the
    // same batch id replaces its own (batch, cell) partitions — vector
    // count and serving stay identical, no double-append
    Similarity.appendToIvfIndex(spark, incDir, b, "b1")
    assert(spark.read.parquet(s"$incDir/assigned").count() == 80L,
      "retried append double-appended vectors")
    val retried = Similarity.ivfTopKIndexed(spark, incDir, queries,
      nprobe = 2, k = 4).orderBy("vec_id", "rank").collect().toSeq
    assert(retried == inc, "retry changed serving")
    // a DISTINCT batch id appends for real (the reused-id contract cuts
    // the other way: new data needs a new id)
    val c = (200L until 210L).map(mk).toDF("id", "v")
    Similarity.appendToIvfIndex(spark, incDir, c, "b2")
    assert(spark.read.parquet(s"$incDir/assigned").count() == 90L)
    // the base batch refuses its reserved id
    intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndex(spark, incDir, c, "base")
    }
  }

  test("appendToIvfIndex refuses the legacy cid-only layout loudly " +
      "instead of corrupting partition discovery") {
    // round-13 ADVICE: an index persisted before the batch_id layout has
    // bare cid=... dirs; appending batch_id=.../cid=... beside them makes
    // Parquet discovery fail with conflicting partition columns LATER —
    // the guard must fail the append itself with a rebuild message.
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_old").toString
    val vecs = (0L until 20L).map { i =>
      (i, Seq(math.cos(i * 0.3), math.sin(i * 0.3), 0.5))
    }.toDF("id", "v")
    val cents = Similarity.buildIvf(vecs, numCells = 2, iters = 2)
    cents.select("id", "v").write.mode("overwrite").parquet(s"$dir/centroids")
    // hand-write the PRE-batch_id layout (cid is the only partition level)
    Similarity.ivfAssign(vecs,
        broadcast(cents.select(col("id").as("cid"), col("v").as("cv"))))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$dir/assigned")
    val e = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndex(spark, dir, vecs, "b1")
    }
    assert(e.getMessage.contains("legacy cid-only layout"))
    assert(e.getMessage.contains("rebuild"))
  }

  test("hardNegativesTopK: different-label only, near-dup ceiling and " +
      "easy-negative floor both exclude") {
    // anchor 0 (label 0); candidates: 1 = same-label near-identical
    //   (label predicate must drop), 2 = different-label near-DUPLICATE
    //   (ceiling must drop — probable mislabeled dup), 3 = genuine hard
    //   negative, 4 = easy negative below the floor (near-orthogonal),
    //   5 = medium negative
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0), 0),
      (1L, Seq(0.999, 0.01, 0.0), 0),
      (2L, Seq(0.9999, 0.001, 0.0), 1),
      (3L, Seq(0.9, 0.43, 0.0), 1),
      (4L, Seq(0.1, 0.99, 0.0), 1),
      (5L, Seq(0.7, 0.7, 0.0), 1)
    ).toDF("id", "v", "label")
    val got = Similarity.hardNegativesTopK(vecs,
        vecs.filter(col("id") === 0), k = 5,
        scoreCeilE4 = 9990L, scoreFloorE4 = 2000L)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._4)
    assert(got.map(_._2) == Seq(3L, 5L), got.toString) // 1/2/4 excluded
    assert(got.map(_._4) == Seq(1L, 2L))
  }

  test("hardNegativesIvf with all cells probed equals the exact form") {
    val vecs = (0 until 40).map { i =>
      val a = i * 0.37
      (i.toLong, Seq(math.cos(a), math.sin(a), 0.1 * (i % 3)), i % 4)
    }.toDF("id", "v", "label")
    val cent = vecs.filter(col("id") % 10 === 0).select("id", "v")
    val queries = vecs.filter(col("id") < 6)
    val exact = Similarity.hardNegativesTopK(vecs, queries, k = 3,
        scoreCeilE4 = 9995L, scoreFloorE4 = 0L)
      .as[(Long, Long, Long, Long)].collect().toSet
    val ivf = Similarity.hardNegativesIvf(vecs, cent, queries,
        nprobe = 4, k = 3, scoreCeilE4 = 9995L, scoreFloorE4 = 0L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(ivf == exact, s"ivf $ivf vs exact $exact")
    // and no same-label pair ever survives either path
    val labels = vecs.select("id", "label").as[(Long, Int)].collect().toMap
    ivf.foreach { case (q, o, _, _) => assert(labels(q) != labels(o)) }
  }
}
