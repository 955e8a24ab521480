package graft.probes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curation, Dedup, Multimodal, Similarity, TextStats}
import ProbeShared._

/** Embedding/ANN probe family: cosine near-dup, IVF cells and search,
  * k-means step, int8 quantization, PQ encode/ADC, IVF-PQ composed and
  * residual paths, cluster-balanced sampling.
  *
  * Split from the former monolithic ExtProbes (3.1 kLoC); aggregated and
  * re-exported by [[ExtProbes]] — registry keys, probe bodies, and oracle
  * SQL unchanged.
  */
object AnnProbes {
  // ---- q30 embedding-cosine near-dup ------------------------------------
  val q30: Q = (s, d) => {
    val base = Tables.embeddings(s, d).filter(col("vec_id") < 200)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    val planted = base.filter(col("id") % 13 === 0)
      .select((col("id") + 100000).as("id"),
        expr("transform(v, x -> x * 1.1 + 0.01)").as("v"))
    Similarity.cosineNearDupPairs(base.unionByName(planted), 0.9)
      .orderBy("idA", "idB")
  }

  val q30Sql: String =
    s"""WITH base AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE vec_id < 200),
       |corpus AS (
       |  SELECT id, v FROM base
       |  UNION ALL
       |  SELECT id + 100000, list_transform(v, x -> x * 1.1 + 0.01) FROM base
       |  WHERE id % 13 = 0),
       |p AS (SELECT a.id AS idA, b.id AS idB,
       |    ${Similarity.cosineDuckSql("a.v", "b.v")} AS raw
       |  FROM corpus a JOIN corpus b ON a.id < b.id)
       |SELECT idA, idB, ${Similarity.scoreE4DuckSql("raw")} AS score_e4
       |FROM p WHERE raw >= 0.9 ORDER BY idA, idB""".stripMargin

  // ---- q70 IVF-bucketed cosine near-dup (cluster-then-verify) ------------
  // The SCALE path for q30's all-pairs baseline: candidates meet only
  // within a shared centroid cell (one equi shuffle on cell id; nassign=2
  // multi-homes each vector into its runner-up cell to catch boundary
  // pairs), then the exact cosine verifies. Deterministic given the
  // centroid set, so the oracle reproduces the assignment verbatim and the
  // compare is EXACT — the recall-vs-all-pairs tradeoff is measured
  // separately in tools.Recall.
  val q70: Q = (s, d) => {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    val planted = base.filter(col("id") % 13 === 0)
      .select((col("id") + 100000).as("id"),
        expr("transform(v, x -> x * 1.1 + 0.01)").as("v"))
    val centroids = base.filter(col("id") % 25 === 0)
    Similarity.ivfNearDupPairs(base.unionByName(planted), centroids,
        threshold = 0.9, nassign = 2)
      .orderBy("idA", "idB")
  }

  val q70Sql: String = {
    def cos(a: String, b: String) = Similarity.cosineDuckSql(a, b)
    s"""WITH base AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |corpus AS (
       |  SELECT id, v FROM base
       |  UNION ALL
       |  SELECT id + 100000, list_transform(v, x -> x * 1.1 + 0.01) FROM base
       |  WHERE id % 13 = 0),
       |cent AS (SELECT id AS cid, v AS cv FROM base WHERE id % 25 = 0),
       |assigned AS (
       |  SELECT id, v, cid FROM (
       |    SELECT c0.id, c0.v, c.cid,
       |      row_number() OVER (PARTITION BY c0.id
       |        ORDER BY ${cos("c0.v", "c.cv")} DESC, c.cid ASC) AS rn
       |    FROM corpus c0 CROSS JOIN cent c) t(id, v, cid, rn)
       |  WHERE rn <= 2),
       |p AS (
       |  SELECT DISTINCT a.id AS idA, b.id AS idB,
       |    ${cos("a.v", "b.v")} AS raw
       |  FROM assigned a JOIN assigned b USING (cid) WHERE a.id < b.id)
       |SELECT idA, idB, ${Similarity.scoreE4DuckSql("raw")} AS score_e4
       |FROM p WHERE raw >= 0.9 ORDER BY idA, idB""".stripMargin
  }

  // ---- q31 IVF ANN (coarse-quantizer cells + nprobe search) -------------
  val q31: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    val centroids = e.filter(col("id") % 25 === 0)
    val queries = e.filter(col("id") < 30)
    Similarity.ivfTopK(e, centroids, queries, nprobe = 2, k = 3)
      .orderBy("vec_id", "rank")
  }

  val q31Sql: String = {
    def cos(a: String, b: String) = Similarity.cosineDuckSql(a, b)
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent AS (SELECT id AS cid, v AS cv FROM e WHERE id % 25 = 0),
       |assigned AS (
       |  SELECT id AS other_id, v AS vb, cid FROM (
       |    SELECT e.id, e.v, c.cid,
       |      row_number() OVER (PARTITION BY e.id
       |        ORDER BY ${cos("e.v", "c.cv")} DESC, c.cid ASC) AS rn
       |    FROM e CROSS JOIN cent c) t(id, v, cid, rn) WHERE rn = 1),
       |probed AS (
       |  SELECT id AS vec_id, v AS va, cid FROM (
       |    SELECT q.id, q.v, c.cid,
       |      row_number() OVER (PARTITION BY q.id
       |        ORDER BY ${cos("q.v", "c.cv")} DESC, c.cid ASC) AS rn
       |    FROM e q CROSS JOIN cent c WHERE q.id < 30) t(id, v, cid, rn)
       |  WHERE rn <= 2),
       |cand AS (
       |  SELECT p.vec_id, a.other_id,
       |    ${Similarity.scoreE4DuckSql(cos("p.va", "a.vb"))} AS score_e4
       |  FROM probed p JOIN assigned a USING (cid)
       |  WHERE p.vec_id <> a.other_id),
       |r AS (SELECT vec_id, other_id, score_e4,
       |    CAST(row_number() OVER (PARTITION BY vec_id
       |      ORDER BY score_e4 DESC, other_id ASC) AS BIGINT) AS rank
       |  FROM cand)
       |SELECT vec_id, other_id, score_e4, rank FROM r WHERE rank <= 3
       |ORDER BY vec_id, rank""".stripMargin
  }

  // ---- q40 k-means centroid refinement step (IVF training) --------------
  // Assignment by max cosine, then element-wise mean per cell through
  // scale-8 fixed-point BIGINT sums — exact, order-independent,
  // representation-stable. Long form (cid, pos, m_e8): scalar columns only.
  val q40: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    val cent = e.filter(col("id") % 25 === 0)
    Similarity.kmeansStep(e, cent).orderBy("cid", "pos")
  }

  val q40Sql: String = {
    def cos(a: String, b: String) = Similarity.cosineDuckSql(a, b)
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent AS (SELECT id AS cid, v AS cv FROM e WHERE id % 25 = 0),
       |assigned AS (
       |  SELECT id, v, cid FROM (
       |    SELECT e.id, e.v, c.cid,
       |      row_number() OVER (PARTITION BY e.id
       |        ORDER BY ${cos("e.v", "c.cv")} DESC, c.cid ASC) AS rn
       |    FROM e CROSS JOIN cent c) t(id, v, cid, rn) WHERE rn = 1),
       |ex AS (
       |  SELECT cid, t.pos AS pos,
       |    CAST(floor(v[t.pos] * 100000000 + 0.5) AS BIGINT) AS xe8
       |  FROM assigned, unnest(generate_series(1, len(v))) AS t(pos))
       |SELECT cid, CAST(pos - 1 AS INT) AS pos,
       |  CAST(floor(CAST(sum(xe8) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS m_e8
       |FROM ex GROUP BY cid, pos ORDER BY cid, pos""".stripMargin
  }

  // ---- q52 RP-LSH (sign) bucketed near-dup ------------------------------
  // The LSH-bucketed ANN scale path: bucket join on the 8-bit hyperplane
  // sign signature, exact cosine verify within buckets. Planted near-dups
  // (mild positive affine distortion keeps most sign bits) — the probe
  // verifies the operator finds exactly what the mirrored oracle finds.
  // Embeddings are dim-64 at every SF (TESTDATA.md); the oracle embeds the
  // same deterministic hyperplanes as exact double literals.
  private val q52Planes = Similarity.hyperplanes(numPlanes = 8, dim = 64)

  val q52: Q = (s, d) => {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    val planted = base.filter(col("id") % 13 === 0)
      .select((col("id") + 100000).as("id"),
        expr("transform(v, x -> x * 1.05 + 0.001)").as("v"))
    Similarity.rpLshNearDupPairs(base.unionByName(planted), numPlanes = 8,
        threshold = 0.8, dim = Some(64)) // testdata embedding dim; skips the head-probe job
      .orderBy("idA", "idB")
  }

  val q52Sql: String =
    s"""WITH base AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |corpus AS (
       |  SELECT id, v FROM base
       |  UNION ALL
       |  SELECT id + 100000, list_transform(v, x -> x * 1.05 + 0.001) FROM base
       |  WHERE id % 13 = 0),
       |b AS (SELECT id, v, ${Similarity.rpLshBucketDuckSql("v", q52Planes)} AS bk
       |  FROM corpus),
       |p AS (SELECT x.id AS idA, y.id AS idB,
       |    ${Similarity.cosineDuckSql("x.v", "y.v")} AS raw
       |  FROM b x JOIN b y ON x.bk = y.bk AND x.id < y.id)
       |SELECT idA, idB, ${Similarity.scoreE4DuckSql("raw")} AS score_e4
       |FROM p WHERE raw >= 0.8 ORDER BY idA, idB""".stripMargin

  // ---- q55 int8 scalar quantization (ANN index compression) -------------
  val q55: Q = (s, d) =>
    Similarity.quantizeInt8(
        Tables.embeddings(s, d)
          .select(col("vec_id").as("id"),
            Similarity.toDoubleVec(col("embedding")).as("v")))
      .orderBy("id", "pos")

  val q55Sql: String =
    """WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings),
      |sc AS (SELECT id, v,
      |    CASE WHEN m > 0 THEN m ELSE 1.0 END AS s
      |  FROM (SELECT id, v,
      |          list_max(list_transform(v, x -> abs(x))) / 127 AS m
      |        FROM e)),
      |ex AS (SELECT id,
      |    CAST(floor(s * 100000000 + 0.5) AS BIGINT) AS scale_e8,
      |    t.pos AS pos, v[t.pos] / s AS r
      |  FROM sc, unnest(generate_series(1, len(v))) AS t(pos))
      |SELECT id, scale_e8, CAST(pos - 1 AS INT) AS pos,
      |  greatest(-127, least(127, CAST(floor(r + 0.5) AS BIGINT))) AS qv
      |FROM ex ORDER BY id, pos""".stripMargin

  // ---- q86/q87 product quantization (IVF-PQ's compression half) ---------
  // q86: encode — every vector becomes m=8 sub-codes (argmin squared-L2
  // against a deterministic seedless codebook whose literals both engines
  // embed exactly, the q52 hyperplane idiom). q87: ADC top-k — per-query
  // (sub, code) partial-distance LUT, integer e4 sums per candidate,
  // WindowGroupLimit rank. Production codebooks come from pqTrain
  // (PQSpec); the probe codebook is fixed so the oracle can mirror it.
  private val q86Cb = Similarity.pqCodebook(m = 8, numCodes = 8, subDim = 8)

  private def pqDistDuck(a: String, b: String): String =
    s"""CAST(floor(list_sum(list_transform(range(1, 9),
       |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) * 10000 + 0.5)
       |    AS BIGINT)""".stripMargin

  private val pqCommonDuck: String =
    s"""e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |cb AS (SELECT * FROM ${Similarity.pqCodebookDuckSql(q86Cb)}
       |       AS t(sub, code, cv)),
       |sp AS (SELECT id, s.sub AS sub,
       |    list_slice(v, s.sub * 8 + 1, s.sub * 8 + 8) AS subv
       |  FROM e, (SELECT unnest(range(0, 8)) AS sub) s),
       |dd AS (SELECT id, sp.sub AS sub, code,
       |    ${pqDistDuck("subv", "cv")} AS d_e4
       |  FROM sp JOIN cb ON cb.sub = sp.sub),
       |codes AS (SELECT id, sub, CAST(min([d_e4, code])[2] AS INT) AS code
       |  FROM dd GROUP BY id, sub)""".stripMargin

  val q86: Q = (s, d) => {
    val vecs = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    Similarity.pqEncode(vecs, Similarity.pqCodebookDf(s, q86Cb),
        m = 8, subDim = 8)
      .orderBy("id", "sub")
  }

  val q86Sql: String =
    s"""WITH $pqCommonDuck
       |SELECT id, CAST(sub AS INT) AS sub, code
       |FROM codes ORDER BY id, sub""".stripMargin

  val q87: Q = (s, d) => {
    val vecs = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    val cb = Similarity.pqCodebookDf(s, q86Cb)
    Similarity.pqAdcTopK(
        Similarity.pqEncode(vecs, cb, m = 8, subDim = 8), cb,
        vecs.filter(col("id") % 50 === 0), m = 8, subDim = 8, k = 5)
      .orderBy("vec_id", "rank")
  }

  val q87Sql: String =
    s"""WITH $pqCommonDuck,
       |lut AS (SELECT sp.id AS vec_id, sp.sub AS sub, cb.code,
       |    ${pqDistDuck("subv", "cv")} AS pd_e4
       |  FROM sp JOIN cb ON cb.sub = sp.sub
       |  WHERE sp.id % 50 = 0),
       |cand AS (SELECT vec_id, c.id AS other_id,
       |    CAST(sum(pd_e4) AS BIGINT) AS dist_e4
       |  FROM codes c JOIN lut ON lut.sub = c.sub AND lut.code = c.code
       |  WHERE lut.vec_id <> c.id
       |  GROUP BY vec_id, c.id),
       |r AS (SELECT vec_id, other_id, dist_e4,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY dist_e4, other_id) AS rank
       |  FROM cand)
       |SELECT vec_id, other_id, dist_e4, rank
       |FROM r WHERE rank <= 5 ORDER BY vec_id, rank""".stripMargin

  // ---- q89 composed IVF-PQ query path -----------------------------------
  // The two halves end-to-end: IVF cell probe (q31's assignment mirror)
  // narrows candidates, ADC over the PQ codes (q86/q87's mirrors) ranks
  // them — candidate embeddings never touched at query time. Fully
  // deterministic given centroids + codebook, so the oracle reproduces
  // both halves and the compare is EXACT.
  val q89: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    Similarity.ivfPqTopK(e, e.filter(col("id") % 25 === 0),
        Similarity.pqCodebookDf(s, q86Cb), e.filter(col("id") % 50 === 0),
        nprobe = 2, m = 8, subDim = 8, k = 3)
      .orderBy("vec_id", "rank")
  }

  val q89Sql: String = {
    def cos(a: String, b: String) = Similarity.cosineDuckSql(a, b)
    s"""WITH $pqCommonDuck,
       |cent AS (SELECT id AS cid, v AS cv FROM e WHERE id % 25 = 0),
       |assigned AS (
       |  SELECT id, cid FROM (
       |    SELECT e.id, c.cid,
       |      row_number() OVER (PARTITION BY e.id
       |        ORDER BY ${cos("e.v", "c.cv")} DESC, c.cid ASC) AS rn
       |    FROM e CROSS JOIN cent c) t(id, cid, rn) WHERE rn = 1),
       |probed AS (
       |  SELECT id AS vec_id, cid FROM (
       |    SELECT q.id, c.cid,
       |      row_number() OVER (PARTITION BY q.id
       |        ORDER BY ${cos("q.v", "c.cv")} DESC, c.cid ASC) AS rn
       |    FROM e q CROSS JOIN cent c WHERE q.id % 50 = 0) t(id, cid, rn)
       |  WHERE rn <= 2),
       |lut AS (SELECT sp.id AS vec_id, sp.sub AS sub, cb.code,
       |    ${pqDistDuck("subv", "cv")} AS pd_e4
       |  FROM sp JOIN cb ON cb.sub = sp.sub
       |  WHERE sp.id % 50 = 0),
       |cand AS (SELECT p.vec_id, c.id AS other_id,
       |    CAST(sum(l.pd_e4) AS BIGINT) AS dist_e4
       |  FROM probed p
       |  JOIN assigned a USING (cid)
       |  JOIN codes c ON c.id = a.id
       |  JOIN lut l ON l.vec_id = p.vec_id AND l.sub = c.sub
       |    AND l.code = c.code
       |  WHERE p.vec_id <> a.id
       |  GROUP BY p.vec_id, c.id),
       |r AS (SELECT vec_id, other_id, dist_e4,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY dist_e4, other_id) AS rank
       |  FROM cand)
       |SELECT vec_id, other_id, dist_e4, rank
       |FROM r WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin
  }

  // ---- q92 residual-encoded IVF-PQ (FAISS-IVFPQ layout) -----------------
  // q89's composed path with residual codes: corpus codes quantize
  // v − centroid(own cell); the LUT is per-(query, probed cell) on the
  // query's residual. Fully deterministic given centroids + codebook —
  // the oracle mirrors assignment, residual, encode and ADC exactly.
  val q92: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    Similarity.ivfPqTopKResidual(e, e.filter(col("id") % 25 === 0),
        Similarity.pqCodebookDf(s, q86Cb), e.filter(col("id") % 50 === 0),
        nprobe = 2, m = 8, subDim = 8, k = 3)
      .orderBy("vec_id", "rank")
  }

  val q92Sql: String = {
    def cos(a: String, b: String) = Similarity.cosineDuckSql(a, b)
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |cb AS (SELECT * FROM ${Similarity.pqCodebookDuckSql(q86Cb)}
       |       AS t(sub, code, cv)),
       |cent AS (SELECT id AS cid, v AS ccv FROM e WHERE id % 25 = 0),
       |assigned AS (
       |  SELECT id, cid FROM (
       |    SELECT e.id, c.cid,
       |      row_number() OVER (PARTITION BY e.id
       |        ORDER BY ${cos("e.v", "c.ccv")} DESC, c.cid ASC) AS rn
       |    FROM e CROSS JOIN cent c) t(id, cid, rn) WHERE rn = 1),
       |resid AS (
       |  SELECT a.id, a.cid,
       |    list_transform(range(1, 65), i -> e.v[i] - c.ccv[i]) AS rv
       |  FROM assigned a JOIN e ON e.id = a.id JOIN cent c ON c.cid = a.cid),
       |rsub AS (SELECT id, cid, s.sub AS sub,
       |    list_slice(rv, s.sub * 8 + 1, s.sub * 8 + 8) AS subv
       |  FROM resid, (SELECT unnest(range(0, 8)) AS sub) s),
       |rdd AS (SELECT id, rsub.sub AS sub, code,
       |    ${pqDistDuck("subv", "cv")} AS d_e4
       |  FROM rsub JOIN cb ON cb.sub = rsub.sub),
       |rcodes AS (SELECT id, sub, CAST(min([d_e4, code])[2] AS INT) AS code
       |  FROM rdd GROUP BY id, sub),
       |probed AS (
       |  SELECT id AS vec_id, cid FROM (
       |    SELECT q.id, c.cid,
       |      row_number() OVER (PARTITION BY q.id
       |        ORDER BY ${cos("q.v", "c.ccv")} DESC, c.cid ASC) AS rn
       |    FROM e q CROSS JOIN cent c WHERE q.id % 50 = 0) t(id, cid, rn)
       |  WHERE rn <= 2),
       |qres AS (
       |  SELECT p.vec_id, p.cid,
       |    list_transform(range(1, 65), i -> q.v[i] - c.ccv[i]) AS qr
       |  FROM probed p JOIN e q ON q.id = p.vec_id
       |    JOIN cent c ON c.cid = p.cid),
       |lut AS (SELECT vec_id, qres.cid, s.sub AS sub, cb.code,
       |    ${pqDistDuck("list_slice(qr, s.sub * 8 + 1, s.sub * 8 + 8)",
      "cv")} AS pd_e4
       |  FROM qres, (SELECT unnest(range(0, 8)) AS sub) s
       |  JOIN cb ON cb.sub = s.sub),
       |cand AS (SELECT p.vec_id, c.id AS other_id,
       |    CAST(sum(l.pd_e4) AS BIGINT) AS dist_e4
       |  FROM probed p
       |  JOIN assigned a USING (cid)
       |  JOIN rcodes c ON c.id = a.id
       |  JOIN lut l ON l.vec_id = p.vec_id AND l.cid = p.cid
       |    AND l.sub = c.sub AND l.code = c.code
       |  WHERE p.vec_id <> a.id
       |  GROUP BY p.vec_id, c.id),
       |r AS (SELECT vec_id, other_id, dist_e4,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY dist_e4, other_id) AS rank
       |  FROM cand)
       |SELECT vec_id, other_id, dist_e4, rank
       |FROM r WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin
  }

  // ---- q112 cluster-balanced sampling ------------------------------------
  // Fixed centroid set (id % 25 — the q31 convention that keeps training
  // out of the oracle's way), md5(id) priority, 5 kept per cell. The
  // oracle mirrors the assignment argmax (cosine + cid tiebreak) and the
  // priority window.
  val q112: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    Similarity.clusterBalancedSample(e, e.filter(col("id") % 25 === 0), 5)
      .orderBy("cid", "rank")
  }

  val q112Sql: String = {
    val cos = Similarity.cosineDuckSql("e.v", "c.cv")
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |cent AS (SELECT id AS cid, v AS cv FROM e WHERE id % 25 = 0),
       |assigned AS (
       |  SELECT id, cid FROM (
       |    SELECT e.id, c.cid,
       |      row_number() OVER (PARTITION BY e.id
       |        ORDER BY $cos DESC, c.cid ASC) AS rn
       |    FROM e CROSS JOIN cent c) WHERE rn = 1),
       |pri AS (SELECT cid, id,
       |    ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT AS pri
       |  FROM assigned),
       |r AS (SELECT cid, id, pri, CAST(row_number() OVER (
       |    PARTITION BY cid ORDER BY pri ASC, id ASC) AS BIGINT) AS rank
       |  FROM pri)
       |SELECT cid, id, pri, rank FROM r WHERE rank <= 5
       |ORDER BY cid, rank""".stripMargin
  }

  // ---- q121 binary-quantized Hamming shortlist + cosine rerank -----------
  // The 1-bit serving path (Similarity.hammingTopK scaladoc): sign-bit
  // packing into 32-bit BIGINT words, XOR+popcount shortlist, exact
  // cosine rerank. The oracle unrolls the same packing as literal bit
  // sums (the q75 idiom), mirrors the two-stage ranking, and — because
  // both packing and distance are pure integer arithmetic — the compare
  // is exact end to end including the Hamming column.
  val q121: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        graft.operators.Similarity.toDoubleVec(col("embedding")).as("v"))
    graft.operators.Similarity.hammingTopK(
        e, e.filter(col("id") < 5), dim = 64, k = 10, shortlist = 50)
      .orderBy("vec_id", "rank")
  }

  val q121Sql: String = {
    def word(w: Int): String = (0 until 32).map { j =>
      s"(CASE WHEN v[${w * 32 + j + 1}] >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |b AS (SELECT vec_id, v,
       |    CAST(${word(0)} AS BIGINT) AS w0,
       |    CAST(${word(1)} AS BIGINT) AS w1
       |  FROM e),
       |p AS (SELECT q.vec_id, c.vec_id AS other_id, q.v AS va, c.v AS vb,
       |    CAST(bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1))
       |      AS BIGINT) AS hamming
       |  FROM b q JOIN b c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
       |sl AS (SELECT vec_id, other_id, va, vb, hamming,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY hamming ASC, other_id ASC) AS hrank
       |  FROM p),
       |r AS (SELECT vec_id, other_id, hamming,
       |    CAST(floor(list_dot_product(va, vb) /
       |      (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb)))
       |      * 10000 + 0.5) AS BIGINT) AS score_e4
       |  FROM sl WHERE hrank <= 50),
       |rr AS (SELECT vec_id, other_id, hamming, score_e4,
       |    CAST(row_number() OVER (PARTITION BY vec_id
       |      ORDER BY score_e4 DESC, other_id ASC) AS BIGINT) AS rank
       |  FROM r)
       |SELECT vec_id, other_id, hamming, score_e4, rank
       |FROM rr WHERE rank <= 10 ORDER BY vec_id, rank""".stripMargin
  }

  // ---- q130 embedding covariance (PCA/OPQ prep) --------------------------
  // Similarity.covarianceUpper: upper-triangle covariance from e6-rounded
  // integer sums (products AND coordinates rounded before summing; the
  // final double derives from integer sums with the multiply promoted to
  // double first — the integer product would overflow BIGINT in both
  // engines at scale). 2080 rows for dim 64.
  val q130: Q = (s, d) =>
    graft.operators.Similarity.covarianceUpper(
        Tables.embeddings(s, d)
          .select(col("vec_id").as("id"),
            graft.operators.Similarity.toDoubleVec(col("embedding")).as("v")),
        dim = 64)
      .orderBy("i", "j")

  val q130Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings),
      |pr AS (SELECT i, j,
      |    CAST(floor(v[i] * v[j] * 1e6 + 0.5) AS BIGINT) AS p
      |  FROM e, unnest(generate_series(1, 64)) t(i),
      |       unnest(generate_series(1, 64)) u(j)
      |  WHERE j >= i),
      |sp AS (SELECT i, j, CAST(sum(p) AS BIGINT) AS sp,
      |    CAST(count(*) AS BIGINT) AS n FROM pr GROUP BY 1, 2),
      |s1 AS (SELECT i,
      |    CAST(sum(CAST(floor(v[i] * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s
      |  FROM e, unnest(generate_series(1, 64)) t(i) GROUP BY 1)
      |SELECT sp.i, sp.j, sp.n,
      |  CAST(floor((sp.sp - a.s * 1.0 * b.s / (sp.n * 1000000.0)) / sp.n
      |    + 0.5) AS BIGINT) AS cov_e6
      |FROM sp JOIN s1 a ON a.i = sp.i JOIN s1 b ON b.i = sp.j
      |ORDER BY sp.i, sp.j""".stripMargin

  // ---- q131 power-iteration top principal component ----------------------
  // Similarity.powerIterationTop over the q130 covariance: 3 unrolled
  // steps, each re-entering integer land (exact C·v integer sums →
  // e6 down-scale → integer square-sum → sqrt of an exact integer →
  // e6 unit vector) — the q98/q117 unrolled-trajectory discipline, so
  // the oracle replays every step and the compare is hash-exact.
  val q131: Q = (s, d) => {
    val cov = graft.operators.Similarity.covarianceUpper(
      Tables.embeddings(s, d)
        .select(col("vec_id").as("id"),
          graft.operators.Similarity.toDoubleVec(col("embedding")).as("v")),
      dim = 64)
    graft.operators.Similarity.powerIterationTop(cov, dim = 64, steps = 3)
  }

  val q131Sql: String = {
    val stepCtes = (1 to 3).map { t =>
      val prev = if (t == 1) "v0" else s"v${t - 1}"
      s"""w$t AS (SELECT s.i, CAST(sum(s.cov_e6 * v.v_e6) AS BIGINT) AS w
         |  FROM sym s JOIN $prev v ON v.j = s.j GROUP BY 1),
         |u$t AS (SELECT i, CAST(floor(w / 1000000.0 + 0.5) AS BIGINT) AS u
         |  FROM w$t),
         |n$t AS (SELECT sqrt(CAST(sum(u * u) AS DOUBLE)) AS nrm FROM u$t),
         |v$t AS (SELECT i AS j, CAST(floor(u / (SELECT nrm FROM n$t)
         |    * 1000000 + 0.5) AS BIGINT) AS v_e6 FROM u$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |pr AS (SELECT i, j,
       |    CAST(floor(v[i] * v[j] * 1e6 + 0.5) AS BIGINT) AS p
       |  FROM e, unnest(generate_series(1, 64)) t(i),
       |       unnest(generate_series(1, 64)) u(j)
       |  WHERE j >= i),
       |sp AS (SELECT i, j, CAST(sum(p) AS BIGINT) AS sp,
       |    CAST(count(*) AS BIGINT) AS n FROM pr GROUP BY 1, 2),
       |s1 AS (SELECT i,
       |    CAST(sum(CAST(floor(v[i] * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s
       |  FROM e, unnest(generate_series(1, 64)) t(i) GROUP BY 1),
       |cov AS (SELECT sp.i, sp.j,
       |    CAST(floor((sp.sp - a.s * 1.0 * b.s / (sp.n * 1000000.0)) / sp.n
       |      + 0.5) AS BIGINT) AS cov_e6
       |  FROM sp JOIN s1 a ON a.i = sp.i JOIN s1 b ON b.i = sp.j),
       |sym AS (SELECT i, j, cov_e6 FROM cov
       |  UNION ALL SELECT j, i, cov_e6 FROM cov WHERE i <> j),
       |v0 AS (SELECT unnest(generate_series(1, 64)) AS j,
       |    CAST(1000000 AS BIGINT) AS v_e6),
       |$stepCtes
       |SELECT j AS i, v_e6 FROM v3 ORDER BY i""".stripMargin
  }

  // ---- q136 top-k eigenbasis via deflated power iteration (OPQ rot) ------
  // Similarity.topKEigen over the q130 covariance: component 1 = two
  // unrolled q131 power steps; then the Rayleigh λ (two exact integer
  // sums, one double division), the e6-downscaled outer-product
  // deflation C − λvvᵀ, and component 2 on the remainder — the full
  // step/deflate alternation replayed CTE by CTE (the q117 unrolled-
  // trajectory pattern). This basis is the parametric-OPQ rotation the
  // PQ stack consumes (rotateExpr); its recall delta on correlated
  // embeddings is measured in tools/Recall (SCALE.md round-10).
  val q136: Q = (s, d) => {
    val cov = graft.operators.Similarity.covarianceUpper(
      Tables.embeddings(s, d)
        .select(col("vec_id").as("id"),
          graft.operators.Similarity.toDoubleVec(col("embedding")).as("v")),
      dim = 64)
    graft.operators.Similarity.topKEigen(cov, dim = 64, k = 2, steps = 2)
      .orderBy("comp", "i")
  }

  val q136Sql: String = {
    def stepCtes(mat: String, pfx: String) = (1 to 2).map { t =>
      val prev = if (t == 1) "v0" else s"$pfx${t - 1}"
      s"""${pfx}w$t AS (SELECT s.i, CAST(sum(s.cov_e6 * v.v_e6) AS BIGINT) AS w
         |  FROM $mat s JOIN $prev v ON v.j = s.j GROUP BY 1),
         |${pfx}u$t AS (SELECT i, CAST(floor(w / 1000000.0 + 0.5) AS BIGINT) AS u
         |  FROM ${pfx}w$t),
         |${pfx}n$t AS (SELECT sqrt(CAST(sum(u * u) AS DOUBLE)) AS nrm FROM ${pfx}u$t),
         |$pfx$t AS (SELECT i AS j, CAST(floor(u / (SELECT nrm FROM ${pfx}n$t)
         |    * 1000000 + 0.5) AS BIGINT) AS v_e6 FROM ${pfx}u$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |pr AS (SELECT i, j,
       |    CAST(floor(v[i] * v[j] * 1e6 + 0.5) AS BIGINT) AS p
       |  FROM e, unnest(generate_series(1, 64)) t(i),
       |       unnest(generate_series(1, 64)) u(j)
       |  WHERE j >= i),
       |sp AS (SELECT i, j, CAST(sum(p) AS BIGINT) AS sp,
       |    CAST(count(*) AS BIGINT) AS n FROM pr GROUP BY 1, 2),
       |s1 AS (SELECT i,
       |    CAST(sum(CAST(floor(v[i] * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s
       |  FROM e, unnest(generate_series(1, 64)) t(i) GROUP BY 1),
       |cov AS (SELECT sp.i, sp.j,
       |    CAST(floor((sp.sp - a.s * 1.0 * b.s / (sp.n * 1000000.0)) / sp.n
       |      + 0.5) AS BIGINT) AS cov_e6
       |  FROM sp JOIN s1 a ON a.i = sp.i JOIN s1 b ON b.i = sp.j),
       |sym AS (SELECT i, j, cov_e6 FROM cov
       |  UNION ALL SELECT j, i, cov_e6 FROM cov WHERE i <> j),
       |v0 AS (SELECT unnest(generate_series(1, 64)) AS j,
       |    CAST(1000000 AS BIGINT) AS v_e6),
       |${stepCtes("sym", "a")},
       |rw AS (SELECT s.i, CAST(sum(s.cov_e6 * v.v_e6) AS BIGINT) AS w
       |  FROM sym s JOIN a2 v ON v.j = s.j GROUP BY 1),
       |ru AS (SELECT i, CAST(floor(w / 1000000.0 + 0.5) AS BIGINT) AS u
       |  FROM rw),
       |num AS (SELECT CAST(sum(ru.u * v.v_e6) AS BIGINT) AS n
       |  FROM ru JOIN a2 v ON v.j = ru.i),
       |den AS (SELECT CAST(floor(sum(v_e6 * v_e6) / 1e6 + 0.5) AS BIGINT)
       |    AS d FROM a2),
       |lam AS (SELECT CAST(floor(CAST((SELECT n FROM num) AS DOUBLE)
       |    / (SELECT d FROM den) + 0.5) AS BIGINT) AS l),
       |sym2 AS (SELECT s.i, s.j,
       |    CAST(s.cov_e6 - floor((SELECT l FROM lam) *
       |      floor(vi.v_e6 * vj.v_e6 / 1e6 + 0.5) / 1e6 + 0.5) AS BIGINT)
       |      AS cov_e6
       |  FROM sym s JOIN a2 vi ON vi.j = s.i JOIN a2 vj ON vj.j = s.j),
       |${stepCtes("sym2", "b")}
       |SELECT CAST(1 AS BIGINT) AS comp, j AS i, v_e6 FROM a2
       |UNION ALL SELECT 2, j, v_e6 FROM b2
       |ORDER BY comp, i""".stripMargin
  }

  // ---- q139 non-parametric-OPQ Procrustes step (unrolled alternation) ----
  // ONE alternation of Similarity.opqTrainNP on the first two embedding
  // dims under a LITERAL codebook (the q86 fixed-codebook convention —
  // pqTrain's hash seeds are not oracle-expressible): encode → decode →
  // crossMoment (e6-rounded products, exact BIGINT sums) → the
  // driver-local one-sided-Jacobi Procrustes rotation. At d=2 the SVD is
  // exactly ONE Jacobi rotation (the relative skip threshold makes later
  // sweeps no-ops), so the oracle replays the entire closed form —
  // column norms, the tau/t/cos/sin rotation, σ-normalized U, R = V·Uᵀ —
  // in the identical double arithmetic, then pins R at e6.
  private val q139Cb = Similarity.pqCodebook(m = 2, numCodes = 4,
    subDim = 1)

  val q139: Q = (s, d) => {
    import s.implicits._
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        slice(Similarity.toDoubleVec(col("embedding")), 1, 2).as("v"))
    val cb = Similarity.pqCodebookDf(s, q139Cb)
    val y = Similarity.pqDecode(
      Similarity.pqEncode(e, cb, m = 2, subDim = 1), cb, m = 2, subDim = 1)
    val rows = Similarity.crossMoment(e, y, dim = 2)
      .select(col("i").cast("int"), col("j").cast("int"),
        col("m_e6").cast("long")).collect()
    val mm = rows.map(r => (r.getInt(0), r.getInt(1)) ->
      r.getLong(2).toDouble / 1e6).toMap
    val r = Similarity.procrustesRotation(
      Seq.tabulate(2, 2)((i, j) => mm((i + 1, j + 1))))
    (for { i <- 1 to 2; j <- 1 to 2 } yield
      (i.toLong, j.toLong,
        math.floor(r(i - 1)(j - 1) * 1e6 + 0.5).toLong))
      .toDF("i", "j", "r_e6").orderBy("i", "j")
  }

  val q139Sql: String =
    s"""WITH e AS (SELECT vec_id AS id,
       |    list_slice(CAST(embedding AS DOUBLE[]), 1, 2) AS v
       |  FROM embeddings),
       |cb AS (SELECT * FROM ${Similarity.pqCodebookDuckSql(q139Cb)}
       |       AS t(sub, code, cv)),
       |sp AS (SELECT id, s.sub AS sub,
       |    list_slice(v, s.sub + 1, s.sub + 1) AS subv
       |  FROM e, (SELECT unnest(range(0, 2)) AS sub) s),
       |dd AS (SELECT id, sp.sub AS sub, code,
       |    CAST(floor(list_sum(list_transform(range(1, 2),
       |        i -> (subv[i] - cv[i]) * (subv[i] - cv[i]))) * 10000 + 0.5)
       |      AS BIGINT) AS d_e4
       |  FROM sp JOIN cb ON cb.sub = sp.sub),
       |codes AS (SELECT id, sub, CAST(min([d_e4, code])[2] AS INT) AS code
       |  FROM dd GROUP BY id, sub),
       |dy AS (SELECT c.id,
       |    max(CASE WHEN c.sub = 0 THEN cb.cv[1] END) AS y1,
       |    max(CASE WHEN c.sub = 1 THEN cb.cv[1] END) AS y2
       |  FROM codes c JOIN cb ON cb.sub = c.sub AND cb.code = c.code
       |  GROUP BY c.id),
       |mo AS (SELECT
       |    CAST(sum(CAST(floor(e.v[1] * dy.y1 * 1e6 + 0.5) AS BIGINT))
       |      AS BIGINT) AS s11,
       |    CAST(sum(CAST(floor(e.v[1] * dy.y2 * 1e6 + 0.5) AS BIGINT))
       |      AS BIGINT) AS s12,
       |    CAST(sum(CAST(floor(e.v[2] * dy.y1 * 1e6 + 0.5) AS BIGINT))
       |      AS BIGINT) AS s21,
       |    CAST(sum(CAST(floor(e.v[2] * dy.y2 * 1e6 + 0.5) AS BIGINT))
       |      AS BIGINT) AS s22
       |  FROM e JOIN dy ON dy.id = e.id),
       |md AS (SELECT CAST(s11 AS DOUBLE) / 1000000 AS m11,
       |    CAST(s12 AS DOUBLE) / 1000000 AS m12,
       |    CAST(s21 AS DOUBLE) / 1000000 AS m21,
       |    CAST(s22 AS DOUBLE) / 1000000 AS m22 FROM mo),
       |j1 AS (SELECT *, m11 * m11 + m21 * m21 AS a,
       |    m12 * m12 + m22 * m22 AS b, m11 * m12 + m21 * m22 AS c
       |  FROM md),
       |j2 AS (SELECT *, CASE WHEN abs(c) > 1e-14 * sqrt(a * b)
       |    THEN (b - a) / (2 * c) END AS tau FROM j1),
       |j3 AS (SELECT *, sign(tau) / (abs(tau) + sqrt(1 + tau * tau)) AS t
       |  FROM j2),
       |j4 AS (SELECT *, coalesce(1 / sqrt(1 + t * t), 1.0) AS cs FROM j3),
       |j5 AS (SELECT *, coalesce(t * cs, 0.0) AS sn FROM j4),
       |wm AS (SELECT *, cs * m11 - sn * m12 AS w11,
       |    cs * m21 - sn * m22 AS w21, sn * m11 + cs * m12 AS w12,
       |    sn * m21 + cs * m22 AS w22 FROM j5),
       |sg AS (SELECT *, sqrt(w11 * w11 + w21 * w21) AS sig1,
       |    sqrt(w12 * w12 + w22 * w22) AS sig2 FROM wm),
       |fin AS (SELECT cs, sn, w11 / sig1 AS u11, w12 / sig2 AS u12,
       |    w21 / sig1 AS u21, w22 / sig2 AS u22 FROM sg)
       |SELECT i, j, r_e6 FROM (
       |  SELECT CAST(1 AS BIGINT) AS i, CAST(1 AS BIGINT) AS j,
       |    CAST(floor((cs * u11 + sn * u12) * 1000000 + 0.5) AS BIGINT)
       |      AS r_e6 FROM fin
       |  UNION ALL SELECT 1, 2,
       |    CAST(floor((cs * u21 + sn * u22) * 1000000 + 0.5) AS BIGINT)
       |    FROM fin
       |  UNION ALL SELECT 2, 1,
       |    CAST(floor((-sn * u11 + cs * u12) * 1000000 + 0.5) AS BIGINT)
       |    FROM fin
       |  UNION ALL SELECT 2, 2,
       |    CAST(floor((-sn * u21 + cs * u22) * 1000000 + 0.5) AS BIGINT)
       |    FROM fin)
       |ORDER BY i, j""".stripMargin

  // ---- q141 hard-negative mining (contrastive training-set prep) --------
  // The IVF serving form: per anchor, top-k highest-cosine DIFFERENT-label
  // candidates inside the probed cells, with the false-negative ceiling
  // (score ≤ ceil — a ≥ceiling "negative" is a probable mislabeled dup)
  // and the easy-negative floor both active. Deterministic given the q31
  // centroid convention, so the oracle replays the cell assignment, label
  // predicate, and score band verbatim — an EXACT compare, with
  // recall-vs-exact measured separately in tools.Recall.
  val q141: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"), col("label"))
    val centroids = e.filter(col("id") % 25 === 0).select("id", "v")
    val queries = e.filter(col("id") < 30)
    Similarity.hardNegativesIvf(e, centroids, queries, nprobe = 2, k = 3,
        scoreCeilE4 = 9990L, scoreFloorE4 = 0L)
      .orderBy("vec_id", "rank")
  }

  val q141Sql: String = {
    def cos(a: String, b: String) = Similarity.cosineDuckSql(a, b)
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
       |    label FROM embeddings),
       |cent AS (SELECT id AS cid, v AS cv FROM e WHERE id % 25 = 0),
       |assigned AS (
       |  SELECT id AS other_id, v AS vb, label AS clabel, cid FROM (
       |    SELECT e.id, e.v, e.label, c.cid,
       |      row_number() OVER (PARTITION BY e.id
       |        ORDER BY ${cos("e.v", "c.cv")} DESC, c.cid ASC) AS rn
       |    FROM e CROSS JOIN cent c) t(id, v, label, cid, rn) WHERE rn = 1),
       |probed AS (
       |  SELECT id AS vec_id, v AS va, label AS qlabel, cid FROM (
       |    SELECT q.id, q.v, q.label, c.cid,
       |      row_number() OVER (PARTITION BY q.id
       |        ORDER BY ${cos("q.v", "c.cv")} DESC, c.cid ASC) AS rn
       |    FROM e q CROSS JOIN cent c WHERE q.id < 30) t(id, v, label, cid, rn)
       |  WHERE rn <= 2),
       |cand AS (
       |  SELECT p.vec_id, a.other_id,
       |    ${Similarity.scoreE4DuckSql(cos("p.va", "a.vb"))} AS score_e4
       |  FROM probed p JOIN assigned a USING (cid)
       |  WHERE p.vec_id <> a.other_id AND p.qlabel <> a.clabel),
       |banded AS (SELECT * FROM cand WHERE score_e4 BETWEEN 0 AND 9990),
       |r AS (SELECT vec_id, other_id, score_e4,
       |    CAST(row_number() OVER (PARTITION BY vec_id
       |      ORDER BY score_e4 DESC, other_id ASC) AS BIGINT) AS rank
       |  FROM banded)
       |SELECT vec_id, other_id, score_e4, rank FROM r WHERE rank <= 3
       |ORDER BY vec_id, rank""".stripMargin
  }

  // ---- family registry --------------------------------------------------

  // ---- q149 NN-Descent kNN graph (deterministic replay) ------------------
  // KnnGraph.knnGraph on 40 embeddings, k=4, TWO refinement rounds. The
  // oracle REPLAYS the algorithm step for step (the q142 FFBS
  // discipline — not a brute-force shortcut, the stated algorithm): the
  // md5-ring init (row_number over (md5(id), id), ring offsets 1..k),
  // then per round undirect → neighbor-of-neighbor join → union
  // incumbents → distinct → e4-cosine score → per-node top-k with the
  // (score desc, nbr asc) tiebreak. Every intermediate is exact integer
  // or the cosine double both engines compute bit-identically (q23).
  val q149: Q = (s, d) => {
    val e = Tables.embeddings(s, d).filter(col("vec_id") < 40)
      .select(col("vec_id").as("id"),
        graft.operators.Similarity.toDoubleVec(col("embedding")).as("v"))
    graft.operators.KnnGraph.knnGraph(e, k = 4, iters = 2)
      .orderBy("id", "rnk")
  }

  val q149Sql: String = {
    val cos = graft.operators.Similarity.scoreE4DuckSql(
      graft.operators.Similarity.cosineDuckSql("a.v", "b.v"))
    // one refinement round: undirect `g` → N(N) candidates ∪ incumbents
    // → score → top-k
    def round(g: String, out: String): String =
      s"""u_$out AS (
         |  SELECT id, nbr FROM $g
         |  UNION ALL SELECT nbr AS id, id AS nbr FROM $g),
         |c_$out AS (
         |  SELECT DISTINCT id, nbr FROM (
         |    SELECT e1.id, e2.nbr FROM u_$out e1
         |    JOIN u_$out e2 ON e1.nbr = e2.id WHERE e1.id <> e2.nbr
         |    UNION ALL SELECT id, nbr FROM $g)),
         |s_$out AS (
         |  SELECT c.id, c.nbr, $cos AS score_e4
         |  FROM c_$out c JOIN e a ON a.id = c.id JOIN e b ON b.id = c.nbr),
         |$out AS (
         |  SELECT id, nbr, score_e4, rnk FROM (
         |    SELECT id, nbr, score_e4,
         |      CAST(row_number() OVER (PARTITION BY id
         |        ORDER BY score_e4 DESC, nbr ASC) AS BIGINT) AS rnk
         |    FROM s_$out) WHERE rnk <= 4)""".stripMargin
    s"""WITH e AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE vec_id < 40),
       |rk AS (
       |  SELECT id, CAST(row_number() OVER (
       |    ORDER BY md5(CAST(id AS VARCHAR)), id) AS BIGINT) AS r FROM e),
       |cnt AS (SELECT count(*) AS n FROM e),
       |init AS (
       |  SELECT a.id, b.id AS nbr
       |  FROM rk a CROSS JOIN cnt
       |  CROSS JOIN unnest(generate_series(1, 4)) o(off)
       |  JOIN rk b ON b.r = (a.r - 1 + o.off) % cnt.n + 1),
       |s_g0 AS (
       |  SELECT i.id, i.nbr, $cos AS score_e4
       |  FROM init i JOIN e a ON a.id = i.id JOIN e b ON b.id = i.nbr),
       |g0 AS (
       |  SELECT id, nbr, score_e4, rnk FROM (
       |    SELECT id, nbr, score_e4,
       |      CAST(row_number() OVER (PARTITION BY id
       |        ORDER BY score_e4 DESC, nbr ASC) AS BIGINT) AS rnk
       |    FROM s_g0) WHERE rnk <= 4),
       |${round("g0", "g1")},
       |${round("g1", "g2")}
       |SELECT id, nbr, score_e4, rnk FROM g2 ORDER BY id, rnk""".stripMargin
  }

  // ---- q152 graph-ANN beam search (deterministic replay) -----------------
  // KnnGraph.beamSearch over a knnGraph(k=4, 1 round) on 40 embeddings:
  // 2 md5-ring entry seeds, beam 6, TWO expansion rounds, top-3. The
  // oracle REPLAYS the walk step for step (the q142/q149 discipline):
  // graph init + 1 NN-Descent round (the q149 SQL), then per beam round
  // frontier = ¬visited pool → edge join minus pooled nodes → e4-cosine
  // score → merged pool re-capped at 6 with the whole prior pool flipped
  // visited; final per-query top-3 excludes self. Every intermediate is
  // exact integer or the bit-identical cosine double (q23 parity).
  val q152: Q = (s, d) => {
    val e = Tables.embeddings(s, d).filter(col("vec_id") < 40)
      .select(col("vec_id").as("id"),
        graft.operators.Similarity.toDoubleVec(col("embedding")).as("v"))
    val g = graft.operators.KnnGraph.knnGraph(e, k = 4, iters = 1)
    val entries = graft.core.Ops.globalRank(e.select("id"),
        Seq(md5(col("id").cast("string")), col("id")), "r")
      .filter(col("r") <= 2).select("id")
    graft.operators.KnnGraph.beamSearch(g, e,
        e.filter(col("id") % 10 === 3), entries,
        k = 3, beamWidth = 6, rounds = 2)
      .orderBy("vec_id", "rank")
  }

  val q152Sql: String = {
    val cos = graft.operators.Similarity.scoreE4DuckSql(
      graft.operators.Similarity.cosineDuckSql("a.v", "b.v"))
    val cosQ = graft.operators.Similarity.scoreE4DuckSql(
      graft.operators.Similarity.cosineDuckSql("q.v", "b.v"))
    // one NN-Descent refinement round (the q149 replay text)
    def ground(g: String, out: String): String =
      s"""u_$out AS (
         |  SELECT id, nbr FROM $g
         |  UNION ALL SELECT nbr AS id, id AS nbr FROM $g),
         |c_$out AS (
         |  SELECT DISTINCT id, nbr FROM (
         |    SELECT e1.id, e2.nbr FROM u_$out e1
         |    JOIN u_$out e2 ON e1.nbr = e2.id WHERE e1.id <> e2.nbr
         |    UNION ALL SELECT id, nbr FROM $g)),
         |s_$out AS (
         |  SELECT c.id, c.nbr, $cos AS score_e4
         |  FROM c_$out c JOIN e a ON a.id = c.id JOIN e b ON b.id = c.nbr),
         |$out AS (
         |  SELECT id, nbr, score_e4, rnk FROM (
         |    SELECT id, nbr, score_e4,
         |      CAST(row_number() OVER (PARTITION BY id
         |        ORDER BY score_e4 DESC, nbr ASC) AS BIGINT) AS rnk
         |    FROM s_$out) WHERE rnk <= 4)""".stripMargin
    // one beam round: frontier → new candidates → score → re-capped pool
    def bround(pin: String, out: String): String =
      s"""x_$out AS (SELECT qid, node FROM $pin WHERE NOT visited),
         |bc_$out AS (
         |  SELECT DISTINCT x.qid, g.nbr AS node
         |  FROM x_$out x JOIN g1 g ON g.id = x.node
         |  WHERE NOT EXISTS (SELECT 1 FROM $pin p
         |    WHERE p.qid = x.qid AND p.node = g.nbr)),
         |bs_$out AS (
         |  SELECT c.qid, c.node, $cosQ AS score_e4, false AS visited
         |  FROM bc_$out c JOIN q ON q.qid = c.qid JOIN e b ON b.id = c.node),
         |$out AS (
         |  SELECT qid, node, score_e4, visited FROM (
         |    SELECT qid, node, score_e4, visited,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY score_e4 DESC, node ASC) AS rn
         |    FROM (SELECT qid, node, score_e4, true AS visited FROM $pin
         |      UNION ALL
         |      SELECT qid, node, score_e4, visited FROM bs_$out))
         |  WHERE rn <= 6)""".stripMargin
    s"""WITH e AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE vec_id < 40),
       |rk AS (
       |  SELECT id, CAST(row_number() OVER (
       |    ORDER BY md5(CAST(id AS VARCHAR)), id) AS BIGINT) AS r FROM e),
       |cnt AS (SELECT count(*) AS n FROM e),
       |init AS (
       |  SELECT a.id, b.id AS nbr
       |  FROM rk a CROSS JOIN cnt
       |  CROSS JOIN unnest(generate_series(1, 4)) o(off)
       |  JOIN rk b ON b.r = (a.r - 1 + o.off) % cnt.n + 1),
       |s_g0 AS (
       |  SELECT i.id, i.nbr, $cos AS score_e4
       |  FROM init i JOIN e a ON a.id = i.id JOIN e b ON b.id = i.nbr),
       |g0 AS (
       |  SELECT id, nbr, score_e4, rnk FROM (
       |    SELECT id, nbr, score_e4,
       |      CAST(row_number() OVER (PARTITION BY id
       |        ORDER BY score_e4 DESC, nbr ASC) AS BIGINT) AS rnk
       |    FROM s_g0) WHERE rnk <= 4),
       |${ground("g0", "g1")},
       |ent AS (SELECT id AS node FROM rk WHERE r <= 2),
       |q AS (SELECT id AS qid, v FROM e WHERE id % 10 = 3),
       |sp0 AS (
       |  SELECT q.qid, ent.node, $cosQ AS score_e4
       |  FROM q CROSS JOIN ent JOIN e b ON b.id = ent.node),
       |p0 AS (
       |  SELECT qid, node, score_e4, false AS visited FROM (
       |    SELECT qid, node, score_e4,
       |      row_number() OVER (PARTITION BY qid
       |        ORDER BY score_e4 DESC, node ASC) AS rn
       |    FROM sp0) WHERE rn <= 6),
       |${bround("p0", "p1")},
       |${bround("p1", "p2")}
       |SELECT vec_id, other_id, score_e4, rank FROM (
       |  SELECT qid AS vec_id, node AS other_id, score_e4,
       |    CAST(row_number() OVER (PARTITION BY qid
       |      ORDER BY score_e4 DESC, node ASC) AS BIGINT) AS rank
       |  FROM p2 WHERE qid <> node)
       |WHERE rank <= 3
       |ORDER BY vec_id, rank""".stripMargin
  }

  // ---- q155 persisted-graph batch append (deterministic replay) ----------
  // KnnGraph.appendToKnnIndex: base index over 30 embeddings (k=3, 1
  // NN-Descent round, 2-entry ring), then a 10-vector batch inserted —
  // old-side neighbors via a beam walk of the base graph (bw=6, 2
  // rounds), within-batch edges via NN-Descent over the batch alone,
  // merged top-3 lists plus ranked reverse augments. The oracle REPLAYS
  // all three pieces (the q149 ring/round text over base AND batch, the
  // q152 walk text with batch-vector queries) and the merge arithmetic
  // — every intermediate exact integer or the bit-identical cosine
  // double (q23 parity). Output = the batch partition's edge rows.
  val q155: Q = (s, d) => {
    val all = Tables.embeddings(s, d).filter(col("vec_id") < 40)
      .select(col("vec_id").as("id"),
        graft.operators.Similarity.toDoubleVec(col("embedding")).as("v"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_q155").toString
    graft.operators.KnnGraph.writeKnnIndex(all.filter(col("id") < 30),
      dir, k = 3, iters = 1, maxEntries = 2)
    graft.operators.KnnGraph.appendToKnnIndex(s, dir,
      all.filter(col("id") >= 30), "b1", beamWidth = 6, rounds = 2,
      numEntries = 2, batchIters = 1)
    s.read.parquet(s"$dir/edges_batches")
      .select("id", "nbr", "score_e4", "rnk")
      .orderBy("id", "rnk", "nbr")
  }

  val q155Sql: String = {
    val cos = graft.operators.Similarity.scoreE4DuckSql(
      graft.operators.Similarity.cosineDuckSql("a.v", "b.v"))
    val cosQ = graft.operators.Similarity.scoreE4DuckSql(
      graft.operators.Similarity.cosineDuckSql("q.v", "b.v"))
    // md5-ring init + top-k over an id table `ids`, k = 3
    def ring(ids: String, tag: String): String =
      s"""rk_$tag AS (
         |  SELECT id, CAST(row_number() OVER (
         |    ORDER BY md5(CAST(id AS VARCHAR)), id) AS BIGINT) AS r
         |  FROM $ids),
         |cnt_$tag AS (SELECT count(*) AS n FROM $ids),
         |init_$tag AS (
         |  SELECT a.id, b.id AS nbr
         |  FROM rk_$tag a CROSS JOIN cnt_$tag
         |  CROSS JOIN unnest(generate_series(1, 3)) o(off)
         |  JOIN rk_$tag b ON b.r = (a.r - 1 + o.off) % cnt_$tag.n + 1),
         |s_${tag}0 AS (
         |  SELECT i.id, i.nbr, $cos AS score_e4
         |  FROM init_$tag i JOIN e a ON a.id = i.id
         |  JOIN e b ON b.id = i.nbr),
         |${tag}0 AS (
         |  SELECT id, nbr, score_e4, rnk FROM (
         |    SELECT id, nbr, score_e4,
         |      CAST(row_number() OVER (PARTITION BY id
         |        ORDER BY score_e4 DESC, nbr ASC) AS BIGINT) AS rnk
         |    FROM s_${tag}0) WHERE rnk <= 3)""".stripMargin
    // one NN-Descent round (k = 3)
    def ground(g: String, out: String): String =
      s"""u_$out AS (
         |  SELECT id, nbr FROM $g
         |  UNION ALL SELECT nbr AS id, id AS nbr FROM $g),
         |c_$out AS (
         |  SELECT DISTINCT id, nbr FROM (
         |    SELECT e1.id, e2.nbr FROM u_$out e1
         |    JOIN u_$out e2 ON e1.nbr = e2.id WHERE e1.id <> e2.nbr
         |    UNION ALL SELECT id, nbr FROM $g)),
         |s_$out AS (
         |  SELECT c.id, c.nbr, $cos AS score_e4
         |  FROM c_$out c JOIN e a ON a.id = c.id JOIN e b ON b.id = c.nbr),
         |$out AS (
         |  SELECT id, nbr, score_e4, rnk FROM (
         |    SELECT id, nbr, score_e4,
         |      CAST(row_number() OVER (PARTITION BY id
         |        ORDER BY score_e4 DESC, nbr ASC) AS BIGINT) AS rnk
         |    FROM s_$out) WHERE rnk <= 3)""".stripMargin
    // one beam round over base graph g1, beam width 6
    def bround(pin: String, out: String): String =
      s"""x_$out AS (SELECT qid, node FROM $pin WHERE NOT visited),
         |bc_$out AS (
         |  SELECT DISTINCT x.qid, g.nbr AS node
         |  FROM x_$out x JOIN g1 g ON g.id = x.node
         |  WHERE NOT EXISTS (SELECT 1 FROM $pin p
         |    WHERE p.qid = x.qid AND p.node = g.nbr)),
         |bs_$out AS (
         |  SELECT c.qid, c.node, $cosQ AS score_e4, false AS visited
         |  FROM bc_$out c JOIN q ON q.qid = c.qid JOIN e b ON b.id = c.node),
         |$out AS (
         |  SELECT qid, node, score_e4, visited FROM (
         |    SELECT qid, node, score_e4, visited,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY score_e4 DESC, node ASC) AS rn
         |    FROM (SELECT qid, node, score_e4, true AS visited FROM $pin
         |      UNION ALL
         |      SELECT qid, node, score_e4, visited FROM bs_$out))
         |  WHERE rn <= 6)""".stripMargin
    s"""WITH e AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE vec_id < 40),
       |eb AS (SELECT id FROM e WHERE id < 30),
       |bb AS (SELECT id FROM e WHERE id >= 30),
       |${ring("eb", "g")},
       |${ground("g0", "g1")},
       |ent AS (SELECT id AS node FROM rk_g WHERE r <= 2),
       |q AS (SELECT id AS qid, v FROM e WHERE id >= 30),
       |sp0 AS (
       |  SELECT q.qid, ent.node, $cosQ AS score_e4
       |  FROM q CROSS JOIN ent JOIN e b ON b.id = ent.node),
       |p0 AS (
       |  SELECT qid, node, score_e4, false AS visited FROM (
       |    SELECT qid, node, score_e4,
       |      row_number() OVER (PARTITION BY qid
       |        ORDER BY score_e4 DESC, node ASC) AS rn
       |    FROM sp0) WHERE rn <= 6),
       |${bround("p0", "p1")},
       |${bround("p1", "p2")},
       |oldside AS (
       |  SELECT qid AS id, node AS nbr, score_e4 FROM (
       |    SELECT qid, node, score_e4,
       |      row_number() OVER (PARTITION BY qid
       |        ORDER BY score_e4 DESC, node ASC) AS rank
       |    FROM p2 WHERE qid <> node) WHERE rank <= 3),
       |${ring("bb", "h")},
       |${ground("h0", "h1")},
       |cand AS (
       |  SELECT id, nbr, score_e4 FROM oldside
       |  UNION ALL SELECT id, nbr, score_e4 FROM h1),
       |newl AS (
       |  SELECT id, nbr, score_e4, rnk FROM (
       |    SELECT id, nbr, score_e4,
       |      CAST(row_number() OVER (PARTITION BY id
       |        ORDER BY score_e4 DESC, nbr ASC) AS BIGINT) AS rnk
       |    FROM cand) WHERE rnk <= 3),
       |rev AS (
       |  SELECT id, nbr, score_e4,
       |    CAST(row_number() OVER (PARTITION BY id
       |      ORDER BY score_e4 DESC, nbr ASC) AS BIGINT) AS rnk
       |  FROM (SELECT nbr AS id, id AS nbr, score_e4 FROM newl
       |    WHERE nbr < 30))
       |SELECT id, nbr, score_e4, rnk FROM (
       |  SELECT id, nbr, score_e4, rnk FROM newl
       |  UNION ALL SELECT id, nbr, score_e4, rnk FROM rev)
       |ORDER BY id, rnk, nbr""".stripMargin
  }

  // ---- q165 embedding increment vs persisted semantic state --------------
  // Increment.curateEmbeddingIncrement twice over (b1 bootstraps —
  // centroids drawn from its exact-surviving non-zero vectors by the
  // replayable md5%25 rule — b2 runs against the frozen state, then b2
  // RERUNS under its batch id: the q157/q160/q161 idempotence
  // discipline). Vectors come from the embeddings table; variants are
  // the proven-parity transforms (near = x*1.1+0.01, the q30/q70
  // plant; flip = md5-keyed per-component sign, orthogonal-ish fresh
  // directions; zero = the all-zero vector exercising the
  // never-semantically-pairable path). Exact payload equality <=>
  // identical (src, form); the oracle replays centroid sampling,
  // nassign=2 assignment, shared-cell cosine pairs, components, and
  // the two-batch funnel verbatim.
  private def q165Flip(off: Long) =
    s"transform(v0, (x, i) -> x * CASE WHEN conv(substring(md5(" +
      s"concat(cast(src AS STRING), ':', cast(i AS STRING))), 1, 8), " +
      s"16, 10) % 2 = 0 THEN ${off}D ELSE -${off}D END)"

  def q165Vecs(s: SparkSession, d: String, batch: String): DataFrame = {
    val base = Tables.embeddings(s, d).filter(col("vec_id") < 200)
      .select(col("vec_id").as("src"),
        Similarity.toDoubleVec(col("embedding")).as("v0"))
    def mk(off: Long, mod: Int, form: String): DataFrame =
      base.filter(col("src") % 10 === mod)
        .select((col("src") + off).as("id"), expr(form).as("v"))
    val near = "transform(v0, x -> x * 1.1D + 0.01D)"
    if (batch == "b1")
      base.select(col("src").as("id"), col("v0").as("v"))
        .unionByName(mk(100000L, 0, "v0"))
        .unionByName(mk(200000L, 1, near))
    else
      mk(300000L, 2, "v0")
        .unionByName(mk(400000L, 3, near))
        .unionByName(mk(900000L, 1, near))
        .unionByName(mk(500000L, 4, q165Flip(1L)))
        .unionByName(mk(600000L, 4,
          s"transform(${q165Flip(1L)}, x -> x * 1.1D + 0.01D)"))
        .unionByName(mk(700000L, 5, q165Flip(1L)))
        .unionByName(s.range(2)
          .select((col("id") + 999998L).as("id"),
            expr("transform(sequence(1, 8), x -> 0D)").as("v")))
  }

  val q165: Q = (s, d) => {
    import graft.pipeline.Increment
    val fp = dataFingerprint(Tables.embeddings(s, d)
      .filter(col("vec_id") < 200).select(col("vec_id"), col("embedding")))
    memoizedReplay(s, "q165", d, fp) {
      val dir = scratchDir("graft_q165_state")
      Increment.curateEmbeddingIncrement(q165Vecs(s, d, "b1"), dir, "b1")
      Increment.curateEmbeddingIncrement(q165Vecs(s, d, "b2"), dir, "b2")
      Increment.curateEmbeddingIncrement(q165Vecs(s, d, "b2"), dir, "b2")
      Increment.readLedger(s, dir)
        .select(col("batch_id"), col("id"), col("admitted"),
          col("reason"), col("dup_of"))
        .orderBy("batch_id", "id")
    }
  }

  val q165Sql: String = {
    def cos(a: String, b: String) = Similarity.cosineDuckSql(a, b)
    def replayExact(t: String, bt: String, st: String): String =
      s"""${t}_ex_st AS MATERIALIZED (SELECT c.id AS cid, min(sc.id) AS dup_of
         |  FROM vv c JOIN vv sc ON sc.src = c.src AND sc.frm = c.frm
         |  WHERE c.id IN (SELECT id FROM $bt)
         |    AND sc.id IN (SELECT id FROM $st)
         |  GROUP BY c.id),
         |${t}_p1 AS MATERIALIZED (SELECT id FROM $bt
         |  WHERE id NOT IN (SELECT cid FROM ${t}_ex_st)),
         |${t}_keep AS MATERIALIZED (SELECT src, frm, min(id) AS keep
         |  FROM vv WHERE id IN (SELECT id FROM ${t}_p1)
         |  GROUP BY src, frm),
         |${t}_ex_in AS MATERIALIZED (SELECT c.id AS cid, k.keep AS dup_of
         |  FROM vv c JOIN ${t}_keep k
         |    ON k.src = c.src AND k.frm = c.frm
         |  WHERE c.id IN (SELECT id FROM ${t}_p1) AND c.id <> k.keep),
         |${t}_p2 AS MATERIALIZED (SELECT id FROM ${t}_p1
         |  WHERE id NOT IN (SELECT cid FROM ${t}_ex_in))""".stripMargin
    def replaySem(t: String, st: String): String =
      s"""${t}_nd_st AS MATERIALIZED (
         |  SELECT v.src AS cid, min(v.dst) AS dup_of FROM vps v
         |  WHERE v.src IN (SELECT id FROM ${t}_p2)
         |    AND v.dst IN (SELECT id FROM $st)
         |  GROUP BY v.src),
         |${t}_p3 AS MATERIALIZED (SELECT id FROM ${t}_p2
         |  WHERE id NOT IN (SELECT cid FROM ${t}_nd_st)),
         |${t}_edges AS MATERIALIZED (
         |  SELECT ca AS src, cb AS dst FROM vp
         |  WHERE ca IN (SELECT id FROM ${t}_p3)
         |    AND cb IN (SELECT id FROM ${t}_p3)),
         |${t}_und AS (SELECT src, dst FROM ${t}_edges
         |  UNION ALL SELECT dst, src FROM ${t}_edges),
         |${t}_reach(id, r) AS (
         |  SELECT src, src FROM ${t}_und
         |  UNION
         |  SELECT u.src, ${t}_reach.r FROM ${t}_und u
         |  JOIN ${t}_reach ON ${t}_reach.id = u.dst),
         |${t}_nd_in AS (SELECT id AS cid, min(r) AS dup_of
         |  FROM ${t}_reach GROUP BY id HAVING id <> min(r)),
         |${t}_adm AS MATERIALIZED (SELECT id FROM ${t}_p3
         |  WHERE id NOT IN (SELECT cid FROM ${t}_nd_in))""".stripMargin
    def verdicts(t: String, b: String): String =
      s"""  SELECT '$b' AS batch_id, cid AS id, FALSE AS admitted,
         |    'exact_dup' AS reason, dup_of FROM ${t}_ex_st
         |  UNION ALL SELECT '$b', cid, FALSE, 'exact_dup', dup_of
         |  FROM ${t}_ex_in
         |  UNION ALL SELECT '$b', cid, FALSE, 'near_dup', dup_of
         |  FROM ${t}_nd_st
         |  UNION ALL SELECT '$b', cid, FALSE, 'near_dup', dup_of
         |  FROM ${t}_nd_in
         |  UNION ALL SELECT '$b', id, TRUE, 'admitted', id
         |  FROM ${t}_adm""".stripMargin
    val flip = "list_transform(range(1, len(v0) + 1), i -> v0[i] * " +
      "CASE WHEN ('0x' || substr(md5(src || ':' || (i - 1)), 1, 8))" +
      "::BIGINT % 2 = 0 THEN 1 ELSE -1 END)"
    s"""WITH RECURSIVE
       |base AS MATERIALIZED (
       |  SELECT vec_id AS src, CAST(embedding AS DOUBLE[]) AS v0
       |  FROM embeddings WHERE vec_id < 200),
       |vv AS MATERIALIZED (
       |  SELECT src, src AS id, 0 AS frm, 'b1' AS b, v0 AS v FROM base
       |  UNION ALL SELECT src, src + 100000, 0, 'b1', v0 FROM base
       |  WHERE src % 10 = 0
       |  UNION ALL SELECT src, src + 200000, 1, 'b1',
       |    list_transform(v0, x -> x * 1.1 + 0.01) FROM base
       |  WHERE src % 10 = 1
       |  UNION ALL SELECT src, src + 300000, 0, 'b2', v0 FROM base
       |  WHERE src % 10 = 2
       |  UNION ALL SELECT src, src + 400000, 1, 'b2',
       |    list_transform(v0, x -> x * 1.1 + 0.01) FROM base
       |  WHERE src % 10 = 3
       |  UNION ALL SELECT src, src + 900000, 1, 'b2',
       |    list_transform(v0, x -> x * 1.1 + 0.01) FROM base
       |  WHERE src % 10 = 1
       |  UNION ALL SELECT src, src + 500000, 2, 'b2', $flip FROM base
       |  WHERE src % 10 = 4
       |  UNION ALL SELECT src, src + 600000, 3, 'b2',
       |    list_transform($flip, x -> x * 1.1 + 0.01) FROM base
       |  WHERE src % 10 = 4
       |  UNION ALL SELECT src, src + 700000, 2, 'b2', $flip FROM base
       |  WHERE src % 10 = 5
       |  UNION ALL SELECT 0, 999998 + z.z, 9, 'b2',
       |    list_transform(range(1, 9), x -> CAST(0 AS DOUBLE))
       |  FROM range(2) z(z)),
       |bt1 AS MATERIALIZED (SELECT id FROM vv WHERE b = 'b1'),
       |bt2 AS MATERIALIZED (SELECT id FROM vv WHERE b = 'b2'),
       |s0 AS MATERIALIZED (SELECT id FROM vv WHERE FALSE),
       |${replayExact("r1", "bt1", "s0")},
       |cent AS MATERIALIZED (
       |  SELECT id AS ccid, v AS cv FROM vv
       |  WHERE id IN (SELECT id FROM r1_p2) AND frm <> 9
       |    AND ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT
       |      % 25 = 0),
       |assigned AS MATERIALIZED (
       |  SELECT id, v, ccid FROM (
       |    SELECT w.id, w.v, c.ccid,
       |      row_number() OVER (PARTITION BY w.id
       |        ORDER BY ${cos("w.v", "c.cv")} DESC, c.ccid ASC) AS rn
       |    FROM (SELECT id, v FROM vv WHERE frm <> 9) w
       |    CROSS JOIN cent c) t(id, v, ccid, rn)
       |  WHERE rn <= 2),
       |vp AS MATERIALIZED (
       |  SELECT DISTINCT a.id AS ca, b.id AS cb
       |  FROM assigned a JOIN assigned b USING (ccid)
       |  WHERE a.id < b.id AND ${cos("a.v", "b.v")} >= 0.9),
       |vps AS MATERIALIZED (SELECT ca AS src, cb AS dst FROM vp
       |  UNION ALL SELECT cb, ca FROM vp),
       |${replaySem("r1", "s0")},
       |s1 AS MATERIALIZED (SELECT id FROM r1_adm),
       |${replayExact("r2", "bt2", "s1")},
       |${replaySem("r2", "s1")},
       |out AS (
       |${verdicts("r1", "b1")}
       |  UNION ALL
       |${verdicts("r2", "b2")})
       |SELECT batch_id, CAST(id AS BIGINT) AS id, admitted, reason,
       |  CAST(dup_of AS BIGINT) AS dup_of
       |FROM out ORDER BY batch_id, id""".stripMargin
  }

  private[probes] val queries: Map[String, Q] = Map(
    "q165_embedding_increment" -> q165,
    "q152_beam_search" -> q152,
    "q155_graph_append" -> q155,
    "q149_nn_descent" -> q149,
    "q30_cosine_neardup" -> q30,
    "q31_ivf_ann" -> q31,
    "q40_kmeans_step" -> q40,
    "q52_rplsh_neardup" -> q52,
    "q55_int8_quantization" -> q55,
    "q70_ivf_neardup" -> q70,
    "q86_pq_encode" -> q86,
    "q87_pq_adc_topk" -> q87,
    "q89_ivfpq_topk" -> q89,
    "q92_ivfpq_residual" -> q92,
    "q112_cluster_sample" -> q112,
    "q121_hamming_topk" -> q121,
    "q130_embed_cov" -> q130,
    "q131_power_iter" -> q131,
    "q136_topk_eigen" -> q136,
    "q139_opq_procrustes" -> q139,
    "q141_hard_negatives" -> q141)

  private[probes] val oracleSql: Map[String, String] = Map(
    "q165_embedding_increment" -> q165Sql,
    "q152_beam_search" -> q152Sql,
    "q155_graph_append" -> q155Sql,
    "q149_nn_descent" -> q149Sql,
    "q30_cosine_neardup" -> q30Sql,
    "q31_ivf_ann" -> q31Sql,
    "q40_kmeans_step" -> q40Sql,
    "q52_rplsh_neardup" -> q52Sql,
    "q55_int8_quantization" -> q55Sql,
    "q70_ivf_neardup" -> q70Sql,
    "q86_pq_encode" -> q86Sql,
    "q87_pq_adc_topk" -> q87Sql,
    "q89_ivfpq_topk" -> q89Sql,
    "q92_ivfpq_residual" -> q92Sql,
    "q112_cluster_sample" -> q112Sql,
    "q121_hamming_topk" -> q121Sql,
    "q130_embed_cov" -> q130Sql,
    "q131_power_iter" -> q131Sql,
    "q136_topk_eigen" -> q136Sql,
    "q139_opq_procrustes" -> q139Sql,
    "q141_hard_negatives" -> q141Sql)
}
