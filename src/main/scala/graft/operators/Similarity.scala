package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>` in storage,
  * cast to `array<double>` for arithmetic so the fold order and precision
  * match the DuckDB oracle exactly).
  *
  * Two paths, per the north star:
  *  - [[bruteForceTopK]] — exact baseline: block-join + windowed top-k.
  *    At 100 TB this is the per-query-batch fallback, not the scale path.
  *  - [[ivfTopK]] — the scale path: a coarse quantizer (centroid set,
  *    broadcast — it is small by construction) assigns every vector to its
  *    nearest cell in a single narrow pass; queries probe only `nprobe`
  *    cells, so the candidate join shuffles on cell id and touches
  *    |cells probed| / |cells| of the corpus instead of all of it.
  *  - [[writeIvfIndex]] / [[ivfTopKIndexed]] — the index-reuse form:
  *    training + assignment persist once (assignments partitioned by
  *    cell → probe-time dynamic partition pruning), every later query
  *    batch pays only probe-side work.
  */
object Similarity {

  /** Cosine over two double-array columns — the native codegen'd
    * [[graft.functions.CosineSim]] expression (one fused loop). Left-to-
    * right double accumulation: bit-identical to [[cosineHof]] and to
    * DuckDB's `list_dot_product` composition, so oracle parity holds.
    */
  def cosine(a: String, b: String): Column =
    graft.functions.CosineSim(col(a), col(b))

  /** The same semantics from built-in HOFs only (reference/fallback form;
    * also what the DuckDB oracle mirrors). The CASE guard makes a
    * zero-norm side NULL and is LOAD-BEARING: under ANSI mode (the
    * Spark 4 default) an unguarded double division by zero throws
    * DIVIDE_BY_ZERO at runtime (verified; non-ANSI would give NaN, which
    * orders above every real double). DuckDB's `/` yields NULL, so NULL
    * is also the oracle-parity answer. [[CosineSim]] implements the same
    * rule natively.
    */
  def cosineHof(a: String, b: String): Column = {
    // the zero-guard is an explicit CASE (not nullif): nullif compiles to a
    // common-subexpression With-projection whose attribute hides the
    // norm-product from RewriteHofCosine; the textual duplication below is
    // fused away by that rule (and costs one extra fold only when the
    // extensions are not installed)
    def dot(x: String, y: String) =
      s"aggregate(zip_with($x, $y, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    val den = s"(sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
    expr(s"CASE WHEN $den = 0D THEN CAST(NULL AS DOUBLE) ELSE ${dot(a, b)} / $den END")
  }

  /** DuckDB rendering of [[cosine]]. */
  def cosineDuckSql(a: String, b: String): String =
    s"""list_dot_product($a, $b) /
       (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"""

  def toDoubleVec(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** Scale-4 fixed-point rendering of a similarity score. Scores cross the
    * oracle-compare boundary as scaled BIGINTs, never as DECIMAL-from-double:
    * both engines compute bit-identical doubles, and `floor(x·10⁴ + 0.5)` is
    * exact on them, while `round(double, k) → DECIMAL` proved
    * engine-version-sensitive (round 1: 11 hash mismatches from exactly this).
    */
  def scoreE4(raw: Column): Column = graft.core.Ops.fixedPoint(raw, 4)

  /** DuckDB rendering of [[scoreE4]]. */
  def scoreE4DuckSql(raw: String): String =
    s"CAST(floor(($raw) * 10000 + 0.5) AS BIGINT)"

  /** Exact top-k neighbors for every vector in `queries` against `vectors`.
    * Both inputs: (id, v double-array). Excludes self-matches by id.
    *
    * SCALE GUARD: the non-equi join below plans a BroadcastNestedLoopJoin —
    * exact, correct, and O(|queries|·|corpus|). That is the documented
    * sampled-baseline contract (recall measurement, small query sets); it
    * must not be reachable with a corpus-sized query side. Two tiers:
    * the query side's optimizer-estimated size against `maxQueryBytes`
    * (plan-only, like `Ops.widen`) accepts the common case free; when the
    * estimate is large — which includes FILTER-SAMPLED sides, since basic
    * stats pass a Filter through at full child size — one BOUNDED
    * `limit(maxQueryRows+1).count()` job settles the actual cardinality.
    * Corpus-scale query sets route through [[ivfTopK]] /
    * [[ivfCosineNearDup]]; a caller who really wants the exact quadratic
    * pass raises the bounds deliberately.
    */
  def bruteForceTopK(vectors: DataFrame, queries: DataFrame, k: Int,
                     maxQueryBytes: Long = 64L << 20,
                     maxQueryRows: Int = 100000): DataFrame = {
    val est = queries.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est > maxQueryBytes) {
      val n = queries.limit(maxQueryRows + 1).count()
      require(n <= maxQueryRows,
        s"bruteForceTopK: queries side holds > $maxQueryRows rows " +
          s"(estimate $est bytes). This operator is the exact O(q*n) " +
          "baseline for SAMPLED query sets; use ivfTopK for corpus-scale " +
          "input, or raise maxQueryRows/maxQueryBytes deliberately after " +
          "sizing the nested-loop cost.")
    }
    val q = queries.select(col("id").as("vec_id"), col("v").as("va"))
    val c = vectors.select(col("id").as("other_id"), col("v").as("vb"))
    q.join(c, col("vec_id") =!= col("other_id"))
      .withColumn("score_e4", scoreE4(cosine("va", "vb")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("score_e4").desc, col("other_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select("vec_id", "other_id", "score_e4", "rank")
  }

  /** Best-cell argmax as a PARTIAL-AGGREGATABLE `max(struct(...))` rather
    * than `row_number() over (partition by id)`: the window form shuffles
    * the whole |corpus|×|cells| fan-out on id before reducing, while the
    * aggregate form combines map-side, so the exchange carries ONE row per
    * vector instead of |cells| rows — a |cells|-fold shuffle-volume cut on
    * the biggest stage of every index build. Ordering parity with the old
    * window (`cscore` desc NULLS LAST, `cid` asc): struct comparison is
    * lexicographic, a NULL first field loses to any non-NULL under max
    * (matching NULLS LAST), and the negated cid makes the max prefer the
    * SMALLEST cid on score ties. The payload rides in the struct's last
    * slot — compared only on full (score, cid) ties, which can't happen
    * (cid is unique per centroid row).
    */
  private def argmaxCell(joined: DataFrame, idCol: String,
                         vCol: String): DataFrame =
    joined.groupBy(idCol)
      .agg(max(struct(col("cscore"), (-col("cid")).as("ncid"),
        col(vCol).as("payload"))).as("b"))
      .select(col(idCol), col("b.payload").as(vCol), (-col("b.ncid")).as("cid"))

  /** Top-`n` cells per vector with the same (score desc NULLS LAST, cid
    * asc) order, as a partial-aggregatable collect-sort-slice: only the
    * (sort-key, cid) PAIRS — ~16 bytes per cell, not the embedding — cross
    * the exchange, and the vector itself rides once per group via
    * `first` (well-defined: `v` is functionally dependent on the group
    * key; the centroid join merely replicated it).
    */
  private[graft] def topCells(joined: DataFrame, idCol: String, vCol: String,
                       n: Int): DataFrame = {
    // negated score sorts asc = score desc; NULL score → +Inf sorts last,
    // matching the window form's desc-NULLS-LAST
    val skey = when(col("cscore").isNull, lit(Double.PositiveInfinity))
      .otherwise(-col("cscore"))
    joined.groupBy(idCol)
      .agg(first(col(vCol)).as(vCol),
        slice(array_sort(collect_list(struct(skey.as("nk"), col("cid")))),
          1, n).as("topc"))
      .select(col(idCol), col(vCol), explode(col("topc.cid")).as("cid"))
  }

  /** Corpus→cell assignment: one narrow pass, best centroid by cosine
    * (centroid-id tiebreak). The (other_id, vb, cid) frame IS the IVF
    * index — [[writeIvfIndex]] persists exactly this plus the centroids.
    */
  def ivfAssign(vectors: DataFrame, cent: DataFrame): DataFrame =
    argmaxCell(
      graft.core.Ops.widen(
          vectors.select(col("id").as("other_id"), col("v").as("vb")))
        .join(cent)
        .withColumn("cscore", cosine("vb", "cv")),
      "other_id", "vb")
      .select("other_id", "vb", "cid")

  /** Cluster-balanced subsampling: assign every vector to its nearest
    * centroid cell, then keep the k smallest-PRIORITY members per cell,
    * priority = md5(id) (a deterministic uniform draw — the repo's
    * seedless-sampling convention, oracle-recomputable). The diversity
    * -sampling step of cluster-based data selection (SemDeDup-adjacent:
    * dedup keeps one per near-dup cluster; THIS keeps a budget per
    * semantic cell so no single mode dominates the training mix).
    *
    * Scale shape: the assignment is [[ivfAssign]]'s bounded
    * centroid-set cross + partial-agg argmax; the per-cell top-k is a
    * bounded-output window (plans WindowGroupLimit — partial top-k per
    * partition before the cell shuffle). Output is ≤ cells×k rows.
    *
    * Output: (cid, id, pri, rank), rank 1..k per cell by (pri, id).
    */
  def clusterBalancedSample(vectors: DataFrame, centroids: DataFrame,
                            k: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val cent = broadcast(
      centroids.select(col("id").as("cid"), col("v").as("cv")))
    ivfAssign(vectors, cent)
      .withColumn("pri",
        conv(substring(md5(col("other_id").cast("string")), 1, 8), 16, 10)
          .cast("long"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("cid").orderBy(col("pri").asc, col("other_id").asc))
        .cast("long"))
      .filter(col("rank") <= k)
      .select(col("cid"), col("other_id").as("id"), col("pri"), col("rank"))
  }

  /** Probe-and-rank over an existing assignment: nprobe best cells per
    * query, candidates ranked within probed cells. Shared by the
    * train-inline ([[ivfTopK]]) and index-reuse ([[ivfTopKIndexed]])
    * paths so the query semantics cannot drift between them.
    */
  private def ivfProbeRank(assigned: DataFrame, cent: DataFrame,
                           queries: DataFrame, nprobe: Int, k: Int): DataFrame = {
    // nprobe best cells per query via the partial-aggregatable top-n (the
    // query batch can be corpus-sized in backfill runs — same fan-out
    // argument as the assignment pass)
    val probed = topCells(
      queries.select(col("id").as("vec_id"), col("v").as("va"))
        .join(cent)
        .withColumn("cscore", cosine("va", "cv")),
      "vec_id", "va", nprobe)
      .select("vec_id", "va", "cid")

    // candidate join on cell id — the only corpus-sized shuffle
    probed.join(assigned, Seq("cid"))
      .filter(col("vec_id") =!= col("other_id"))
      .withColumn("score_e4", scoreE4(cosine("va", "vb")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("score_e4").desc, col("other_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select("vec_id", "other_id", "score_e4", "rank")
  }

  /** IVF-style ANN: assign corpus vectors to their best centroid cell
    * (max cosine, centroid-id tiebreak), probe the `nprobe` best cells per
    * query, rank candidates within probed cells. Centroids are broadcast.
    */
  def ivfTopK(vectors: DataFrame, centroids: DataFrame, queries: DataFrame,
              nprobe: Int, k: Int): DataFrame = {
    val cent = broadcast(centroids.select(col("id").as("cid"), col("v").as("cv")))
    ivfProbeRank(ivfAssign(vectors, cent), cent, queries, nprobe, k)
  }

  /** Persist a trained IVF index: `<dir>/centroids` (tiny) and
    * `<dir>/assigned` — the corpus with its cell ids, partitioned BY CELL
    * on disk. Training (Lloyd's iterations) and the corpus assignment
    * pass happen exactly once; every later query batch reads the index
    * and pays only the probe-side work. partitionBy(cid) gives
    * probe-time partition PRUNING: reading candidates for a probe list
    * touches only the nprobe/|cells| fraction of the index files — the
    * scan-level analog of an inverted list seek.
    */
  def writeIvfIndex(vectors: DataFrame, centroids: DataFrame,
                    dir: String): Unit = {
    val cent = broadcast(centroids.select(col("id").as("cid"), col("v").as("cv")))
    centroids.select("id", "v").write.mode("overwrite")
      .parquet(s"$dir/centroids")
    // batch_id partition level (build = "base"): what lets an append
    // RETRY replace its own partitions instead of double-appending —
    // see [[appendToIvfIndex]]. Static overwrite: a rebuild drops every
    // prior batch.
    ivfAssign(vectors, cent).withColumn("batch_id", lit("base"))
      .write.mode("overwrite").partitionBy("batch_id", "cid")
      .option("partitionOverwriteMode", "static")
      .parquet(s"$dir/assigned")
  }

  /** Refuse to append into an index written by the pre-`batch_id`
    * (cid-only) layout: mixing two-level `batch_id=.../cid=...` dirs
    * beside bare `cid=...` dirs makes Parquet partition discovery fail
    * with conflicting partition columns — a silent on-disk format break.
    * Old indexes must be rebuilt (`writeIvf[Pq]Index`) before appending.
    */
  private def requireBatchLayout(fs: org.apache.hadoop.fs.FileSystem,
                                 dir: String, op: String): Unit = {
    val assigned = new org.apache.hadoop.fs.Path(s"$dir/assigned")
    if (fs.exists(assigned)) {
      val legacy = fs.listStatus(assigned)
        .exists(_.getPath.getName.startsWith("cid="))
      require(!legacy,
        s"$op: index at $dir uses the legacy cid-only layout (no " +
        "batch_id partition level); appending would mix partition " +
        "schemas and corrupt discovery - rebuild the index first")
    }
  }

  /** Incrementally append a batch to a persisted IVF index — the
    * daily-append path a 100 TB corpus actually lives on (a full
    * [[writeIvfIndex]] rebuild re-assigns the WHOLE corpus; an append
    * assigns only the new batch). The batch is assigned against the
    * STORED centroids — so `ivfTopKIndexed` over (index(A) then append B)
    * is bit-identical to index(A ∪ B), spec-pinned — and written into the
    * same cell-partitioned layout under its OWN `batch_id` partition
    * with dynamic overwrite: a RETRY of a failed append (same batchId,
    * same data) replaces exactly its own (batch, cell) partitions
    * instead of double-appending vectors — the BM25/minhash appender
    * idempotence contract (retries MUST reuse the id; distinct batches
    * MUST NOT — a reused id replaces the earlier batch). Untouched
    * cells keep their files and readers see the same partition-pruned
    * scans (cid stays a partition column).
    *
    * Returns the per-cell drift report the retrain decision needs:
    * `(cid, n_added, mean_cscore_e4)` — a cell whose new members score
    * far below its centroid (low mean cosine) is drifting; the caller
    * schedules a [[buildIvf]] retrain when enough cells degrade.
    * Centroids themselves are intentionally NOT moved here: assignment
    * must stay frozen between retrains or parity with the stored
    * assignment breaks.
    *
    * Caller contract: batch ids are new (an id already in the index would
    * coexist with its old row — dedup upstream, same as any append sink).
    */
  def appendToIvfIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                       newVectors: DataFrame, batchId: String): DataFrame = {
    require(batchId.nonEmpty && batchId != "base" &&
        batchId != "__HIVE_DEFAULT_PARTITION__",
      s"appendToIvfIndex: invalid batch id '$batchId'")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/centroids")),
      s"appendToIvfIndex: no index at $dir (writeIvfIndex first)")
    requireBatchLayout(fs, dir, "appendToIvfIndex")
    val cent = broadcast(spark.read.parquet(s"$dir/centroids")
      .select(col("id").as("cid"), col("v").as("cv")))
    // one assignment pass over the BATCH only; persisted because it feeds
    // both the layout write and the drift report
    val assigned = ivfAssign(newVectors, cent)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // dynamic overwrite of THIS batch's partitions only: assignment is
      // deterministic under frozen centroids, so a retry touches the
      // same cells and replaces its own earlier (possibly partial) files
      assigned.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").partitionBy("batch_id", "cid")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(s"$dir/assigned")
      // drift: similarity of each appended vector to its OWN centroid —
      // one bounded row per touched cell; eager (the caller's retrain
      // decision reads it, and assigned unpersists when we return)
      val drift = assigned.join(cent, Seq("cid"))
        .withColumn("cscore", cosine("vb", "cv"))
        .groupBy("cid")
        .agg(count(lit(1)).as("n_added"),
          scoreE4(avg(col("cscore"))).as("mean_cscore_e4"))
        .orderBy("cid")
        .localCheckpoint(eager = true)
      drift
    } finally assigned.unpersist()
  }

  /** Query a persisted index ([[writeIvfIndex]]): same semantics as
    * [[ivfTopK]] on the same (vectors, centroids) — parity is spec-pinned
    * — without re-running training or assignment. The cell-id equi-join
    * prunes `assigned` partitions to the probed cells (PartitionFilters
    * on the scan, plan-contract-pinned).
    */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, dir: String,
                     queries: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val cent = broadcast(spark.read.parquet(s"$dir/centroids")
      .select(col("id").as("cid"), col("v").as("cv")))
    val assigned = spark.read.parquet(s"$dir/assigned")
      .select(col("other_id"), col("vb"), col("cid"))
    ivfProbeRank(assigned, cent, queries, nprobe, k)
  }

  /** One k-means refinement step: assign every vector to its best centroid
    * (max cosine), then element-wise mean per cell. Means go through
    * scale-8 fixed-point BIGINT sums — exact, order-independent (so results
    * are reproducible across partitionings), and representation-stable
    * across engines (a double fp sum would vary with partition order; a
    * DECIMAL sum proved oracle-version-sensitive). `m_e8` is the mean
    * scaled by 10⁸. Headroom: |x|≤1-ish embeddings scale to ~10⁸ per
    * element; the BIGINT sum itself holds ~10¹⁰ vectors per cell, but the
    * EXACTNESS bound is the final long→double cast below — exact only
    * under 2⁵³, i.e. ~9·10⁷ vectors per cell. Beyond that the mean is
    * still correct to ~1 ulp but the bit-exact cross-engine guarantee
    * lapses; size numCells so cells stay under ~10⁷ members (also what
    * balanced IVF lists want). The typed convenience path is
    * [[graft.functions.VectorAvg]].
    *
    * Shuffle shape: posexplode fans each vector into `dim` rows shuffled on
    * (cell, pos) with partial aggregation — at 100 TB this is the standard
    * tall-skinny centroid update, no driver involvement.
    */
  def kmeansStep(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val cent = broadcast(centroids.select(col("id").as("cid"), col("v").as("cv")))
    val assigned = argmaxCell(
      graft.core.Ops.widen(vectors.select(col("id"), col("v")))
        .join(cent)
        .withColumn("cscore", cosine("v", "cv")),
      "id", "v")
      .select("id", "v", "cid")
    assigned
      .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .select(col("cid"), col("pos"),
        floor(col("x") * lit(1e8) + lit(0.5)).cast("long").as("xe8"))
      .groupBy("cid", "pos")
      .agg(sum(col("xe8")).as("s"), count(lit(1)).as("n"))
      // s fits a double exactly here (≪ 2^53), so s·1.0/n is bit-identical
      // to the oracle's CAST(sum AS DOUBLE)/count
      .select(col("cid"), col("pos").cast("int").as("pos"),
        floor(col("s") * lit(1.0) / col("n") + lit(0.5)).cast("long").as("m_e8"))
  }

  /** [[kmeansStep]] result gathered back to one centroid array per cell
    * (the form the next assignment pass consumes).
    */
  def gatherCentroids(longForm: DataFrame): DataFrame =
    longForm
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("pos"), col("m_e8")))).as("pm"))
      .select(col("cid"),
        expr("transform(pm, e -> cast(e.m_e8 as double) / 1e8)").as("v"))

  /** Scalar int8 quantization — the embedding-compression step of a
    * 100 TB ANN index (4× smaller than float32, dot products stay
    * SIMD-friendly). Per vector: scale = max|xᵢ|/127 (1.0 for an all-zero
    * vector), qᵢ = round-half-up(xᵢ/scale) clamped to [−127, 127].
    * Long-form output (id, scale_e8, pos, qv) — scalar columns only, with
    * the scale as scale-8 fixed point, so the oracle compare is exact.
    * Pure per-row map: no shuffle beyond the posexplode fan-out.
    */
  def quantizeInt8(vectors: DataFrame): DataFrame = {
    val m = array_max(transform(col("v"), x => abs(x))) / lit(127d)
    val scale = when(m > 0, m).otherwise(lit(1d))
    vectors
      .withColumn("__s", scale)
      .select(col("id"), graft.core.Ops.fixedPoint(col("__s"), 8).as("scale_e8"),
        col("__s"), posexplode(col("v")).as(Seq("pos", "x")))
      .select(col("id"), col("scale_e8"), col("pos").cast("int").as("pos"),
        greatest(lit(-127L), least(lit(127L),
          floor(col("x") / col("__s") + lit(0.5)).cast("long"))).as("qv"))
  }

  /** Sign-bit BINARY quantization: each coordinate keeps only its sign,
    * packed 32 per BIGINT word (32 — not 64 — so no set bit ever reaches
    * the sign position, in the engine or the BIGINT oracle mirror). Bit j
    * of word w is set iff v[32w+j] ≥ 0; positions past `dim` stay 0.
    * 64-dim float32 vectors compress 256 B → 16 B (16×); the distance
    * becomes XOR+popcount. Pure per-row HOF arithmetic — codegen'd, no
    * UDF, no shuffle. Appends `words: array<bigint>` to the frame.
    */
  def quantizeBinary(vectors: DataFrame, dim: Int,
                     vCol: String = "v",
                     outCol: String = "words"): DataFrame = {
    require(dim >= 1, s"quantizeBinary: dim ($dim) must be >= 1")
    val nWords = (dim + 31) / 32
    vectors.withColumn(outCol, expr(
      s"transform(sequence(0, ${nWords - 1}), w -> " +
        s"aggregate(sequence(0, 31), 0L, (acc, j) -> acc + " +
        s"IF(w * 32 + j < $dim AND element_at($vCol, w * 32 + j + 1) >= 0D, " +
        s"shiftleft(1L, j), 0L)))"))
  }

  /** Hamming distance between two packed sign-bit arrays (same length):
    * Σ popcount(aᵢ XOR bᵢ). */
  def hammingDist(aCol: String, bCol: String): Column =
    expr(s"CAST(aggregate(zip_with($aCol, $bCol, " +
      s"(x, y) -> bit_count(x ^ y)), 0, (acc, h) -> acc + h) AS BIGINT)")

  /** Binary-quantized top-k: Hamming SHORTLIST, exact cosine RERANK — the
    * 1-bit analog of the PQ-ADC/refine serving path ([[ivfPqTopKRefined]]):
    * the first pass over the corpus touches only the packed words (16×
    * less memory traffic than the float vectors, dim/32 XOR+popcounts vs
    * dim multiplies per candidate — the word array is the scan column, so
    * parquet column pruning never reads the floats), keeps the `shortlist`
    * Hamming-closest per query, and only those rows pay the exact cosine.
    * Sign-bit Hamming is a monotone proxy for angular distance in
    * expectation (it IS 1-plane-per-coordinate RP-LSH), so a shortlist a
    * few × k recovers near-exact top-k — measured in SCALE.md's recall
    * row rather than assumed. Same query-side scale guard as
    * [[bruteForceTopK]]: the Hamming pass is still O(q·n) — corpus-scale
    * query sets compose cell pruning ([[ivfTopK]]) in front.
    *
    * Output: (vec_id, other_id, hamming, score_e4, rank) — ties by id on
    * both passes, deterministic end to end.
    */
  def hammingTopK(vectors: DataFrame, queries: DataFrame, dim: Int, k: Int,
                  shortlist: Int,
                  maxQueryBytes: Long = 64L << 20,
                  maxQueryRows: Int = 100000): DataFrame = {
    require(k >= 1 && shortlist >= k,
      s"hammingTopK: need shortlist ($shortlist) >= k ($k) >= 1")
    val est = queries.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est > maxQueryBytes) {
      val n = queries.limit(maxQueryRows + 1).count()
      require(n <= maxQueryRows,
        s"hammingTopK: queries side holds > $maxQueryRows rows (estimate " +
          s"$est bytes); compose ivfTopK cell pruning for corpus-scale " +
          "query sets, or raise the bounds deliberately.")
    }
    val q = quantizeBinary(
      queries.select(col("id").as("vec_id"), col("v").as("va")), dim, "va", "qw")
    val c = quantizeBinary(
      vectors.select(col("id").as("other_id"), col("v").as("vb")), dim, "vb", "cw")
    q.join(c, col("vec_id") =!= col("other_id"))
      .withColumn("hamming", hammingDist("qw", "cw"))
      .withColumn("__hrank", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("hamming").asc, col("other_id").asc)))
      .filter(col("__hrank") <= shortlist)
      .withColumn("score_e4", scoreE4(cosine("va", "vb")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("score_e4").desc, col("other_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select("vec_id", "other_id", "hamming", "score_e4", "rank")
  }

  /** Upper-triangle covariance of an embedding corpus — the statistic
    * PCA/whitening/OPQ-rotation training starts from (the standard prep
    * ahead of a PQ codebook when coordinates are correlated). Long-form
    * output (i, j, n, cov_e6), i ≤ j, d(d+1)/2 rows.
    *
    * Integer-exact boundary: per-row products and coordinates round to
    * e6 BIGINTs BEFORE their sums (the q91 discipline — float sums are
    * partition-order-dependent, integer sums exact); the final
    * covariance double derives from those integer sums with the
    * multiply promoted to double FIRST (`(s_i · 1.0) · s_j` — the
    * integer product overflows BIGINT at ~10⁹-scale coordinate sums,
    * in both engines).
    *
    * Scale shape: the d²/2 per-vector explode is the documented cost
    * (64-dim → 2080 rows/vector); the aggregate partial-combines
    * map-side so the shuffle carries one row per (i, j) per partition —
    * d²-bounded, corpus-independent. The d-bounded coordinate-sum table
    * broadcasts back onto it.
    */
  def covarianceUpper(vectors: DataFrame, dim: Int): DataFrame = {
    require(dim >= 1)
    val prods = vectors.select(expr(
      s"explode(flatten(transform(sequence(1, $dim), i -> " +
        s"transform(sequence(i, $dim), j -> named_struct(" +
        "'i', i, 'j', j, 'p_e6', " +
        "CAST(floor(element_at(v, i) * element_at(v, j) * 1e6 + 0.5) " +
        "AS BIGINT)))))) AS pr"))
      .select(col("pr.i").as("i"), col("pr.j").as("j"), col("pr.p_e6"))
      .groupBy("i", "j")
      .agg(sum(col("p_e6")).as("__sp"), count(lit(1)).as("n"))
    val sums = vectors.select(expr(
      s"posexplode(transform(sequence(1, $dim), i -> " +
        "CAST(floor(element_at(v, i) * 1e6 + 0.5) AS BIGINT)))")
      .as(Seq("__pos", "__x")))
      .select((col("__pos") + 1).as("i"), col("__x"))
      .groupBy("i").agg(sum(col("__x")).as("__s"))
    prods
      .join(broadcast(sums.select(col("i"), col("__s").as("__si"))), Seq("i"))
      .join(broadcast(sums.select(col("i").as("j"), col("__s").as("__sj"))),
        Seq("j"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("n"),
        floor((col("__sp") -
          col("__si") * lit(1.0) * col("__sj") / (col("n") * lit(1e6))) /
          col("n") + lit(0.5)).cast("long").as("cov_e6"))
  }

  /** Top principal component by POWER ITERATION over a
    * [[covarianceUpper]] table — the first step of the PCA/whitening/
    * OPQ-rotation chain (dominant eigenvector of the covariance). Fixed
    * deterministic start (all-ones), `steps` unrolled iterations in the
    * q98/q117 discipline: every iterate re-enters integer land before
    * the next matrix product (the unnormalized product `w = C·v` is an
    * EXACT integer sum of e6×e6 products; it down-scales to e6 via
    * floor(w/1e6 + 0.5) so its square-sum stays in BIGINT range — the
    * norm's sqrt is then computed on an exact integer in both engines,
    * making the whole trajectory oracle-mirrorable). The per-step norm
    * is a bounded d-row driver read (the DoReMi per-step collect
    * pattern). Output: (i, v_e6) — the e6 unit eigenvector estimate.
    */
  /** Exact non-wrapping Σ a·b over e6-scaled long columns. A plain long
    * sum wraps SILENTLY under non-ANSI arithmetic once the products of a
    * high-variance or large-dim iterate exceed 2⁶³ (the first power step
    * starts from the all-1e6 vector, so uᵢ ~ Σⱼ cov_e6 — overflow there
    * corrupts the normalization and every later component). decimal(19,0)
    * operands make each product exact (≤ 38 digits) and a decimal(38,0)
    * SUM overflow surfaces as null — turned into a loud require here.
    * Bounded d-row aggregate; the double return is exact below 2⁵³
    * (every green trajectory), and above it degrades gracefully instead
    * of wrapping.
    */
  private def prodSumExact(df: DataFrame, a: String, b: String,
                           what: String): Double = {
    val r = df.agg(
      sum(col(a).cast("decimal(19,0)") * col(b).cast("decimal(19,0)"))
        .as("s"),
      count(lit(1)).as("n")).head()
    if (r.getLong(1) == 0L) 0.0
    else {
      require(!r.isNullAt(0),
        s"$what: sum of ${a}*${b} overflowed decimal(38,0) — input magnitudes " +
          "exceed the e6 fixed-point contract; rescale the input")
      r.getDecimal(0).doubleValue()
    }
  }

  def powerIterationTop(cov: DataFrame, dim: Int,
                        steps: Int = 3): DataFrame = {
    require(dim >= 1 && steps >= 1)
    val spark = cov.sparkSession
    val sym = cov.select(col("i"), col("j"), col("cov_e6"))
      .unionByName(cov.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("cov_e6")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var v = spark.range(1, dim + 1)
      .select(col("id").as("j"), lit(1000000L).as("v_e6"))
    for (_ <- 1 to steps) {
      // eager d-row checkpoint: the norm action below and the next
      // step's join both consume u — without truncation the final
      // vector's lineage would chain every step's join for re-execution
      val u = sym.join(v, Seq("j"))
        .groupBy(col("i"))
        .agg(sum(col("cov_e6") * col("v_e6")).as("__w"))
        .select(col("i"),
          floor(col("__w") / lit(1e6) + lit(0.5)).cast("long").as("__u"))
        .localCheckpoint(true)
      val nrm = math.sqrt(prodSumExact(u, "__u", "__u", "powerIterationTop norm"))
      v = u.select(col("i").as("j"),
        (if (nrm > 0)
          floor(col("__u") / lit(nrm) * lit(1e6) + lit(0.5)).cast("long")
        else col("__u")).as("v_e6"))
    }
    val out = v.select(col("j").as("i"), col("v_e6")).orderBy("i")
    sym.unpersist(false)
    out
  }

  /** Top-k eigenvectors of a [[covarianceUpper]] table by DEFLATED power
    * iteration — the orthogonal basis the parametric-OPQ rotation and
    * top-k PCA consume (q131's top-1 generalized): for each component,
    * run [[powerIterationTop]]'s unrolled integer-exact steps on the
    * CURRENT matrix, then deflate `C ← C − λ·v·vᵀ` with the Rayleigh
    * estimate and recurse on the remainder. Every intermediate re-enters
    * integer land (the q98/q117 discipline): the deflation outer product
    * downs-scales to e6 BEFORE the λ multiply so no product leaves
    * BIGINT range, and λ itself is one double division of two exact
    * integer sums — the whole k-component trajectory is
    * oracle-mirrorable. Matrix state is d²-bounded and checkpointed per
    * component. Output: (comp 1..k, i, v_e6) — e6 unit eigenvector
    * estimates, descending eigenvalue order.
    */
  def topKEigen(cov: DataFrame, dim: Int, k: Int,
                steps: Int = 3): DataFrame = {
    require(dim >= 1 && k >= 1 && k <= dim && steps >= 1)
    val spark = cov.sparkSession
    // Materialize AND reset plan statistics. localCheckpoint alone
    // INHERITS the child's sizeInBytes estimate, and every matvec/deflate
    // join MULTIPLIES its inputs' estimates — u ~ sym·v, deflated
    // sym' ~ sym·v², so the estimate's bit-length grows ~9× per
    // component and BigInteger overflows (> 2^2^31) near component 10
    // (measured). Re-wrapping the checkpointed RDD resets the stats to
    // defaults; frames here are d- or d²-row tiny, so the Row re-encode
    // is noise.
    def mat(df: DataFrame): DataFrame = {
      val cp = df.localCheckpoint(true)
      cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
    }
    var sym = mat(cov.select(col("i"), col("j"), col("cov_e6"))
      .unionByName(cov.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("cov_e6")))) // d²-bounded
    def matvec(m: DataFrame, v: DataFrame): DataFrame =
      mat(m.join(v, Seq("j"))
        .groupBy(col("i"))
        .agg(sum(col("cov_e6") * col("v_e6")).as("__w"))
        .select(col("i"),
          floor(col("__w") / lit(1e6) + lit(0.5)).cast("long").as("__u")))
    val comps = Seq.newBuilder[DataFrame]
    for (c <- 1 to k) {
      var v = spark.range(1, dim + 1)
        .select(col("id").as("j"), lit(1000000L).as("v_e6"))
      for (_ <- 1 to steps) {
        val u = matvec(sym, v)
        val nrm = math.sqrt(prodSumExact(u, "__u", "__u", "topKEigen norm"))
        v = u.select(col("i").as("j"),
          (if (nrm > 0)
            floor(col("__u") / lit(nrm) * lit(1e6) + lit(0.5)).cast("long")
          else col("__u")).as("v_e6"))
      }
      val vc = mat(v)
      comps += vc.select(lit(c.toLong).as("comp"), col("j").as("i"),
        col("v_e6"))
      if (c < k) {
        // Rayleigh λ_e6 = ⌊Σᵢ wᵢ·vᵢ / ⌊Σᵢ vᵢ²/10⁶+½⌋ + ½⌋ with w = C·v
        // (e6) — two exact integer sums, one double division
        val wfin = matvec(sym, vc)
        val num = prodSumExact(
          wfin.join(vc.select(col("j").as("i"), col("v_e6")), Seq("i")),
          "__u", "v_e6", "topKEigen Rayleigh numerator")
        val den = math.floor(
          prodSumExact(vc, "v_e6", "v_e6", "topKEigen Rayleigh denominator")
            / 1e6 + 0.5)
        val lamE6 = math.floor(num / den + 0.5).toLong
        // deflate: outer product down-scaled to e6 FIRST, then λ —
        // ⌊λ_e6·⌊vᵢvⱼ/10⁶+½⌋/10⁶+½⌋ stays within BIGINT
        val vi = vc.select(col("j").as("i"), col("v_e6").as("__vi"))
        val vj = vc.select(col("j"), col("v_e6").as("__vj"))
        sym = sym.join(vi, Seq("i")).join(vj, Seq("j"))
          .select(col("i"), col("j"),
            (col("cov_e6") -
              floor(lit(lamE6) *
                floor(col("__vi") * col("__vj") / lit(1e6) + lit(0.5)) /
                lit(1e6) + lit(0.5)).cast("long")).as("cov_e6"))
        sym = mat(sym)
      }
    }
    comps.result().reduce(_ unionByName _)
  }

  /** Full orthonormal eigenbasis by DRIVER-LOCAL orthogonal iteration —
    * the production OPQ-rotation path. The distributed work is the
    * covariance ([[covarianceUpper]], corpus-sized); the decomposition of
    * the resulting d×d matrix is d²-bounded and belongs on the driver
    * (the [[graft.operators.Bpe]] merge-loop / collected-model
    * discipline — `maxDim` guards the localize). Block power iteration
    * with modified Gram–Schmidt per step; deterministic: identity-column
    * start, fixed iteration count, pure double arithmetic.
    *
    * Why not [[topKEigen]] for a FULL basis: its per-component deflation
    * compounds the λ/v estimation error into the remainder, so trailing
    * components degrade into non-orthogonal noise — measured on the
    * correlated-corpus recall harness, a 64-component deflated "rotation"
    * LOWERED ADC recall (0.232 → 0.177) where this basis raises it.
    * topKEigen remains the distributed path for the top FEW components
    * (oracle-pinned trajectory, q136); this is the serving rotation.
    */
  def eigenBasisLocal(cov: DataFrame, dim: Int, k: Int, iters: Int = 50,
                      maxDim: Int = 1024): Seq[Seq[Double]] =
    eigenBasisLocalWithValues(cov, dim, k, iters, maxDim)._1

  /** [[eigenBasisLocal]] plus each component's Rayleigh eigenvalue —
    * the variance weights [[opqAllocate]] balances across subspaces.
    */
  def eigenBasisLocalWithValues(cov: DataFrame, dim: Int, k: Int,
                                iters: Int = 50, maxDim: Int = 1024)
      : (Seq[Seq[Double]], Seq[Double]) = {
    require(dim >= 1 && k >= 1 && k <= dim && iters >= 1)
    require(dim <= maxDim,
      s"eigenBasisLocal: dim $dim > $maxDim — the d×d collect is the " +
        "localize bound; use topKEigen's distributed path for lead " +
        "components instead")
    val c = Array.ofDim[Double](dim, dim)
    cov.select(col("i").cast("int"), col("j").cast("int"),
        col("cov_e6").cast("long")).collect()
      .foreach { r =>
        val (i, j, v) = (r.getInt(0) - 1, r.getInt(1) - 1, r.getLong(2) / 1e6)
        c(i)(j) = v; c(j)(i) = v
      }
    var v = Array.tabulate(dim, k)((i, cc) => if (i == cc) 1.0 else 0.0)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim, k)((i, cc) =>
        (0 until dim).map(j => c(i)(j) * v(j)(cc)).sum)
      // modified Gram–Schmidt, column order = descending-eigenvalue order
      for (cc <- 0 until k) {
        for (p <- 0 until cc) {
          val d = (0 until dim).map(i => w(i)(cc) * w(i)(p)).sum
          for (i <- 0 until dim) w(i)(cc) -= d * w(i)(p)
        }
        val nrm = math.sqrt((0 until dim).map(i => w(i)(cc) * w(i)(cc)).sum)
        if (nrm > 1e-12) for (i <- 0 until dim) w(i)(cc) /= nrm
        else for (i <- 0 until dim) w(i)(cc) = if (i == cc) 1.0 else 0.0
      }
      v = w
    }
    val basis = (0 until k).map(cc => (0 until dim).map(i => v(i)(cc)))
    val lams = basis.map { row =>
      val cv = (0 until dim).map(i =>
        (0 until dim).map(j => c(i)(j) * row(j)).sum)
      (0 until dim).map(i => row(i) * cv(i)).sum
    }
    (basis, lams)
  }

  /** PCA whitening rows: each eigenbasis row scaled by 1/√λ (λ floored
    * at `minLam` so a near-null direction cannot explode a coordinate) —
    * `rotateExpr(v, whitenRows(...))` then yields unit-variance
    * decorrelated coordinates, the standard preconditioner in front of
    * k-means/quantization when scale imbalance (not just correlation) is
    * the problem. Composes with [[opqAllocate]]-style reordering if a
    * split follows.
    */
  def whitenRows(basis: Seq[Seq[Double]], lams: Seq[Double],
                 minLam: Double = 1e-9): Seq[Seq[Double]] = {
    require(basis.length == lams.length, "basis/λ length mismatch")
    basis.zip(lams).map { case (row, lam) =>
      val s = 1.0 / math.sqrt(math.max(lam, minLam))
      row.map(_ * s)
    }
  }

  /** Eigenvalue allocation (Ge et al. 2013, the second half of
    * parametric OPQ): PCA alone concentrates all variance into the first
    * subspace — 16 codes then quantize nearly everything, and ADC recall
    * DROPS below the unrotated baseline (measured: 0.232 → 0.130 on the
    * correlated harness). Balance instead: greedily deal the
    * descending-eigenvalue components to the `m` subspaces, each taking
    * `dim/m` components, always to the open subspace with the smallest
    * log-variance product — every subspace then carries a comparable
    * share and its codebook spends its codes usefully. Returns the
    * rotation rows reordered so rows of one subspace are contiguous (the
    * [[pqSplit]] layout).
    */
  def opqAllocate(basis: Seq[Seq[Double]], lams: Seq[Double],
                  m: Int): Seq[Seq[Double]] = {
    val dim = basis.length
    require(m >= 1 && dim % m == 0,
      s"opqAllocate: dim $dim must divide into m=$m subspaces")
    val cap = dim / m
    val order = lams.indices.sortBy(i => -lams(i))
    val buckets = Array.fill(m)(List.empty[Int])
    val logProd = Array.fill(m)(0.0)
    for (i <- order) {
      val open = (0 until m).filter(b => buckets(b).size < cap)
      val b = open.minBy(logProd)
      buckets(b) = i :: buckets(b)
      logProd(b) += math.log(math.max(lams(i), 1e-12))
    }
    buckets.toSeq.flatMap(_.reverse.map(basis))
  }

  /** Collect a [[topKEigen]] basis into k rotation rows (bounded: k×d
    * doubles) for the per-row projection [[rotateExpr]].
    */
  def collectRotation(eig: DataFrame, dim: Int, k: Int): Seq[Seq[Double]] = {
    val rows = eig.select(col("comp").cast("int"), col("i").cast("int"),
      col("v_e6").cast("long")).collect()
    require(rows.length == k * dim,
      s"collectRotation: ${rows.length} entries for k=$k dim=$dim")
    val m = rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    (1 to k).map(c => (1 to dim).map(i => m((c, i)) / 1e6))
  }

  /** Parametric-OPQ projection: v → R·v over the collected top-k
    * eigenbasis — per-row arithmetic against literal rotation rows (no
    * shuffle, no UDF). With k = d this is the orthogonal OPQ rotation;
    * with k < d it is PCA dimension reduction, either way aligning
    * coordinates with the covariance eigenbasis so PQ's independent
    * per-subspace quantizers stop paying for cross-subspace correlation
    * (Ge et al. 2013, the parametric solution).
    */
  def rotateExpr(v: Column, rot: Seq[Seq[Double]]): Column =
    array(rot.map { row =>
      val rowLit = array(row.map(lit): _*)
      aggregate(zip_with(v, rowLit, (x, r) => x * r),
        lit(0d), (acc, x) => acc + x)
    }: _*)

  /** √N cell-count rule: `ceil(sqrt(n))`, clamped to [1, 2^20]. A CONSTANT
    * cell count does not survive corpus growth: SCALE.md's PQ recall grids
    * (rounds 7–8) measured ~0.15 recall@10 shed at 10× with cells pinned,
    * because mean cell population grows linearly and a fixed nprobe covers
    * a shrinking corpus fraction. With cells ∝ √N, cell count and mean
    * cell size both grow as √N (the standard IVF balance point), so an
    * equal nprobe FRACTION keeps covering a stable share of the corpus —
    * measured round 9: 10× recall within 0.03 of 1× at equal fraction.
    * The 2^20 clamp keeps the centroid table broadcastable (~2^20 × dim
    * doubles) — past that an IVF wants a hierarchical coarse quantizer.
    */
  def sqrtCells(n: Long): Int =
    math.min(1L << 20,
      math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong)).toInt

  /** Build an IVF coarse quantizer: deterministic hash-sampled seed
    * centroids, then `iters` k-means refinement passes (each pass is fully
    * distributed; only the centroid table — small by construction — flows
    * between iterations, Lloyd's-algorithm style). Returns (id, v) centroid
    * rows ready for [[ivfTopK]].
    *
    * `numCells <= 0` (the default) auto-sizes by [[sqrtCells]] — one
    * `count()` job at build time, the price of an index that keeps its
    * recall as the corpus scales. Pass an explicit count to pin it.
    */
  def buildIvf(vectors: DataFrame, numCells: Int = 0,
               iters: Int = 1): DataFrame = {
    val cells = if (numCells > 0) numCells else sqrtCells(vectors.count())
    var cent = vectors
      .orderBy(pmod(xxhash64(col("id")), lit(1000003)), col("id"))
      .limit(cells)
      .select(col("id"), col("v"))
    for (_ <- 0 until iters) {
      cent = gatherCentroids(kmeansStep(vectors, cent))
        .select(col("cid").as("id"), col("v"))
    }
    cent
  }

  /** Deterministic pseudo-random hyperplanes for sign-LSH: plane p,
    * dimension d → sin(1e4 · (p·dim + d + 1)) — fixed, seedless,
    * reproducible everywhere (the classic hash-free determinism trick).
    */
  def hyperplanes(numPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until numPlanes).map(p =>
      (0 until dim).map(d => math.sin(1e4 * (p * dim + d + 1))))

  /** Random-hyperplane (sign) LSH bucket key: bit i = sign(v · plane_i).
    * Cosine-similar vectors agree on most signs, so near-dups land in the
    * same bucket with high probability — the bucket join replaces the
    * all-pairs cosine at corpus scale (the LSH-bucketed ANN variant; IVF is
    * the cell-probing one). Sign of the raw dot (== sign of cosine, and
    * well-defined even for zero-norm vectors): one fused fold per plane, no
    * sqrt, and the DuckDB mirror is a plain `list_dot_product(…) >= 0`.
    */
  def rpLshBucket(v: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.map { p =>
      val plane = array(p.map(lit): _*)
      val dot = aggregate(zip_with(v, plane, (x, y) => x * y),
        lit(0d), (acc, x) => acc + x)
      when(dot >= 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** DuckDB rendering of [[rpLshBucket]] over a vector column named `colName`
    * — the planes are embedded as exact double literals (shortest-roundtrip
    * `Double.toString`, which both engines parse back to the same bits).
    */
  def rpLshBucketDuckSql(colName: String, planes: Seq[Seq[Double]]): String = {
    val bits = planes.map { p =>
      val plane = p.mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product($colName, CAST($plane AS DOUBLE[])) >= 0 " +
        "THEN '1' ELSE '0' END)"
    }
    bits.mkString("(", " || ", ")")
  }

  /** Bucketed near-dup pairs: bucket join on the sign signature, exact
    * cosine verify within buckets. Multi-probe/banding are the standard
    * recall levers; one table keeps the oracle story simple.
    *
    * Pass `dim` (the embedding dimensionality) when known — it is a static
    * property of any real embedding table, and the `None` fallback costs an
    * extra driver-side `head(1)` job mid-plan to probe it.
    */
  def rpLshNearDupPairs(vectors: DataFrame, numPlanes: Int,
                        threshold: Double,
                        dim: Option[Int] = None): DataFrame =
    rpLshNearDupPairsManaged(vectors, numPlanes, threshold, dim).df

  def rpLshNearDupPairsManaged(vectors: DataFrame, numPlanes: Int,
                               threshold: Double,
                               dim: Option[Int] = None): graft.core.Managed = {
    val d = dim.getOrElse {
      val firstRow = vectors.select(size(col("v"))).head(1)
      if (firstRow.isEmpty) 0 else firstRow.head.getInt(0)
    }
    if (d <= 0) {
      // empty corpus (probed) → empty pairs frame with the right schema
      val empty = vectors.sparkSession.sql(
        "SELECT CAST(NULL AS BIGINT) idA, CAST(NULL AS BIGINT) idB, " +
          "CAST(NULL AS BIGINT) score_e4").limit(0)
      return graft.core.Managed(empty, Seq.empty)
    }
    val planes = hyperplanes(numPlanes, d)
    val bucketed = graft.core.Ops.widen(vectors)
      .withColumn("__b", rpLshBucket(col("v"), planes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = bucketed.select(col("id").as("idA"), col("v").as("va"), col("__b"))
    val b = bucketed.select(col("id").as("idB"), col("v").as("vb"), col("__b"))
    val out = a.join(b, Seq("__b"))
      .filter(col("idA") < col("idB"))
      .withColumn("__raw", cosine("va", "vb"))
      .filter(col("__raw") >= threshold)
      .select(col("idA"), col("idB"), scoreE4(col("__raw")).as("score_e4"))
    graft.core.Managed(out, Seq(bucketed))
  }

  /** Embedding cosine near-dup at corpus scale — cluster-then-verify (the
    * SemDeDup shape): every vector is assigned to its `nassign` best
    * centroid cells, candidates meet ONLY within a shared cell (one equi
    * shuffle on cell id), and the exact cosine then verifies each
    * candidate, so any emitted pair is exactly-correct. `nassign > 1`
    * catches pairs straddling a cell boundary (each side multi-homes into
    * its runner-up cells); `distinct` collapses pairs meeting in several
    * shared cells. Recall < 1 by design — pairs whose assignment sets are
    * disjoint never meet (measured per nassign in `tools.Recall`);
    * [[cosineNearDupPairs]] is the bounded-input exact baseline and
    * [[rpLshNearDupPairs]] the data-independent alternative. Centroids are
    * broadcast (small by construction, like [[ivfTopK]]); cell population
    * bounds the within-cell join fan-out, so size `numCells` to the corpus
    * as with any IVF index.
    */
  def ivfNearDupPairs(vectors: DataFrame, centroids: DataFrame,
                      threshold: Double, nassign: Int = 2): DataFrame =
    ivfNearDupPairsManaged(vectors, centroids, threshold, nassign).df

  /** [[ivfNearDupPairs]] with the persisted assignment table handed back
    * for cleanup (it feeds both sides of the candidate self-join; without
    * the persist barrier Spark would recompute the assignment pass twice).
    */
  def ivfNearDupPairsManaged(vectors: DataFrame, centroids: DataFrame,
                             threshold: Double,
                             nassign: Int = 2): graft.core.Managed = {
    require(nassign >= 1, s"ivfNearDupPairs: nassign ($nassign) must be >= 1")
    val cent = broadcast(centroids.select(col("id").as("cid"), col("v").as("cv")))
    val assigned = topCells(
      graft.core.Ops.widen(vectors.select(col("id"), col("v")))
        .join(cent)
        .withColumn("cscore", cosine("v", "cv")),
      "id", "v", nassign)
      .select("id", "v", "cid")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = assigned.select(col("cid"), col("id").as("idA"), col("v").as("va"))
    val b = assigned.select(col("cid"), col("id").as("idB"), col("v").as("vb"))
    val out = a.join(b, Seq("cid"))
      .filter(col("idA") < col("idB"))
      .withColumn("__raw", cosine("va", "vb"))
      .filter(col("__raw") >= threshold)
      .select(col("idA"), col("idB"), scoreE4(col("__raw")).as("score_e4"))
      .distinct()
    graft.core.Managed(out, Seq(assigned))
  }

  /** All pairs (idA < idB) with cosine ≥ threshold — embedding near-dup
    * detection. Bounded inputs only (callers sample/salt at scale; the LSH
    * bucketing in [[Dedup]] is the unbounded-corpus path).
    */
  def cosineNearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val a = vectors.select(col("id").as("idA"), col("v").as("va"))
    val b = vectors.select(col("id").as("idB"), col("v").as("vb"))
    a.join(b, col("idA") < col("idB"))
      .withColumn("__raw", cosine("va", "vb"))
      .filter(col("__raw") >= threshold)
      .select(col("idA"), col("idB"), scoreE4(col("__raw")).as("score_e4"))
  }

  // ---- Hard-negative mining (contrastive-training data prep) -------------
  // A retriever/reranker training set needs, per anchor, the most
  // CONFUSABLE items of a different label — random negatives are too easy
  // and the model learns nothing from them (the DPR/ANCE observation).
  // Same serving skeleton as ANN top-k with two extra predicates applied
  // BEFORE the rank window (so the window sees only eligible rows):
  // label(anchor) ≠ label(candidate), and an optional score ceiling that
  // drops near-duplicates of the anchor — at corpus scale a ≥0.999-cosine
  // "negative" is almost always a mislabeled duplicate, and training on it
  // as a negative poisons the objective (the false-negative filter every
  // production mining pipeline carries).

  /** Exact hard negatives: for each query (id, v, label), the top-`k`
    * highest-cosine vectors whose `label` differs, self excluded, scores
    * within [scoreFloorE4, scoreCeilE4]. The floor drops uninformative
    * easy negatives; the ceiling is the false-negative guard above.
    * O(|queries|·|corpus|) — [[bruteForceTopK]]'s sampled-baseline
    * contract and size guard verbatim; corpus-scale anchors route through
    * [[hardNegativesIvf]]. Output: (vec_id, other_id, score_e4, rank).
    */
  def hardNegativesTopK(vectors: DataFrame, queries: DataFrame, k: Int,
                        scoreCeilE4: Long = 10000L,
                        scoreFloorE4: Long = -10000L,
                        maxQueryBytes: Long = 64L << 20,
                        maxQueryRows: Int = 100000): DataFrame = {
    val est = queries.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est > maxQueryBytes) {
      val n = queries.limit(maxQueryRows + 1).count()
      require(n <= maxQueryRows,
        s"hardNegativesTopK: queries side holds > $maxQueryRows rows " +
          s"(estimate $est bytes). This is the exact O(q*n) baseline for " +
          "SAMPLED anchor sets; use hardNegativesIvf for corpus-scale " +
          "input, or raise maxQueryRows/maxQueryBytes deliberately.")
    }
    val q = queries.select(col("id").as("vec_id"), col("v").as("va"),
      col("label").as("qlabel"))
    val c = vectors.select(col("id").as("other_id"), col("v").as("vb"),
      col("label").as("clabel"))
    q.join(c, col("vec_id") =!= col("other_id") &&
        col("qlabel") =!= col("clabel"))
      .withColumn("score_e4", scoreE4(cosine("va", "vb")))
      .filter(col("score_e4").between(scoreFloorE4, scoreCeilE4))
      .withColumn("rank", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("score_e4").desc, col("other_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select("vec_id", "other_id", "score_e4", "rank")
  }

  /** The scale path: [[ivfTopK]]'s cell-probe skeleton with the label
    * predicate and score band of [[hardNegativesTopK]] applied before the
    * rank window. Candidates meet only inside probed cells (the one
    * corpus-sized shuffle is the cell equi join; the label rides inside
    * the assignment payload struct so no second corpus join fetches it).
    * Deterministic given the centroid set — the oracle replays the
    * assignment verbatim, recall-vs-exact is measured in tools.Recall.
    */
  def hardNegativesIvf(vectors: DataFrame, centroids: DataFrame,
                       queries: DataFrame, nprobe: Int, k: Int,
                       scoreCeilE4: Long = 10000L,
                       scoreFloorE4: Long = -10000L): DataFrame = {
    val cent = broadcast(
      centroids.select(col("id").as("cid"), col("v").as("cv")))
    // corpus → best cell, label carried in the argmax payload struct
    val assigned = argmaxCell(
      graft.core.Ops.widen(vectors.select(col("id").as("other_id"),
          struct(col("v"), col("label")).as("vb")))
        .join(cent)
        .withColumn("cscore", cosine("vb.v", "cv")),
      "other_id", "vb")
      .select("other_id", "vb", "cid")
    val probed = topCells(
      queries.select(col("id").as("vec_id"),
          struct(col("v"), col("label")).as("va"))
        .join(cent)
        .withColumn("cscore", cosine("va.v", "cv")),
      "vec_id", "va", nprobe)
      .select("vec_id", "va", "cid")
    probed.join(assigned, Seq("cid"))
      .filter(col("vec_id") =!= col("other_id") &&
        col("va.label") =!= col("vb.label"))
      .withColumn("score_e4", scoreE4(cosine("va.v", "vb.v")))
      .filter(col("score_e4").between(scoreFloorE4, scoreCeilE4))
      .withColumn("rank", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("score_e4").desc, col("other_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select("vec_id", "other_id", "score_e4", "rank")
  }

  // ---- Product quantization (the compression half of IVF-PQ) -------------
  // At 100 TB an ANN index cannot keep float32 vectors hot: PQ stores each
  // vector as m small code ids (one byte-ish each, 32x+ smaller than the
  // dim-64 float payload) and answers queries by ADC — per query, a
  // (m × numCodes) lookup table of partial distances replaces every
  // per-candidate float dot product with m integer lookups + adds. This
  // composes with the IVF cell layout above (probe cells, then ADC-rank
  // within them) exactly as in the IVF-PQ literature.

  /** Per-subvector squared L2 distance (PQ's metric), as the same
    * sequential zip_with/aggregate fold [[cosine]] uses — both engines sum
    * left-to-right, so the e4 fixed-point exits match.
    */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0d), (acc, x) => acc + x)

  /** Deterministic seedless PQ codebook (the [[hyperplanes]] trick):
    * subspace s, code c, dim d → sin(1e4·((s·numCodes + c)·subDim + d + 1)).
    * Fixed literals both engines embed exactly — the probe/oracle codebook;
    * production codebooks come from [[pqTrain]].
    */
  def pqCodebook(m: Int, numCodes: Int,
                 subDim: Int): Seq[(Int, Int, Seq[Double])] =
    for { s <- 0 until m; c <- 0 until numCodes }
      yield (s, c, (0 until subDim).map(d =>
        math.sin(1e4 * (((s * numCodes + c) * subDim) + d + 1))))

  /** A codebook as a (sub, code, cv) DataFrame — the form
    * [[pqEncode]]/[[pqAdcTopK]]/[[pqTrain]] exchange.
    */
  def pqCodebookDf(spark: org.apache.spark.sql.SparkSession,
                   cb: Seq[(Int, Int, Seq[Double])]): DataFrame = {
    import spark.implicits._
    cb.toDF("sub", "code", "cv")
  }

  /** DuckDB rendering of a codebook as an inline VALUES relation
    * `(sub, code, cv)` with exact double literals (shortest-roundtrip
    * `Double.toString`, same parse-back bits in both engines).
    */
  def pqCodebookDuckSql(cb: Seq[(Int, Int, Seq[Double])]): String =
    cb.map { case (s, c, v) =>
      s"($s, $c, CAST(${v.mkString("[", ", ", "]")} AS DOUBLE[]))"
    }.mkString("(VALUES ", ", ", ")")

  /** (id, v) → (id, sub, subv): each vector split into `m` contiguous
    * subvectors of `subDim` dims. Pure per-row fan-out, no shuffle.
    * CONTRACT: vectors must have at least `m·subDim` dims — a short
    * vector yields short slices, and zip_with against a full-width
    * codebook entry null-pads them, poisoning every distance downstream
    * (null d_e4 sorts ahead of real distances under min). Embedding
    * dimensionality is a static property of any real table; callers pass
    * the right (m, subDim) the same way [[rpLshNearDupPairs]] takes
    * `dim`.
    */
  def pqSplit(vectors: DataFrame, m: Int, subDim: Int): DataFrame =
    vectors.select(col("id"),
      posexplode(array((0 until m).map(s =>
        slice(col("v"), s * subDim + 1, subDim)): _*)).as(Seq("sub", "subv")))

  /** PQ encode: each subvector → the id of its nearest (squared-L2)
    * codebook entry, code-id tiebreak. Long-form (id, sub, code) — the
    * stored index payload. Same shuffle shape as [[ivfAssign]]: broadcast
    * codebook cross on `sub`, then a PARTIAL-AGGREGATABLE `min(struct)`
    * argmin, so the one exchange carries a single row per (vector,
    * subspace), not numCodes rows. The struct's (d_e4, code) prefix is
    * unique per group (code is unique within a subspace), so the argmin is
    * total and deterministic.
    */
  def pqEncode(vectors: DataFrame, codebook: DataFrame, m: Int,
               subDim: Int): DataFrame =
    pqSplit(graft.core.Ops.widen(vectors.select(col("id"), col("v"))),
        m, subDim)
      .join(broadcast(codebook), Seq("sub"))
      .withColumn("d_e4", graft.core.Ops.fixedPoint(
        sqDist(col("subv"), col("cv")), 4))
      .groupBy("id", "sub")
      .agg(min(struct(col("d_e4"), col("code"))).as("b"))
      .select(col("id"), col("sub"), col("b.code").as("code"))

  /** Asymmetric-distance top-k over PQ codes: per query, a broadcast
    * (query, sub, code) → partial-distance lookup table (|queries|·m·
    * numCodes rows — bounded by construction); candidates join the LUT on
    * (sub, code) and sum the m integer partials per (query, candidate).
    * The sum is a map-side-combining hash aggregate, and the final
    * rank-filter plans as WindowGroupLimit (partial top-k BEFORE the
    * exchange — each map task ships at most k rows per query), so no
    * stage ever materializes the full |corpus| candidate list in one
    * place. Distances are e4 fixed-point INTEGER sums of the LUT entries:
    * exact, order-independent, oracle-stable.
    */
  def pqAdcTopK(codes: DataFrame, codebook: DataFrame, queries: DataFrame,
                m: Int, subDim: Int, k: Int): DataFrame = {
    val lut = broadcast(
      pqSplit(queries.select(col("id"), col("v")), m, subDim)
        .select(col("id").as("vec_id"), col("sub"), col("subv"))
        .join(broadcast(codebook), Seq("sub"))
        .select(col("vec_id"), col("sub"), col("code"),
          graft.core.Ops.fixedPoint(
            sqDist(col("subv"), col("cv")), 4).as("pd_e4")))
    codes.join(lut, Seq("sub", "code"))
      .filter(col("vec_id") =!= col("id"))
      .groupBy(col("vec_id"), col("id"))
      .agg(sum(col("pd_e4")).as("dist_e4"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("dist_e4").asc, col("id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("id").as("other_id"), col("dist_e4"),
        col("rank"))
  }

  /** IVF-PQ query path — the two halves composed the way a 100 TB ANN
    * serves: IVF narrows candidates to the `nprobe` probed cells (the
    * [[ivfTopK]] machinery: broadcast centroids, partial-agg assignment,
    * cell equi join), then ADC ranks WITHIN the cells from the m-byte
    * codes alone — candidate embeddings are never read at query time,
    * only the code arrays. Shuffle shape: the cell join is the one
    * corpus-sized exchange; the per-candidate code fan-out (posexplode ×
    * m) is map-local, the LUT join is a broadcast, and the distance sum
    * partial-aggregates back to one row per candidate before any further
    * exchange; the rank filter plans WindowGroupLimit. Exact-embedding
    * re-ranking of the ADC top-k (the standard refinement pass) is
    * [[bruteForceTopK]] over the returned ids.
    *
    * With `nprobe >= numCells` every cell is probed and the result is
    * exactly [[pqAdcTopK]] over the whole corpus (spec-pinned parity).
    */
  def ivfPqTopK(vectors: DataFrame, centroids: DataFrame,
                codebook: DataFrame, queries: DataFrame, nprobe: Int,
                m: Int, subDim: Int, k: Int): DataFrame = {
    val cent = broadcast(centroids.select(col("id").as("cid"), col("v").as("cv")))
    ivfPqProbeRank(ivfPqAssignCodes(vectors, cent, codebook, m, subDim),
      cent, codebook, queries, nprobe, m, subDim, k)
  }

  /** (id, vb, cid, codes): cell assignment + compact code array per
    * vector — the stored form of an IVF-PQ index (cell-partitioned codes
    * table). `vb` rides along from the assignment pass (it is already in
    * flight there — re-joining `vectors` would cost a third corpus scan);
    * consumers that only need codes project it away and column pruning
    * drops it from the scan.
    */
  private def ivfPqAssignCodes(vectors: DataFrame, cent: DataFrame,
                               codebook: DataFrame, m: Int,
                               subDim: Int): DataFrame = {
    val codesWide = pqEncode(vectors, codebook, m, subDim)
      .groupBy("id")
      .agg(expr("transform(array_sort(collect_list(struct(sub, code))), " +
        "e -> e.code)").as("codes"))
    ivfAssign(vectors, cent)
      .select(col("other_id").as("id"), col("vb"), col("cid"))
      .join(codesWide, Seq("id"))
  }

  /** The shared probe-and-ADC-rank body of [[ivfPqTopK]] and
    * [[ivfPqTopKIndexed]] — one implementation so the in-memory and
    * persisted paths cannot drift (the [[ivfProbeRank]] discipline).
    */
  private def ivfPqProbeRank(assignedCodes: DataFrame, cent: DataFrame,
                             codebook: DataFrame, queries: DataFrame,
                             nprobe: Int, m: Int, subDim: Int,
                             k: Int): DataFrame = {
    val probed = topCells(
      queries.select(col("id").as("vec_id"), col("v").as("va"))
        .join(cent)
        .withColumn("cscore", cosine("va", "cv")),
      "vec_id", "va", nprobe)
      .select("vec_id", "cid")
    val lut = broadcast(
      pqSplit(queries.select(col("id"), col("v")), m, subDim)
        .select(col("id").as("vec_id"), col("sub"), col("subv"))
        .join(broadcast(codebook), Seq("sub"))
        .select(col("vec_id"), col("sub"), col("code"),
          graft.core.Ops.fixedPoint(
            sqDist(col("subv"), col("cv")), 4).as("pd_e4")))
    probed.join(assignedCodes.select("id", "cid", "codes"), Seq("cid"))
      .filter(col("vec_id") =!= col("id"))
      .select(col("vec_id"), col("id"),
        posexplode(col("codes")).as(Seq("sub", "code")))
      .join(lut, Seq("vec_id", "sub", "code"))
      .groupBy(col("vec_id"), col("id"))
      .agg(sum(col("pd_e4")).as("dist_e4"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("dist_e4").asc, col("id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("id").as("other_id"), col("dist_e4"),
        col("rank"))
  }

  /** Persist an IVF-PQ index: `<dir>/centroids` + `<dir>/codebook` (both
    * tiny) and `<dir>/assigned` — (id, vb, codes) partitioned BY CELL.
    * The full embedding `vb` is stored ALONGSIDE the codes in the same
    * table: ADC queries select only (id, cid, codes), so parquet COLUMN
    * pruning keeps the float payload on disk (ReadSchema without vb —
    * plan-pinned), while an exact re-rank pass or a centroid retrain can
    * still read it from the same layout. Partition pruning on cid works
    * exactly as in [[writeIvfIndex]].
    */
  def writeIvfPqIndex(vectors: DataFrame, centroids: DataFrame,
                      codebook: DataFrame, dir: String, m: Int,
                      subDim: Int, residual: Boolean = false): Unit = {
    val cent = broadcast(centroids.select(col("id").as("cid"), col("v").as("cv")))
    centroids.select("id", "v").write.mode("overwrite")
      .parquet(s"$dir/centroids")
    codebook.select("sub", "code", "cv").write.mode("overwrite")
      .parquet(s"$dir/codebook")
    // format marker: which encoding the stored codes use — readers check
    // it so a raw-codes query path can never silently mis-score a
    // residual index (or vice versa). Written BEFORE the assigned table,
    // with the previous table deleted first: every crash window then
    // leaves marker-without-readable-data (a loud read failure) instead
    // of a readable table paired with the wrong marker (the silent
    // mis-scoring the marker exists to prevent).
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      vectors.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/assigned"), true)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$dir/_pq_format"), true)
    try out.write(
      (if (residual) "residual" else "raw").getBytes("UTF-8"))
    finally out.close()
    // batch_id partition level (build = "base"): append-retry
    // idempotence, the [[writeIvfIndex]] discipline
    def writeBase(df: DataFrame): Unit =
      df.withColumn("batch_id", lit("base"))
        .write.mode("overwrite").partitionBy("batch_id", "cid")
        .option("partitionOverwriteMode", "static")
        .parquet(s"$dir/assigned")
    if (!residual)
      writeBase(ivfPqAssignCodes(vectors, cent, codebook, m, subDim)
        .select(col("id"), col("vb"), col("codes"), col("cid")))
    else {
      // residual layout: codes quantize v − centroid ([[ivfPqTopKResidual]]
      // semantics) — vb still stored for refine/retrain. The assignment
      // feeds BOTH the vb projection and the residual encode, so it is
      // persisted for the write's duration (the [[appendToIvfIndex]]
      // discipline); unpersisted, Spark recomputes the corpus×centroid
      // cross once per consumer.
      val assigned = ivfAssign(vectors, cent)
        .join(cent, Seq("cid"))
        .withColumn("rv", zip_with(col("vb"), col("cv"), (x, y) => x - y))
        .select(col("other_id").as("id"), col("cid"), col("vb"), col("rv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        writeBase(assigned.select("id", "cid", "vb").join(
          pqEncode(assigned.select(col("id"), col("rv").as("v")),
              codebook, m, subDim)
            .groupBy("id")
            .agg(expr("transform(array_sort(collect_list(struct(sub, " +
              "code))), e -> e.code)").as("codes")),
          Seq("id"))
          .select(col("id"), col("vb"), col("codes"), col("cid")))
        writePqStats(assigned.select(col("id"), col("rv").as("v")),
          codebook, dir, m, subDim)
      } finally assigned.unpersist()
    }
    if (!residual)
      writePqStats(vectors.select(col("id"), col("v")), codebook, dir,
        m, subDim)
  }

  /** Per-vector PQ quantization error in the index's QUANTIZED space
    * (`v` = the raw vector for a raw index, the residual for a residual
    * index): Σ over subspaces of the chosen code's squared-L2 distance —
    * exactly the error the ADC metric silently adds to every query
    * scored against this vector. [[pqEncode]]'s broadcast-cross +
    * partial-argmin shuffle shape; e4 fixed point. Output (id, qerr_e4).
    */
  def pqQerrE4(vectors: DataFrame, codebook: DataFrame, m: Int,
               subDim: Int): DataFrame =
    pqSplit(graft.core.Ops.widen(vectors.select(col("id"), col("v"))),
        m, subDim)
      .join(broadcast(codebook), Seq("sub"))
      .withColumn("d_e4", graft.core.Ops.fixedPoint(
        sqDist(col("subv"), col("cv")), 4))
      .groupBy("id", "sub")
      .agg(min(col("d_e4")).as("d_e4"))
      .groupBy("id")
      .agg(sum(col("d_e4")).as("qerr_e4"))

  /** Build-time codebook-fit baseline: (n, mean_qerr_e4) of the indexed
    * corpus in its quantized space, at `<dir>/stats` — the denominator
    * [[graft.pipeline.Maintain.ivfPqDecision]]'s drift ratio compares
    * appended batches against. Written AFTER the assigned table (stats
    * are advisory; a crash window leaves a servable index whose decision
    * path falls back to the cosine-drift criterion).
    */
  private def writePqStats(qspace: DataFrame, codebook: DataFrame,
                           dir: String, m: Int, subDim: Int): Unit =
    pqQerrE4(qspace, codebook, m, subDim)
      .agg(count(lit(1)).as("n"),
        floor(avg(col("qerr_e4")) + lit(0.5)).cast("long")
          .as("mean_qerr_e4"))
      .write.mode("overwrite").parquet(s"$dir/stats")

  /** (m, subDim) of a stored codebook — driver-side, bounded (one
    * aggregate over the m·numCodes codebook rows).
    */
  def pqDims(cb: DataFrame): (Int, Int) = {
    val r = cb.agg(max(col("sub")).cast("int").as("ms"),
      max(size(col("cv"))).cast("int").as("sd")).head()
    (r.getInt(0) + 1, r.getInt(1))
  }

  /** Incrementally append a batch to a persisted IVF-PQ index — the
    * [[appendToIvfIndex]] daily-append path for the compressed index
    * family. The batch is assigned against the STORED centroids and
    * encoded against the STORED codebook (both frozen between retrains,
    * so `ivfPqTopKIndexed` over (index(A) then append B) is bit-identical
    * to a fresh build of A ∪ B under the same centroids/codebook —
    * spec-pinned, raw and residual), and lands in the same
    * cell-partitioned layout under its OWN `batch_id` partition with
    * dynamic overwrite — the [[appendToIvfIndex]] retry-idempotence
    * contract (a retried batchId replaces its own partitions; distinct
    * batches must use distinct ids).
    *
    * Returns the per-cell drift report the retrain decision needs:
    * `(cid, n_added, mean_cscore_e4, mean_qerr_e4)` — [[appendToIvfIndex]]'s
    * centroid-drift column plus the CODEBOOK-fit column: the appended
    * vectors' mean quantization error in the index's quantized space.
    * A distribution shift the centroids still cover can therefore still
    * fire a retrain when the codebook no longer fits (rising qerr =
    * every ADC distance against the new rows silently degrades — the
    * failure mode a pure cosine-drift signal cannot see).
    *
    * Caller contract: batch ids are new (dedup upstream).
    */
  def appendToIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                         dir: String, newVectors: DataFrame,
                         batchId: String): DataFrame = {
    require(batchId.nonEmpty && batchId != "base" &&
        batchId != "__HIVE_DEFAULT_PARTITION__",
      s"appendToIvfPqIndex: invalid batch id '$batchId'")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/codebook")),
      s"appendToIvfPqIndex: no IVF-PQ index at $dir (writeIvfPqIndex first)")
    requireBatchLayout(fs, dir, "appendToIvfPqIndex")
    val fmt = readPqFormat(spark, dir)
    val cent = broadcast(spark.read.parquet(s"$dir/centroids")
      .select(col("id").as("cid"), col("v").as("cv")))
    val cb = spark.read.parquet(s"$dir/codebook")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (m, subDim) = pqDims(cb)
      // one assignment pass over the BATCH; qv = the quantized-space
      // vector (raw v, or the residual v − centroid) — feeds the encode,
      // the layout write, and the qerr column of the drift report
      val assigned = ivfAssign(newVectors, cent)
        .join(cent, Seq("cid"))
        .withColumn("qv",
          if (fmt == "residual")
            zip_with(col("vb"), col("cv"), (x, y) => x - y)
          else col("vb"))
        .select(col("other_id").as("id"), col("cid"), col("vb"),
          col("cv"), col("qv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val codes = pqEncode(assigned.select(col("id"), col("qv").as("v")),
            cb, m, subDim)
          .groupBy("id")
          .agg(expr("transform(array_sort(collect_list(struct(sub, " +
            "code))), e -> e.code)").as("codes"))
        assigned.select("id", "cid", "vb").join(codes, Seq("id"))
          .select(col("id"), col("vb"), col("codes"), col("cid"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").partitionBy("batch_id", "cid")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(s"$dir/assigned")
        val drift = assigned
          .join(pqQerrE4(assigned.select(col("id"), col("qv").as("v")),
            cb, m, subDim), Seq("id"))
          .withColumn("cscore", cosine("vb", "cv"))
          .groupBy("cid")
          .agg(count(lit(1)).as("n_added"),
            scoreE4(avg(col("cscore"))).as("mean_cscore_e4"),
            floor(avg(col("qerr_e4")) + lit(0.5)).cast("long")
              .as("mean_qerr_e4"))
          .orderBy("cid")
          .localCheckpoint(eager = true)
        drift
      } finally assigned.unpersist()
    } finally cb.unpersist()
  }

  /** The stored codebook-fit baseline ([[writeIvfPqIndex]]'s `stats`
    * table) as (n, mean_qerr_e4); None for a pre-stats index.
    */
  def readPqStats(spark: org.apache.spark.sql.SparkSession,
                  dir: String): Option[(Long, Long)] = {
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/stats"))) None
    else {
      val r = spark.read.parquet(s"$dir/stats").head()
      Some((r.getLong(0), r.getLong(1)))
    }
  }

  private[graft] def readPqFormat(
      spark: org.apache.spark.sql.SparkSession,
                           dir: String): String = {
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$dir/_pq_format")
    if (!fs.exists(p)) "raw" // pre-marker indexes were always raw
    else {
      val in = fs.open(p)
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
      finally in.close()
    }
  }

  /** Query a persisted IVF-PQ index — [[ivfPqTopK]] semantics
    * (parity spec-pinned) with the scan touching only the probed cells'
    * partitions and only the code columns.
    */
  def ivfPqTopKIndexed(spark: org.apache.spark.sql.SparkSession,
                       dir: String, queries: DataFrame, nprobe: Int,
                       m: Int, subDim: Int, k: Int): DataFrame = {
    val fmt = readPqFormat(spark, dir)
    require(fmt == "raw",
      s"ivfPqTopKIndexed: index at $dir stores '$fmt' codes — " +
        "use ivfPqTopKResidualIndexed for residual codes")
    val cent = broadcast(spark.read.parquet(s"$dir/centroids")
      .select(col("id").as("cid"), col("v").as("cv")))
    val codebook = spark.read.parquet(s"$dir/codebook")
    val assigned = spark.read.parquet(s"$dir/assigned")
      .select(col("id"), col("cid"), col("codes"))
    ivfPqProbeRank(assigned, cent, codebook, queries, nprobe, m, subDim, k)
  }

  /** The full IVF-PQ serving path: ADC over the index produces a
    * `shortlist`-sized candidate set per query (cheap, codes only), then
    * the EXACT cosine re-ranks just those candidates from their stored
    * embeddings — the standard refinement pass that recovers exact-score
    * ordering while touching `shortlist` embeddings per query instead of
    * a cell's worth. The embedding read is a second scan of the same
    * cell-partitioned table, row-bounded by the broadcast shortlist join
    * (the ADC result is ≤ shortlist·|queries| rows by construction).
    * Output matches the [[ivfTopK]] shape: (vec_id, other_id, score_e4,
    * rank), rank by exact cosine.
    */
  def ivfPqTopKRefined(spark: org.apache.spark.sql.SparkSession,
                       dir: String, queries: DataFrame, nprobe: Int,
                       m: Int, subDim: Int, shortlist: Int,
                       k: Int): DataFrame = {
    require(shortlist >= k,
      s"ivfPqTopKRefined: shortlist ($shortlist) must be >= k ($k)")
    val adc = ivfPqTopKIndexed(spark, dir, queries, nprobe, m, subDim,
      shortlist)
    val cand = broadcast(adc.select(col("vec_id"), col("other_id")))
    val vb = spark.read.parquet(s"$dir/assigned")
      .select(col("id").as("other_id"), col("vb"))
    cand.join(vb, Seq("other_id"))
      .join(queries.select(col("id").as("vec_id"), col("v").as("va")),
        Seq("vec_id"))
      .withColumn("score_e4", scoreE4(cosine("va", "vb")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("score_e4").desc, col("other_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select("vec_id", "other_id", "score_e4", "rank")
  }

  /** Residual-encoded IVF-PQ (the FAISS IVFPQ layout): codes quantize
    * `v − centroid(cell(v))` instead of the raw vector. Residuals
    * concentrate near the origin regardless of which cell a vector lives
    * in, so one shared codebook spends its codes on the local geometry —
    * the standard accuracy refinement over raw-vector PQ. The price at
    * query time: the partial-distance LUT becomes per-(query, PROBED
    * CELL) — the query's residual differs per cell — so LUT size is
    * |queries|·nprobe·m·numCodes, still bounded by construction and
    * broadcast. When the codebook reconstructs residuals exactly, the
    * within-cell ADC distance IS the exact squared L2 distance
    * (spec-pinned on a constructed lattice).
    *
    * Same output shape as [[ivfPqTopK]]; one corpus-sized exchange (the
    * cell equi join), partial-agg distance sums, WindowGroupLimit rank.
    */
  def ivfPqTopKResidual(vectors: DataFrame, centroids: DataFrame,
                        codebook: DataFrame, queries: DataFrame,
                        nprobe: Int, m: Int, subDim: Int,
                        k: Int): DataFrame = {
    val cent = broadcast(centroids.select(col("id").as("cid"), col("v").as("cv")))
    // corpus: assign, residual-encode against the OWN cell's centroid.
    // ONE lineage — `cid` rides through the encode aggregation instead of
    // being re-joined onto the codes afterwards. The round-6 shape
    // (unpersisted `assigned` consumed by BOTH the pqEncode branch and an
    // id→cid join) made Spark recompute the corpus×centroid assignment
    // cross once per consumer: a second full corpus scan + distance pass
    // per query batch — the 5.85× q92 bench regression. Carrying the
    // (scalar) cid in the group keys costs nothing: it is functionally
    // dependent on id, so the grouping is unchanged and both aggregates
    // still partial-aggregate map-side.
    val assignedCodes = ivfAssign(vectors, cent)
      .join(cent, Seq("cid"))
      .withColumn("rv", zip_with(col("vb"), col("cv"), (x, y) => x - y))
      .select(col("other_id").as("id"), col("cid"),
        posexplode(array((0 until m).map(s =>
          slice(col("rv"), s * subDim + 1, subDim)): _*)).as(Seq("sub", "subv")))
      .join(broadcast(codebook), Seq("sub"))
      .withColumn("d_e4", graft.core.Ops.fixedPoint(
        sqDist(col("subv"), col("cv")), 4))
      .groupBy("id", "cid", "sub")
      .agg(min(struct(col("d_e4"), col("code"))).as("b"))
      .select(col("id"), col("cid"), col("sub"), col("b.code").as("code"))
      .groupBy("id", "cid")
      .agg(expr("transform(array_sort(collect_list(struct(sub, code))), " +
        "e -> e.code)").as("codes"))
    ivfPqResidualProbeRank(assignedCodes, cent, codebook, queries, nprobe,
      m, subDim, k)
  }

  /** Query a RESIDUAL-encoded persisted index
    * (`writeIvfPqIndex(..., residual = true)`) — refuses a raw-codes
    * index via the `_pq_format` marker, since raw and residual codes are
    * numerically incompatible and mis-scoring would be silent.
    */
  def ivfPqTopKResidualIndexed(spark: org.apache.spark.sql.SparkSession,
                               dir: String, queries: DataFrame,
                               nprobe: Int, m: Int, subDim: Int,
                               k: Int): DataFrame = {
    val fmt = readPqFormat(spark, dir)
    require(fmt == "residual",
      s"ivfPqTopKResidualIndexed: index at $dir stores '$fmt' codes — " +
        "use ivfPqTopKIndexed for raw codes")
    val cent = broadcast(spark.read.parquet(s"$dir/centroids")
      .select(col("id").as("cid"), col("v").as("cv")))
    val codebook = spark.read.parquet(s"$dir/codebook")
    val assigned = spark.read.parquet(s"$dir/assigned")
      .select(col("id"), col("cid"), col("codes"))
    ivfPqResidualProbeRank(assigned, cent, codebook, queries, nprobe, m,
      subDim, k)
  }

  /** The shared probe-and-ADC-rank body of the residual paths (the
    * [[ivfPqProbeRank]] discipline, residual edition).
    */
  private def ivfPqResidualProbeRank(assignedCodes: DataFrame,
                                     cent: DataFrame, codebook: DataFrame,
                                     queries: DataFrame, nprobe: Int,
                                     m: Int, subDim: Int,
                                     k: Int): DataFrame = {
    // queries: nprobe cells, then a PER-CELL residual LUT
    val probed = topCells(
      queries.select(col("id").as("vec_id"), col("v").as("va"))
        .join(cent)
        .withColumn("cscore", cosine("va", "cv")),
      "vec_id", "va", nprobe)
    val lut = broadcast(
      probed
        .join(cent, Seq("cid"))
        .withColumn("qr", zip_with(col("va"), col("cv"), (x, y) => x - y))
        .select(col("vec_id"), col("cid"),
          posexplode(array((0 until m).map(s =>
            slice(col("qr"), s * subDim + 1, subDim)): _*))
            .as(Seq("sub", "qsub")))
        .join(broadcast(codebook.select(col("sub"), col("code"),
          col("cv").as("ccv"))), Seq("sub"))
        .select(col("vec_id"), col("cid"), col("sub"), col("code"),
          graft.core.Ops.fixedPoint(
            sqDist(col("qsub"), col("ccv")), 4).as("pd_e4")))
    probed.select("vec_id", "cid")
      .join(assignedCodes, Seq("cid"))
      .filter(col("vec_id") =!= col("id"))
      .select(col("vec_id"), col("cid"), col("id"),
        posexplode(col("codes")).as(Seq("sub", "code")))
      .join(lut, Seq("vec_id", "cid", "sub", "code"))
      .groupBy(col("vec_id"), col("id"))
      .agg(sum(col("pd_e4")).as("dist_e4"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("dist_e4").asc, col("id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("id").as("other_id"), col("dist_e4"),
        col("rank"))
  }

  /** Reconstruction x̂ from PQ codes: concatenate each subspace's chosen
    * centroid — the vector the ADC metric implicitly ranks against, and
    * the Y side of the non-parametric-OPQ Procrustes step. One broadcast
    * codebook join + one doc-keyed gather. Output (id, y).
    */
  def pqDecode(codes: DataFrame, codebook: DataFrame, m: Int,
               subDim: Int): DataFrame =
    codes.join(broadcast(codebook), Seq("sub", "code"))
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("sub"), col("cv"))))
        .as("sc"))
      .select(col("id"), expr("flatten(transform(sc, e -> e.cv))").as("y"))

  /** Cross second-moment matrix M = Σᵢ x·yᵀ between two aligned vector
    * frames `(id, v)` ⋈ `(id, y)` — the Procrustes input of
    * non-parametric OPQ. Full d×d (NOT symmetric), e6-rounded products
    * summed as decimal(38,0) (order-independent, oracle-stable — the
    * [[prodSumExact]] discipline): a plain BIGINT sum would WRAP
    * silently at corpus scale (Σ over n rows of e6 products ~ n·1e6·‖x‖‖y‖
    * crosses 2⁶³ long before 38 decimal digits), corrupting the
    * rotation without any error. Decimal overflow surfaces as null and
    * a result outside BIGINT raises loudly — never a wrapped value.
    * One equi join + one d²-bounded aggregate; output m_e6 stays
    * BIGINT for the e6 fixed-point contract.
    */
  def crossMoment(xs: DataFrame, ys: DataFrame, dim: Int): DataFrame = {
    require(dim >= 1)
    xs.select(col("id"), col("v")).join(ys.select(col("id"), col("y")),
        Seq("id"))
      .select(expr(
        s"explode(flatten(transform(sequence(1, $dim), i -> " +
          s"transform(sequence(1, $dim), j -> named_struct(" +
          "'i', i, 'j', j, 'p_e6', " +
          "CAST(floor(element_at(v, i) * element_at(y, j) * 1e6 + 0.5) " +
          "AS BIGINT)))))) AS pr"))
      .select(col("pr.i").as("i"), col("pr.j").as("j"), col("pr.p_e6"))
      .groupBy("i", "j")
      .agg(sum(col("p_e6").cast("decimal(38,0)")).as("__s"))
      .select(col("i"), col("j"),
        when(col("__s").isNull ||
            abs(col("__s")) > lit(Long.MaxValue).cast("decimal(38,0)"),
          raise_error(concat(
            lit("crossMoment: sum of x*y e6-products exceeds BIGINT at " +
              "cell ("), col("i").cast("string"), lit(","),
            col("j").cast("string"),
            lit(") — input magnitudes exceed the e6 fixed-point " +
              "contract; rescale the input"))))
          .otherwise(col("__s")).cast("long").as("m_e6"))
  }

  /** Orthogonal Procrustes: the rotation maximizing tr(R·M) over
    * orthogonal matrices — R = V·Uᵀ for M = U·Σ·Vᵀ. Driver-local
    * one-sided Jacobi SVD (d×d, the [[eigenBasisLocal]] localize
    * discipline): fixed sweep count, fixed (p, q) order, and a RELATIVE
    * skip threshold so an already-orthogonal column pair is a no-op —
    * for a 2×2 input exactly ONE rotation fires, which is what lets the
    * q139 oracle replay the closed form. Zero-σ columns complete via
    * Gram–Schmidt against identity so R is always orthogonal.
    */
  def procrustesRotation(m0: Seq[Seq[Double]], sweeps: Int = 30,
                         relTol: Double = 1e-14): Seq[Seq[Double]] = {
    val d = m0.length
    require(d >= 1 && m0.forall(_.length == d),
      "procrustesRotation: square matrix required")
    val w = Array.tabulate(d, d)((i, j) => m0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 1 to sweeps; p <- 0 until d - 1; q <- (p + 1) until d) {
      var a = 0.0; var b = 0.0; var c = 0.0
      for (i <- 0 until d) {
        a += w(i)(p) * w(i)(p); b += w(i)(q) * w(i)(q)
        c += w(i)(p) * w(i)(q)
      }
      if (math.abs(c) > relTol * math.sqrt(a * b)) {
        val tau = (b - a) / (2.0 * c)
        val t = math.signum(tau) /
          (math.abs(tau) + math.sqrt(1.0 + tau * tau))
        val cs = 1.0 / math.sqrt(1.0 + t * t)
        val sn = t * cs
        for (i <- 0 until d) {
          val wp = w(i)(p); val wq = w(i)(q)
          w(i)(p) = cs * wp - sn * wq; w(i)(q) = sn * wp + cs * wq
          val vp = v(i)(p); val vq = v(i)(q)
          v(i)(p) = cs * vp - sn * vq; v(i)(q) = sn * vp + cs * vq
        }
      }
    }
    val u = Array.fill(d, d)(0.0)
    val sig = Array.tabulate(d)(j =>
      math.sqrt((0 until d).map(i => w(i)(j) * w(i)(j)).sum))
    for (j <- 0 until d) {
      if (sig(j) > 1e-12) for (i <- 0 until d) u(i)(j) = w(i)(j) / sig(j)
      else {
        val cand = Array.tabulate(d)(i => if (i == j) 1.0 else 0.0)
        for (jj <- 0 until d if jj != j) {
          val dp = (0 until d).map(i => cand(i) * u(i)(jj)).sum
          for (i <- 0 until d) cand(i) -= dp * u(i)(jj)
        }
        val nn = math.sqrt(cand.map(x => x * x).sum)
        for (i <- 0 until d)
          u(i)(j) = if (nn > 1e-12) cand(i) / nn
            else (if (i == j) 1.0 else 0.0)
      }
    }
    Seq.tabulate(d, d)((i, j) => (0 until d).map(k => v(i)(k) * u(j)(k)).sum)
  }

  /** Non-parametric OPQ (Ge et al. 2013, the alternating solution):
    * repeat { train codebooks on the ROTATED corpus; decode; update the
    * rotation to the Procrustes optimum toward the reconstructions }.
    * Unlike the parametric eigen-allocation rotation — which HURTS
    * neighbor-local corpora (measured r10: 0.232 → 0.130) because
    * decorrelating raises per-subspace intrinsic dimension — the
    * alternation only moves the rotation where the measured
    * quantization error drops, so it recovers ≥ raw-PQ there while
    * keeping the cross-subspace-factor win (Recall --opq grid).
    *
    * Scale shape per alternation: one per-row projection, one
    * [[pqTrain]] (the dominant cost, corpus × pqIters), one decode join,
    * one d²-bounded [[crossMoment]] aggregate; the d×d SVD is
    * driver-local under the [[eigenBasisLocal]] maxDim guard. Returns
    * (rotation rows for [[rotateExpr]], final codebook trained under
    * it).
    */
  def opqTrainNP(vectors: DataFrame, dim: Int, m: Int, subDim: Int,
                 numCodes: Int, pqIters: Int = 2, altIters: Int = 2,
                 initRot: Option[Seq[Seq[Double]]] = None,
                 maxDim: Int = 1024): (Seq[Seq[Double]], DataFrame) = {
    require(dim == m * subDim,
      s"opqTrainNP: dim $dim must equal m*subDim = ${m * subDim}")
    require(dim <= maxDim,
      s"opqTrainNP: dim $dim > $maxDim — the d×d SVD is the localize " +
        "bound")
    require(altIters >= 1)
    var rot: Seq[Seq[Double]] = initRot.getOrElse(
      Seq.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0))
    var cb: DataFrame = null
    for (it <- 1 to altIters) {
      // localCheckpoint: the projection select on deep lineage is the
      // documented Catalyst sizeInBytes-product landmine (r10)
      val xr = vectors.select(col("id"), rotateExpr(col("v"), rot).as("v"))
        .localCheckpoint(true)
      val cbIt = pqTrain(xr, m, subDim, numCodes, pqIters)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cbIt.count()
      if (cb != null) cb.unpersist(false)
      cb = cbIt
      if (it < altIters) {
        val y = pqDecode(pqEncode(xr, cb, m, subDim), cb, m, subDim)
        val rows = crossMoment(vectors, y, dim)
          .select(col("i").cast("int"), col("j").cast("int"),
            col("m_e6").cast("long")).collect()
        require(rows.length == dim * dim,
          s"opqTrainNP: ${rows.length} moment cells for dim=$dim")
        val mm = rows.map(r => (r.getInt(0), r.getInt(1)) ->
          r.getLong(2).toDouble / 1e6).toMap
        rot = procrustesRotation(
          Seq.tabulate(dim, dim)((i, j) => mm((i + 1, j + 1))))
      }
      xr.unpersist(false)
    }
    (rot, cb)
  }

  /** Train a PQ codebook: Lloyd's iterations per subspace, all subspaces
    * in the SAME distributed passes (`sub` rides in the key — m separate
    * kmeans runs would scan the corpus m times). Seeds are one bounded
    * global TakeOrdered of `numCodes` hash-sampled vectors (the
    * [[buildIvf]] idiom); seed c of subspace s is the c-th sample's s-th
    * subvector. Means go through the same scale-8 fixed-point integer
    * sums as [[kmeansStep]] — exact, order-independent, reproducible
    * across partitionings. Codes that lose all members in a pass drop out
    * (standard Lloyd's cell death); encode/ADC handle a sparse codebook
    * unchanged. Returns (sub, code, cv).
    */
  def pqTrain(vectors: DataFrame, m: Int, subDim: Int, numCodes: Int,
              iters: Int): DataFrame = {
    val split = pqSplit(
      graft.core.Ops.widen(vectors.select(col("id"), col("v"))), m, subDim)
    // bounded: numCodes rows ordered on one partition, like buildIvf's seed
    val seeds = vectors
      .orderBy(pmod(xxhash64(col("id")), lit(1000003)), col("id"))
      .limit(numCodes)
      .withColumn("code", (row_number().over(
        Window.orderBy(pmod(xxhash64(col("id")), lit(1000003)), col("id")))
        - 1).cast("int"))
    var cb = seeds.select(col("code"),
      posexplode(array((0 until m).map(s =>
        slice(col("v"), s * subDim + 1, subDim)): _*)).as(Seq("sub", "cv")))
      .select(col("sub"), col("code"), col("cv"))
    for (_ <- 0 until iters) {
      val assigned = split
        .join(broadcast(cb), Seq("sub"))
        .withColumn("d_e4", graft.core.Ops.fixedPoint(
          sqDist(col("subv"), col("cv")), 4))
        .groupBy("id", "sub")
        .agg(min(struct(col("d_e4"), col("code"),
          col("subv").as("payload"))).as("b"))
        .select(col("sub"), col("b.code").as("code"),
          col("b.payload").as("subv"))
      cb = assigned
        .select(col("sub"), col("code"),
          posexplode(col("subv")).as(Seq("pos", "x")))
        .select(col("sub"), col("code"), col("pos"),
          floor(col("x") * lit(1e8) + lit(0.5)).cast("long").as("xe8"))
        .groupBy("sub", "code", "pos")
        .agg(sum(col("xe8")).as("s"), count(lit(1)).as("n"))
        .select(col("sub"), col("code"), col("pos"),
          floor(col("s") * lit(1.0) / col("n") + lit(0.5)).cast("long")
            .as("m_e8"))
        .groupBy("sub", "code")
        .agg(array_sort(collect_list(struct(col("pos"), col("m_e8"))))
          .as("pm"))
        .select(col("sub"), col("code"),
          expr("transform(pm, e -> cast(e.m_e8 as double) / 1e8)").as("cv"))
    }
    cb
  }
}
