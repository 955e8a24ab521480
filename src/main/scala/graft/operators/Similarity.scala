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
    * also what the DuckDB oracle mirrors).
    */
  def cosineHof(a: String, b: String): Column =
    expr(s"""aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) /
      (sqrt(aggregate(zip_with($a, $a, (x, y) -> x * y), 0D, (acc, x) -> acc + x)) *
       sqrt(aggregate(zip_with($b, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)))""")

  /** DuckDB rendering of [[cosine]]. */
  def cosineDuckSql(a: String, b: String): String =
    s"""list_dot_product($a, $b) /
       (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"""

  def toDoubleVec(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** Exact top-k neighbors for every vector in `queries` against `vectors`.
    * Both inputs: (id, v double-array). Excludes self-matches by id.
    */
  def bruteForceTopK(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("vec_id"), col("v").as("va"))
    val c = vectors.select(col("id").as("other_id"), col("v").as("vb"))
    q.join(c, col("vec_id") =!= col("other_id"))
      .withColumn("score", round(cosine("va", "vb"), 4).cast("decimal(10,4)"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("score").desc, col("other_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select("vec_id", "other_id", "score", "rank")
  }

  /** IVF-style ANN: assign corpus vectors to their best centroid cell
    * (max cosine, centroid-id tiebreak), probe the `nprobe` best cells per
    * query, rank candidates within probed cells. Centroids are broadcast.
    */
  def ivfTopK(vectors: DataFrame, centroids: DataFrame, queries: DataFrame,
              nprobe: Int, k: Int): DataFrame = {
    val cent = broadcast(centroids.select(col("id").as("cid"), col("v").as("cv")))

    // cell assignment: one narrow pass over the corpus (widened — vector
    // math over a one-row-group parquet input must not run on one core)
    val assigned = graft.core.Ops.widen(
        vectors.select(col("id").as("other_id"), col("v").as("vb")))
      .join(cent)
      .withColumn("cscore", cosine("vb", "cv"))
      .withColumn("crank", row_number().over(
        Window.partitionBy("other_id")
          .orderBy(col("cscore").desc, col("cid").asc)))
      .filter(col("crank") === 1)
      .select("other_id", "vb", "cid")

    // probe list: nprobe best cells per query
    val probed = queries.select(col("id").as("vec_id"), col("v").as("va"))
      .join(cent)
      .withColumn("pscore", cosine("va", "cv"))
      .withColumn("prank", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("pscore").desc, col("cid").asc)))
      .filter(col("prank") <= nprobe)
      .select("vec_id", "va", "cid")

    // candidate join on cell id — the only corpus-sized shuffle
    probed.join(assigned, Seq("cid"))
      .filter(col("vec_id") =!= col("other_id"))
      .withColumn("score", round(cosine("va", "vb"), 4).cast("decimal(10,4)"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("score").desc, col("other_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select("vec_id", "other_id", "score", "rank")
  }

  /** One k-means refinement step: assign every vector to its best centroid
    * (max cosine), then element-wise mean per cell. Means go through
    * DECIMAL(28,12) sums — exact and order-independent, so results are
    * reproducible across partitionings AND match the DuckDB oracle
    * bit-for-bit (a double fp sum would vary with partition order). The
    * typed convenience path is [[graft.functions.VectorAvg]].
    *
    * Shuffle shape: posexplode fans each vector into `dim` rows shuffled on
    * (cell, pos) with partial aggregation — at 100 TB this is the standard
    * tall-skinny centroid update, no driver involvement.
    */
  def kmeansStep(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val cent = broadcast(centroids.select(col("id").as("cid"), col("v").as("cv")))
    val assigned = graft.core.Ops.widen(vectors.select(col("id"), col("v")))
      .join(cent)
      .withColumn("cscore", cosine("v", "cv"))
      .withColumn("crank", row_number().over(
        Window.partitionBy("id").orderBy(col("cscore").desc, col("cid").asc)))
      .filter(col("crank") === 1)
      .select("id", "v", "cid")
    assigned
      .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cid", "pos")
      .agg(sum(col("x").cast("decimal(28,12)")).as("s"), count(lit(1)).as("n"))
      .select(col("cid"), col("pos").cast("int").as("pos"),
        round(col("s") / col("n"), 8).cast("decimal(20,8)").as("m"))
  }

  /** [[kmeansStep]] result gathered back to one centroid array per cell
    * (the form the next assignment pass consumes).
    */
  def gatherCentroids(longForm: DataFrame): DataFrame =
    longForm
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cid"),
        expr("transform(pm, e -> cast(e.m as double))").as("v"))

  /** Build an IVF coarse quantizer: deterministic hash-sampled seed
    * centroids, then `iters` k-means refinement passes (each pass is fully
    * distributed; only the centroid table — small by construction — flows
    * between iterations, Lloyd's-algorithm style). Returns (id, v) centroid
    * rows ready for [[ivfTopK]].
    */
  def buildIvf(vectors: DataFrame, numCells: Int, iters: Int): DataFrame = {
    var cent = vectors
      .orderBy(pmod(xxhash64(col("id")), lit(1000003)), col("id"))
      .limit(numCells)
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
    * the cell-probing one).
    */
  def rpLshBucket(v: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.map { p =>
      val plane = array(p.map(lit): _*)
      val dot = graft.functions.CosineSim(v, plane) // sign(cos) == sign(dot)
      when(dot >= 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** Bucketed near-dup pairs: bucket join on the sign signature, exact
    * cosine verify within buckets. Multi-probe/banding are the standard
    * recall levers; one table keeps the oracle story simple.
    */
  def rpLshNearDupPairs(vectors: DataFrame, numPlanes: Int,
                        threshold: Double): DataFrame = {
    val firstRow = vectors.select(size(col("v"))).head(1)
    if (firstRow.isEmpty) {
      // empty corpus → empty pairs frame with the right schema
      return vectors.sparkSession.sql(
        "SELECT CAST(NULL AS BIGINT) idA, CAST(NULL AS BIGINT) idB, " +
          "CAST(NULL AS DECIMAL(10,4)) score").limit(0)
    }
    val dim = firstRow.head.getInt(0)
    val planes = hyperplanes(numPlanes, dim)
    val bucketed = graft.core.Ops.widen(vectors)
      .withColumn("__b", rpLshBucket(col("v"), planes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = bucketed.select(col("id").as("idA"), col("v").as("va"), col("__b"))
    val b = bucketed.select(col("id").as("idB"), col("v").as("vb"), col("__b"))
    a.join(b, Seq("__b"))
      .filter(col("idA") < col("idB"))
      .withColumn("score", round(cosine("va", "vb"), 4).cast("decimal(10,4)"))
      .filter(col("score") >= threshold)
      .select("idA", "idB", "score")
  }

  /** All pairs (idA < idB) with cosine ≥ threshold — embedding near-dup
    * detection. Bounded inputs only (callers sample/salt at scale; the LSH
    * bucketing in [[Dedup]] is the unbounded-corpus path).
    */
  def cosineNearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val a = vectors.select(col("id").as("idA"), col("v").as("va"))
    val b = vectors.select(col("id").as("idB"), col("v").as("vb"))
    a.join(b, col("idA") < col("idB"))
      .withColumn("score", round(cosine("va", "vb"), 4).cast("decimal(10,4)"))
      .filter(col("score") >= threshold)
      .select("idA", "idB", "score")
  }
}
