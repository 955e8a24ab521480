package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for corpus curation — the PageRank-style quality
  * weighting crawl pipelines derive from their link graphs (a page's
  * weight feeds the source-mix and quality-filter stages). Same iterative
  * shape as `Dedup.connectedComponents` / `Bpe.train`: each round is one
  * edges⋈ranks equi-join plus a keyed sum — fully distributed — with
  * periodic lineage truncation; the driver only reads the node count.
  *
  * ALL arithmetic is scaled-BIGINT (ranks in 1e-9 units, integer `div`),
  * deliberately: floating-point PageRank sums in-edge contributions in
  * partition order, which differs run-to-run and engine-to-engine — a
  * hash-compare killer. Integer sums are order-independent, so the q81
  * oracle (the same iterations unrolled in SQL) matches EXACTLY. The cost
  * is ≤(outdeg) · 1e-9 truncation per node per round — mirrored
  * identically in both engines, and irrelevant for ranking use.
  *
  * Dangling nodes (no out-edges) simply leak their mass — the simplest
  * standard variant, mirrored in the oracle; total mass is then not
  * conserved, which ranking consumers don't care about.
  */
object Graph {

  /** `iters` PageRank rounds over an edge list; returns (node, rank_e9).
    * Self-loops and duplicate edges should be cleaned by the caller
    * (`edges.filter(src =!= dst).distinct()`) — the function takes the
    * edge list as given, like any adjacency input.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, dampingPct: Int = 85,
               checkpointEvery: Int = 8): DataFrame = {
    require(iters >= 0 && dampingPct >= 0 && dampingPct <= 100)
    require(checkpointEvery > 0,
      "pageRank: checkpointEvery must be >= 1 (lineage grows per round)")
    import org.apache.spark.storage.StorageLevel
    // loop invariants, pinned once: e/nodes/outDeg feed every round (and
    // nodes.count below), so without the persist each round's
    // materialization re-runs the union+distinct and degree shuffles
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // bounded driver read: one scalar
    require(n > 0, "pageRank: empty graph")
    // 1e-9 fixed point needs the seed 1e9/n to stay meaningfully above the
    // per-round `div` truncation — beyond ~1e8 nodes the integer ranks
    // collapse toward 0 instead of degrading gracefully, so refuse loudly
    require(n <= 100000000L,
      s"pageRank: $n nodes exceeds the 1e-9 fixed-point resolution " +
        "(seed 1e9/n too coarse); re-scale rank_e9 before raising this")
    val base = 1000000000L / n

    var ranks = nodes.withColumn("rank_e9", lit(base))
    for (i <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outDeg, "src")
        .select(col("dst").as("node"),
          expr("rank_e9 div deg").as("contrib"))
        .groupBy("node").agg(sum(col("contrib")).as("inflow"))
      val teleport = ((100 - dampingPct).toLong * base) / 100 // driver constant
      ranks = nodes.join(contribs, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(teleport) +
            expr(s"($dampingPct * coalesce(inflow, CAST(0 AS BIGINT))) div 100"))
            .as("rank_e9"))
      if (i % checkpointEvery == 0) ranks = ranks.localCheckpoint(eager = true)
    }
    // hand the caller a lineage-free result, then release the invariants
    // (their cached blocks would otherwise outlive the call)
    val out = ranks.localCheckpoint(eager = true)
    e.unpersist(); nodes.unpersist(); outDeg.unpersist()
    out
  }
}
