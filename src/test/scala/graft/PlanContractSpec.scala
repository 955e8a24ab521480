package graft

import graft.probes.{ExtProbes, Probes}

/** Plan contracts: the scale-critical physical-plan properties asserted as
  * tests, so a future edit that silently degrades a plan (lost broadcast,
  * accidental cartesian product, lost window-group-limit) fails CI instead
  * of surfacing as a 100× slowdown at scale.
  */
class PlanContractSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q25 star join: all dimensions broadcast, no cartesian product") {
    val p = plan(Probes.q25(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
    // lineitem scan is column-pruned to the 3 needed columns
    assert(p.contains(
      "ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"),
      p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
  }

  test("q01 top-1 per group plans WindowGroupLimit (partial + final)") {
    val p = plan(Probes.q01(spark, sf))
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("q26 agg plans partial aggregation below the exchange") {
    val p = plan(Probes.q26(spark, sf))
    assert(p.contains("partial_sum"), p.take(2000))
  }

  test("q31 IVF: centroids broadcast; no cartesian product anywhere") {
    val p = plan(ExtProbes.q31(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("IVF assignment argmax is a partial aggregation, not a window " +
      "over the corpus×cells fan-out") {
    // the window form shuffles |cells| rows per vector on id before
    // reducing; the max(struct)/collect-slice form combines map-side, so
    // the exchange carries one row per vector — pin BOTH the absence of
    // Window and the presence of a partial aggregate in every assignment
    // path (ivfAssign via q31, kmeansStep via q40, topCells via q70)
    // expected Window count: q31 keeps exactly ONE (the final candidate
    // top-k rank, which is genuinely per-query top-k over a cell-bounded
    // set); q40/q70 have none left
    for ((probe, windows) <- Seq((ExtProbes.q31, 1), (ExtProbes.q40, 0),
        (ExtProbes.q70, 0))) {
      val p = plan(probe(spark, sf))
      val seen = p.linesIterator.count(_.contains("Window ["))
      assert(seen == windows,
        s"expected $windows Window node(s), saw $seen:\n" + p.take(3000))
      assert(p.contains("partial_max") || p.contains("partial_collect_list") ||
        p.contains("partial_first"),
        "assignment argmax must partial-aggregate:\n" + p.take(3000))
    }
  }

  test("PQ: encode argmin partial-aggregates; ADC rank plans " +
      "WindowGroupLimit; codebook and LUT broadcast; no cartesian") {
    // q86 (encode): the only reduction is the min(struct) argmin — no
    // Window at all, and it must combine map-side so the exchange carries
    // one row per (vector, subspace), not numCodes rows
    val pe = plan(ExtProbes.q86(spark, sf))
    assert(!pe.contains("Window ["), pe.take(3000))
    assert(pe.contains("partial_min"), pe.take(3000))
    assert(!pe.contains("CartesianProduct"), pe.take(2000))
    // q87 (ADC): LUT joins candidates via broadcast; the top-k filter
    // plans WindowGroupLimit (partial per-map-task top-k BEFORE the
    // exchange — no stage holds a full per-query candidate list)
    val pa = plan(ExtProbes.q87(spark, sf))
    assert(pa.contains("WindowGroupLimit"), pa.take(3000))
    assert(pa.contains("BroadcastHashJoin"), pa.take(3000))
    assert(!pa.contains("CartesianProduct"), pa.take(2000))
  }

  test("q88 line dedup: both reductions hash-partition on the doc id — " +
      "no single-partition exchange, no window") {
    val p = plan(ExtProbes.q88(spark, sf))
    assert(!p.contains("Exchange SinglePartition"), p.take(3000))
    assert(!p.contains("Window ["), p.take(3000))
    assert(p.contains("partial_min") || p.contains("partial_count"),
      p.take(3000))
  }

  test("q27 LSH: candidate generation is an equi-join, never a cross join") {
    val p = plan(ExtProbes.q27(spark, sf))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q61 as-of join: no join operator at all — one keyed window instead") {
    val p = plan(ExtProbes.q61(spark, sf))
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("Window"), p.take(2000))
  }

  test("q62 range join: bucketed equi-join, no nested-loop, no cartesian") {
    val p = plan(ExtProbes.q62(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q07 merge: local keys broadcast keeps the remote side shuffle-free") {
    val p = plan(Probes.q07(spark, sf))
    assert(!p.contains("CartesianProduct"))
  }

  /** A Window whose partition spec is empty collapses the input into ONE
    * partition (Spark warns `No Partition Defined`) — the round-1
    * scale-killer in q12/q20. Pin its absence: every Window node in these
    * plans must carry a partition expression.
    */
  private def noGlobalWindow(p: String): Unit = {
    val offenders = p.linesIterator.filter(l =>
      l.contains("Window ") && l.contains("ORDER BY") &&
        !l.contains("PARTITION BY")).toList
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("q12 global rank: range-partitioned, no single-partition window") {
    val df = Probes.q12(spark, sf)
    val p = plan(df)
    noGlobalWindow(p)
    assert(p.contains("rangepartitioning") || p.contains("RangePartitioning"),
      p.take(2000)) // the parallel substitute for the global sort-rank
  }

  test("q20 scalar max: one aggregate broadcast back, no global window") {
    val p = plan(Probes.q20(spark, sf))
    noGlobalWindow(p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(2000))
  }

  test("q68 distributed percentiles: no per-group value buffer, " +
       "range-partitioned, no single-partition window") {
    val df = Probes.q68(spark, sf)
    val p = plan(df)
    noGlobalWindow(p)
    // the whole point: Spark's buffering `percentile` aggregate must be
    // absent — values reach the result via rank selection, not a buffer
    assert(!p.contains("percentile("), p.take(2000))
    assert(p.contains("rangepartitioning") || p.contains("RangePartitioning"),
      p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q29 capped grams: doc-frequency aggregate precedes the pair join") {
    val p = plan(ExtProbes.q29(spark, sf))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the cap is an aggregate (count per gram) feeding a semi/inner join —
    // its HashAggregate must be present (dropping it silently would revive
    // the hot-gram quadratic)
    assert(p.contains("HashAggregate"), p.take(2000))
  }

  test("q52 RP-LSH: bucket join is an equi-join on the signature") {
    val p = plan(ExtProbes.q52(spark, sf))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q56 UR sort: range-partitioned rank, no single-partition window") {
    val p = plan(ExtProbes.q56(spark, sf))
    noGlobalWindow(p)
    assert(p.contains("rangepartitioning") || p.contains("RangePartitioning"),
      p.take(2000))
  }

  test("q57 decontamination: benchmark grams broadcast — corpus side never shuffles into the probe join") {
    val p = plan(ExtProbes.q57(spark, sf))
    // the gram probe join specifically must be broadcast (one BHJ anywhere
    // would let the scale-critical join regress to SMJ while the tiny flag
    // join keeps the assertion green) — at probe scale both joins resolve
    // broadcast, so pin: no sort-merge join anywhere in the plan
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q59 boilerplate: AQE broadcasts the small hot-line set (no hint)") {
    // The hot-line side is corpus-bounded, so the operator carries NO
    // broadcast hint (a mandatory hint = driver collect of an unbounded set
    // on a template-heavy crawl). The contract is on the FINAL adaptive
    // plan: execute first, then assert AQE chose a broadcast for the small
    // case — and that nothing degenerated to a cartesian product.
    // collect() executes THIS df's own QueryExecution — a write would plan
    // a fresh one and leave this plan an isFinalPlan=false AQE sketch
    val df = ExtProbes.q59(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("userRightsPlan: max-rank scalar joins back via broadcast only") {
    import spark.implicits._
    val files = Seq("User Rights v1.0.zip", "User Rights v2.0.zip").toDF("file")
    val p = plan(graft.pipeline.Upgrade.userRightsPlan(files))
    noGlobalWindow(p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(2000))
  }

  test("q71 native as-of: custom exec, no window machinery, no built-in join") {
    val p = plan(ExtProbes.q71(spark, sf))
    assert(p.contains("AsOfJoin"), p.take(2000))
    assert(!p.contains("Window ["), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p.take(2000))
  }

  test("q75 zorder write shape: range partitioning on z, no single partition") {
    import org.apache.spark.sql.functions.col
    val zed = graft.operators.Layout.zorderByRange(
      graft.Tables.orders(spark, sf)
        .select((col("o_custkey") % 1024).as("x"), (col("o_orderkey") % 1024).as("y")),
      Seq("x", "y"), bits = 10, numFiles = 8, keepZ = true)
    zed.write.format("noop").mode("overwrite").save()
    val p = plan(zed)
    assert(p.contains("rangepartitioning(__z"), p.take(2000))
    assert(!p.contains("Exchange SinglePartition"), p.take(2000))
  }

  test("q78 chunking is exchange-free above the scan (pure per-row explode)") {
    val p = plan(graft.operators.Curation.chunkByTokens(
      graft.Tables.documents(spark, sf), "doc_id", "text", 64, 16))
    // widen() may repartition the narrow local scan; what must NOT appear
    // is any key/range/single-partition exchange from the operator itself
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
    assert(!p.contains("Exchange rangepartitioning"), p.take(2000))
    assert(!p.contains("Exchange SinglePartition"), p.take(2000))
  }

  test("q81 pagerank round: equi joins only, no cartesian, no global window") {
    val p = plan(ExtProbes.q81(spark, sf))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    noGlobalWindow(p)
  }

  test("widen is plan-only: zero Spark jobs, and post-shuffle frames pass " +
      "through untouched") {
    val sc = spark.sparkContext
    @volatile var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    // build the inputs BEFORE counting: spark.read.parquet runs a footer
    // schema-inference job that is not widen's doing
    val scan = graft.Tables.documents(spark, sf)
    val agg = graft.Tables.documents(spark, sf).groupBy("source").count()
    val joined = scan.join(agg, "source")
    sc.addSparkListener(l)
    try {
      // scan-level frame: widen may plan a repartition, must not run a job
      graft.core.Ops.widen(scan).queryExecution.executedPlan
      // post-shuffle frames: the old df.rdd probe EXECUTED the aggregate
      // here under AQE; the guard must return the frame untouched instead
      assert(graft.core.Ops.widen(agg) eq agg)
      assert(graft.core.Ops.widen(joined) eq joined)
      Thread.sleep(500) // listener bus is async; give job events time to land
      assert(jobs == 0, s"widen ran $jobs Spark job(s); it must be plan-only")
    } finally sc.removeSparkListener(l)
  }

  test("bucketed tables join with NO exchange on either side") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "source")
    val stats = docs.select(col("doc_id"), length(col("source")).as("slen"))
    graft.operators.Layout.writeBucketed(docs, "pc_docs_b", Seq("doc_id"), 4)
    graft.operators.Layout.writeBucketed(stats, "pc_stats_b", Seq("doc_id"), 4)
    try {
      // force a sort-merge join so the exchange question is real (tiny
      // test tables would otherwise broadcast, which never shuffles)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val j = spark.table("pc_docs_b").join(spark.table("pc_stats_b"), "doc_id")
      j.write.format("noop").mode("overwrite").save()
      val p = plan(j)
      assert(p.contains("SortMergeJoin"), p.take(2000))
      assert(!p.contains("Exchange hashpartitioning"),
        "bucketed join must be co-located:\n" + p.take(2000))
      // the write-time layout replaced the runtime shuffle
      assert(p.contains("SelectedBucketsCount"), p.take(2000))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS pc_docs_b")
      spark.sql("DROP TABLE IF EXISTS pc_stats_b")
    }
  }

  test("persisted IVF index: probe prunes assigned partitions to the " +
      "probed cells (dynamic partition pruning on the scan)") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_ix").toString
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    val cents = Similarity.buildIvf(vecs, numCells = 8, iters = 1)
    Similarity.writeIvfIndex(vecs, cents, dir)
    val queries = vecs.filter(col("id") < 3)
    val got = Similarity.ivfTopKIndexed(spark, dir, queries, nprobe = 2, k = 3)
    got.write.format("noop").mode("overwrite").save()
    val p = plan(got)
    assert(p.contains("dynamicpruningexpression"),
      "probe join must dynamically prune cid partitions:\n" +
        p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
  }

  test("corpus-wide: no cartesian product in ANY probe plan; BNLJ sites " +
      "stay on the documented tiny-broadcast allowlist") {
    // static planning only (no execution): the corpus-level net under the
    // per-query contracts above — a future edit that degrades a join to
    // a cartesian, or adds a nested-loop join outside the known 1-row /
    // centroid-set / guarded-baseline sites, fails here by name
    val bnljAllowed = Set(
      "q12_version_sort", "q20_decile_bucketing", "q23_cosine_topk",
      "q30_cosine_neardup", "q31_ivf_ann", "q40_kmeans_step",
      "q56_user_rights_sort", "q70_ivf_neardup",
      // q89/q92's IVF half reuses the same bounded centroid-set crosses
      // as q31 (assignment + probe); the ADC half is equi/broadcast only
      "q89_ivfpq_topk", "q92_ivfpq_residual",
      // q93's dense zero-fill crosses each doc with the dim-row position
      // list — a `dim`-rows broadcast, bounded independent of corpus
      "q93_hash_embed",
      // q112 rides ivfAssign's bounded centroid-set cross (same site as
      // q31/q70); the per-cell top-k after it is window-only
      "q112_cluster_sample",
      // q107's cross is the 1-row exact-count frame × the 1-row HLL
      // estimate frame — both already reduced before the join
      "q107_hll_distinct",
      // q121's Hamming pass is the guarded q23 baseline shape (bounded
      // query set broadcast against the corpus; size guard in
      // hammingTopK) over the 16×-smaller packed-word column
      "q121_hamming_topk",
      // q128's dense side is the same guarded bruteForceTopK baseline
      // (6-query broadcast); the BM25 side and the fusion are equi-only
      "q128_rrf_hybrid",
      // q141 rides q31's bounded centroid-set crosses (the label-aware
      // twin of assignment + probe — label rides in the payload struct);
      // the candidate meet is the cell equi join, the label predicate
      // and score band are per-row filters
      "q141_hard_negatives",
      // q138's FINAL plan is pieceCosts(kept): the vocabulary-bounded
      // kept table (≤ vocabSize rows) × the 1-row broadcast total frame
      // — the q107 1-row-scalar cross shape (training's corpus work ran
      // eagerly inside the probe; only this bounded tail is the plan)
      "q138_unigram_em",
      // q163's offsets come from globalExclusivePrefixSum's triangular
      // self-join of the per-RANGE-PARTITION count frame (≤ #partitions
      // rows on both sides, broadcast) — the documented globalRank
      // shape; the corpus-sized stream only ever hash-joins on __pid
      // and seq_id
      "q163_token_packing",
      // q168 reverses q163's packing: the same globalExclusivePrefixSum
      // (per-seq EOS counts) + globalRank (doc order) triangular offset
      // joins — both ≤ #partitions rows per side, broadcast
      "q168_special_roundtrip",
      // q171 is q163's packing with span attribution — same prefix-sum
      // triangular offset join
      "q171_packed_spans",
      // q172's epoch permutation ranks via globalRank: the per-range-
      // partition offset frame (≤ #partitions rows both sides,
      // broadcast) joins triangularly — the q163/q168 shape; the
      // corpus-sized stream only hash-joins on __pid
      "q172_epoch_shuffle")
    val singlePartAllowed = Set(
      "q20_decile_bucketing", // 1-row scalar max
      // global reductions over pre-bounded inputs: the ≤64-row HLL
      // register frame and the partial-agged exact distinct count
      "q107_hll_distinct",
      // pieceCosts' Σwfreq scalar over the ≤ vocabSize kept table —
      // the q20 1-row-scalar class (the probe's corpus work ran eagerly
      // inside; the final plan is the bounded cost table only)
      "q138_unigram_em")
    val plans = graft.SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) => name -> fn(spark, sf).queryExecution.executedPlan.toString
    }
    val cartesian = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n }
    assert(cartesian.isEmpty, s"cartesian products in: $cartesian")
    val bnlj = plans.collect {
      case (n, p) if p.contains("BroadcastNestedLoopJoin") => n }.toSet
    assert((bnlj -- bnljAllowed).isEmpty,
      s"NEW nested-loop-join sites (document or fix): ${bnlj -- bnljAllowed}")
    val singlePart = plans.collect {
      case (n, p) if p.contains("Exchange SinglePartition") => n }.toSet
    assert((singlePart -- singlePartAllowed).isEmpty,
      s"NEW single-partition exchanges: ${singlePart -- singlePartAllowed}")
  }
}
