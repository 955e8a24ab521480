package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the slow-query list (VERDICT round 2 items
  * 1 & 3). Times named sub-stages of a probe with cache cleared between
  * repetitions, printing one line per (stage, run). Not part of the bench
  * contract — `graft.Bench` stays the official number.
  *
  * Usage: sbt "runMain graft.tools.Profile <sfDir> <probe> [nRuns]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val which = if (args.length > 1) args(1) else "q27"
    val nRuns = if (args.length > 2) args(2).toInt else 3
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    graft.Sessions.warmup(spark, sfDir)

    // Allocation-rate / GC-time columns (VERDICT r8 item 2): local mode
    // runs every task thread in this JVM, so thread-allocated-bytes summed
    // over live threads plus collector time delta attribute a run's memory
    // pressure directly. (Allocation by threads that die mid-run is lost;
    // Spark's local task threads are pooled, so in practice nothing is.)
    import scala.jdk.CollectionConverters._
    val gcBeans = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala
    val thBean = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    def gcMs: Long = gcBeans.map(_.getCollectionTime).sum
    def allocBytes: Long =
      thBean.getThreadAllocatedBytes(thBean.getAllThreadIds)
        .filter(_ > 0).sum

    def time(label: String)(mk: => DataFrame): Unit = {
      (1 to nRuns).foreach { i =>
        val (gc0, al0) = (gcMs, allocBytes)
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val gcD = gcMs - gc0
        val alD = (allocBytes - al0) / 1e9
        println(f"PROFILE $which%-6s $label%-28s run$i $dt%8.3f s  gc=+$gcD%5d ms  alloc=+$alD%7.2f GB")
        spark.catalog.clearCache()
      }
    }

    which match {
      case "asof" =>
        // composition vs native in ONE JVM, interleaved, so codegen/JIT
        // warmup is shared and the comparison is honest
        (1 to 2).foreach { _ =>
          time("q61_composition")(graft.SparkEntry.queries("q61_asof_join")(spark, sfDir))
          time("q71_native")(graft.SparkEntry.queries("q71_asof_native")(spark, sfDir))
        }
      case "q27" => profQ27(spark, sfDir, time)
      case "q47x" =>
        // current probe (per-group percentile buffer) vs an
        // Ops.exactPercentiles envelope (range shuffle + rank selection),
        // interleaved in one JVM for honest JIT sharing
        (1 to 2).foreach { _ =>
          time("q47_buffered")(graft.SparkEntry.queries("q47_approx_aggs")(spark, sfDir))
          time("q47_exactPctl") {
            val ev = graft.Tables.events(spark, sfDir)
            val agg = ev.groupBy("event_type").agg(
              approx_count_distinct(col("user_id")).as("approx_users"),
              expr("approx_percentile(value, array(0.5, 0.95), 1000)").as("p"),
              countDistinct(col("user_id")).as("exact_users"))
            val env = graft.core.Ops.exactPercentiles(ev, Seq("event_type"),
                "value", Seq(0.48, 0.52, 0.93, 0.97))
              .groupBy("event_type").agg(
                min(when(col("p") === 0.48, col("value"))).as("e48"),
                min(when(col("p") === 0.52, col("value"))).as("e52"),
                min(when(col("p") === 0.93, col("value"))).as("e93"),
                min(when(col("p") === 0.97, col("value"))).as("e97"))
            agg.join(env, "event_type")
              .select(col("event_type"), col("exact_users"),
                (abs(col("approx_users") - col("exact_users")) <=
                  col("exact_users") * lit(0.15)).as("hll_ok"),
                element_at(col("p"), 1).between(col("e48"), col("e52")).as("p50_ok"),
                element_at(col("p"), 2).between(col("e93"), col("e97")).as("p95_ok"))
              .orderBy("event_type")
          }
        }
      case "lm" =>
        // LM-family decomposition (round-8: q91/q95/q96/q97 bench collapse):
        // explode cost alone, model agg, then the full probes — one JVM so
        // codegen warmup is shared
        import graft.operators.{TextStats, Dedup}
        import graft.operators.Curation
        def docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
        time("explode_only")(graft.core.Ops.widen(docs)
          .select(col("doc_id"), explode(Curation.wordNgrams(
            Dedup.normalizeWords(col("text")), 2)).as("gram")))
        time("explode_agg")(graft.core.Ops.widen(docs)
          .select(col("doc_id"), explode(Curation.wordNgrams(
            Dedup.normalizeWords(col("text")), 2)).as("gram"))
          .groupBy("gram").agg(count(lit(1)).as("c")))
        time("q91_full")(graft.SparkEntry.queries("q91_bigram_lm")(spark, sfDir))
        time("q96_full")(graft.SparkEntry.queries("q96_tfidf_terms")(spark, sfDir))
        time("q97_full")(graft.SparkEntry.queries("q97_dsir_resample")(spark, sfDir))
      case "lmclear" =>
        // same q97 timing but with Bench.runOnce's clearCache between runs —
        // isolates whether the bench-vs-profile gap is cache-state related
        (1 to 4).foreach { i =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries("q97_dsir_resample")(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          println(f"PROFILE q97clear run$i ${(System.nanoTime() - t0) / 1e9}%8.3f s")
          spark.catalog.clearCache()
        }
      case "bm25sweep" =>
        // decompose the bm25_top5 scale row's time at x1 (round-8: the
        // window-df rewrite tripled the sweep row while the probe shape
        // was unaffected — find the stage)
        import graft.operators.{TextStats, Dedup}
        val d = graft.tools.Scale.scaledDocs(spark, sfDir, 1)
          .select("doc_id", "text")
        val queries = d.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("qid"),
            explode(slice(Dedup.normalizeWords(col("text")), 1, 3))
              .as("term"))
        time("queries_distinct")(queries.distinct())
        time("tf_agg")(d
          .select(col("doc_id"),
            size(Dedup.normalizeWords(col("text"))).as("dl"),
            explode(Dedup.normalizeWords(col("text"))).as("term"))
          .groupBy(col("doc_id"), col("dl"), col("term"))
          .agg(count(lit(1)).as("tf")))
        time("bm25_full")(TextStats.bm25TopK(d, "doc_id", "text",
            queries, "qid", "term", k = 5)
          .groupBy(col("qid") % 32)
          .agg(count(lit(1)).as("rows"), sum("score_e6").as("s")))
      case "imgpairs" =>
        // evidence row for the image_neardup scale sweep: is the 10x
        // super-linearity the JOIN or the OUTPUT? Prints true pair count
        // and distinct-ahash count at 1x and Nx
        for (n <- Seq(1, nRuns)) {
          val d = graft.tools.Scale.scaledDocs(spark, sfDir, n)
            .select("doc_id", "text")
          val media = graft.probes.ExtProbes.q103Media(d)
          val hashes = graft.operators.Multimodal.imageAHash(media).toDF()
          val hstats = hashes.agg(count(lit(1)), countDistinct(col("ahash")))
            .head()
          val pairs = graft.operators.Multimodal
            .imageNearDupPairs(media, 3).count()
          println(s"PROFILE imgpairs x$n images=${hstats.getLong(0)} " +
            s"distinct_ahash=${hstats.getLong(1)} pairs=$pairs")
          spark.catalog.clearCache()
        }
      case "q25" => time("full")(graft.SparkEntry.queries("q25_star_join_revenue")(spark, sfDir))
      case "q26" => time("full")(graft.SparkEntry.queries("q26_agg_breadth")(spark, sfDir))
      case "q32" => time("full")(graft.SparkEntry.queries("q32_lang_id")(spark, sfDir))
      case other => time("full")(graft.SparkEntry.queries(other)(spark, sfDir))
    }
    spark.stop()
  }

  private def profQ27(spark: SparkSession, d: String,
                      time: String => (=> DataFrame) => Unit): Unit = {
    import graft.operators.Dedup
    import graft.Tables
    def planted: DataFrame = {
      val base = Tables.documents(spark, d).select("doc_id", "text")
      val p = base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" zz yy xx")).as("text"))
      base.unionByName(p)
    }
    // stage 1: shingle sets alone (no persist)
    time("shingles")(Dedup.shingleSets(planted, "doc_id", "text"))
    // NO size(sh)>0 filter on the unpersisted pipeline: a filter over the
    // computed array collapses the projection chain into a mega-expression
    // re-evaluated per element (the shingleSets NOTE; measured here too —
    // the filtered form times 10-12 s where the real persisted-then-
    // filtered operator stage is <1 s). Planted sf docs all have >=3
    // words, so the unfiltered timing measures the same row count.
    def sh = Dedup.shingleSets(planted, "doc_id", "text")
    // stage 1b: base-hash array only (one md5 pass over shingles)
    time("hv")(sh.select(col("doc_id"),
      Dedup.shingleHashes(col("sh")).as("hv")))
    // stage 1c: one signature from the hv projection
    time("sig1")(sh
      .select(col("doc_id"), Dedup.shingleHashes(col("sh")).as("hv"))
      .select(col("doc_id"), Dedup.minhashSig(col("hv"), 0).as("s0")))
    // stage 1d: all 12 signatures, no explode
    time("sig12")(sh
      .select(col("doc_id"), Dedup.shingleHashes(col("sh")).as("hv"))
      .select(col("doc_id") +: (0 until 12).map(h =>
        Dedup.minhashSig(col("hv"), h).as(s"s$h")): _*))
    // stage 2: bands from unpersisted shingles (signature cost ×1)
    time("bands")(Dedup.lshBands(sh, "doc_id"))
    // stage 3: candidates only (persisted shingles+bands, like the operator)
    time("cand") {
      import org.apache.spark.storage.StorageLevel
      val sh = Dedup.shingleSets(planted, "doc_id", "text")
        .persist(StorageLevel.MEMORY_AND_DISK).filter(size(col("sh")) > 0)
      val b = Dedup.lshBands(sh, "doc_id").persist(StorageLevel.MEMORY_AND_DISK)
      val a = b.select(col("doc_id").as("idA"), col("band"), col("bh"))
      val c = b.select(col("doc_id").as("idB"), col("band"), col("bh"))
      a.join(c, Seq("band", "bh")).filter(col("idA") < col("idB"))
        .select("idA", "idB").distinct()
    }
    // stage 4: the full operator as shipped
    time("full")(Dedup.minhashNearDupPairs(planted, "doc_id", "text")
      .orderBy("idA", "idB"))
  }
}
