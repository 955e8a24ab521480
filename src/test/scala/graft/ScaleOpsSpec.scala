package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.core.Ops
import graft.streaming.StatefulDedup

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join but spreads the hot key") {
    val skewed = (1 to 100).map(i => (if (i <= 90) "hot" else s"k$i", i))
      .toDF("k", "v")
    val dim = Seq(("hot", "H"), ("k95", "N")).toDF("k", "tag")
    val plain = skewed.join(dim, Seq("k")).select("k", "v", "tag")
      .as[(String, Int, String)].collect().toSet
    val salted = Ops.saltedJoin(skewed, dim, Seq("k"), saltFactor = 4, saltBy = "v")
      .select("k", "v", "tag").as[(String, Int, String)].collect().toSet
    assert(salted == plain)
    assert(salted.count(_._1 == "hot") == 90)
  }

  test("saltedJoin plan shape: shuffle keys include the salt, dim side is " +
      "replicated via explode before its exchange") {
    // force the shuffle form — the salt exists for dims past the
    // broadcast threshold, so the spec pins that regime
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val skewed = (1 to 100).map(i => (if (i <= 90) "hot" else s"k$i", i))
        .toDF("k", "v")
      val dim = Seq(("hot", "H"), ("k95", "N")).toDF("k", "tag")
      val j = Ops.saltedJoin(skewed, dim, Seq("k"), saltFactor = 4,
        saltBy = "v")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      // the join's shuffles partition on (k, __salt) — the hot key lands
      // in saltFactor partitions, not one
      assert(plan.contains("hashpartitioning(k"),
        s"expected hash shuffle on the join keys, got:\n$plan")
      assert("hashpartitioning\\([^)]*__salt".r.findFirstIn(plan).isDefined,
        s"expected __salt in the shuffle partitioning, got:\n$plan")
      // the dim side replicates via explode (Generate), once per salt
      assert(plan.contains("Generate explode"),
        s"expected explode-replicated dim side, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("stateful streaming dedup emits first arrival only, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int)]
    val out = StatefulDedup.firstPerKey(mem.toDS())
    val q = out.writeStream.format("memory").queryName("sd_out")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("sd_ckpt").toString)
      .start()
    mem.addData(("a", 1), ("a", 2), ("b", 3))
    q.processAllAvailable()
    mem.addData(("a", 4), ("c", 5))   // re-delivery of a, new key c
    q.processAllAvailable()
    val got = spark.table("sd_out").as[(String, Int)].collect().toSet
    q.stop()
    assert(got == Set(("a", 1), ("b", 3), ("c", 5)))
  }

  test("writeShards lands one directory per shard, readable by shard") {
    val out = Files.createTempDirectory("graft_shards").toString + "/corpus"
    val docs = (0 until 200).map(i => (i.toLong, s"document body $i"))
      .toDF("doc_id", "text")
    graft.operators.Curation.writeShards(docs, col("text"), out)
    val back = spark.read.parquet(out)
    assert(back.count() == 200)
    val shardDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).toSet
    assert(shardDirs.size > 8 && shardDirs.size <= 16) // hash spreads well
    // a single-shard read prunes to that partition directory
    val one = spark.read.parquet(out).filter(col("shard") === 3)
    assert(one.count() == back.filter(col("shard") === 3).count())
  }

  test("dsnToJdbc translates libpq DSNs") {
    val (url, props) = graft.sources.Jdbc.dsnToJdbc(
      "hostaddr=10.0.0.5 port=5433 dbname=ops user=u password=p")
    assert(url == "jdbc:postgresql://10.0.0.5:5433/ops")
    assert(props.getProperty("user") == "u" && props.getProperty("password") == "p")
    val (url2, _) = graft.sources.Jdbc.dsnToJdbc("dbname=x")
    assert(url2 == "jdbc:postgresql://127.0.0.1:5432/x")
  }

  test("bucketed tables co-locate the join (no exchange over bucketed sides)") {
    // uses the default spark-warehouse dir (static conf; gitignored)
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("id", "lv")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("id", "rv")
    left.write.mode("overwrite").bucketBy(8, "id").sortBy("id")
      .saveAsTable("b_left")
    right.write.mode("overwrite").bucketBy(8, "id").sortBy("id")
      .saveAsTable("b_right")
    val joined = spark.table("b_left").join(spark.table("b_right"), "id")
    val plan = joined.queryExecution.executedPlan.toString
    // bucketed join plans SortMergeJoin with NO shuffle exchange on either side
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join, got:\n$plan")
    assert(joined.count() == 1000)
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")
  }
}
