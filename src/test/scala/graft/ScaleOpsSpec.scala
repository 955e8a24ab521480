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
