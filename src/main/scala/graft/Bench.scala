package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.warmup(spark, sfDir)
    // Timed action: a noop-format write evaluates EVERY output column.
    // (.count() lets Catalyst prune unreferenced projections, so map-only
    // queries were timed as little more than a parquet scan.)
    // A failed run is NOT a fast run: failures surface as value -1 and a
    // "failed" list in the JSON, never as a near-zero-time success.
    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Option[Double] = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case scala.util.control.NonFatal(_) => false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // operator-persisted tables don't leak across timings
      if (ok) Some(dt) else None
    }
    val nRuns = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_RUNS").flatMap(_.toIntOption).getOrElse(3))
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (0 until nRuns).flatMap(_ => runOnce(fn)).sorted
      // median of successful runs; all-failed -> -1 marker
      name -> (if (times.isEmpty) -1.0 else times(times.size / 2))
    }.toMap
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$nRuns,"action":"noop-write","failed":${failed.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
