package graft

import org.apache.spark.sql.SparkSession

/** The one local-session builder shared by every runnable main (Bench,
  * Verify-style dumps, dev tools). Profiler/scale numbers are only
  * comparable to bench numbers if every main runs the same config — keep
  * additions here, not in per-main copies.
  */
object Sessions {

  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** Untimed warmup: session/codegen/scheduler init and parquet footer
    * reads land here, not on whichever query runs first.
    */
  def warmup(spark: SparkSession, sfDir: String): Unit =
    try {
      spark.range(100000).selectExpr("md5(cast(id AS string)) AS h")
        .groupBy().count().collect()
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
        .foreach(t => Tables.table(spark, sfDir, t).limit(1).count())
    } catch { case _: Throwable => () }
}
