package graft

import org.apache.spark.sql.functions._

/** The testdata boundary (round-8 hardening): events.ts type dispatch and
  * the assertSchemas drift report. Round 7 lost 16 queries to a silent
  * testdata regeneration (`ts` INT64-nanos → timestamp[us]) that only
  * surfaced as scattered downstream analysis errors; these pin both the
  * tolerance (every historical ts encoding loads) and the loud failure
  * (a genuinely drifted table reads as one readable line naming it).
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = sys.env.getOrElse("GRAFT_TEST_SF", "/root/testdata/sf0.001")

  test("events.ts normalizes to ms-truncated TIMESTAMP_NTZ from the " +
      "current testdata encoding") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    // ms truncation: no sub-millisecond component survives
    val subMs = ev.select(
      (expr("unix_micros(cast(ts as timestamp)) % 1000")).as("us"))
      .filter(col("us") =!= 0).count()
    assert(subMs == 0, "ts must be millisecond-truncated")
    assert(ev.count() > 0)
  }

  test("events.ts nanos-as-long encoding takes the integer-arithmetic " +
      "path to the same ms truncation") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_long").toString
    // 1.5 ms and 2.999999999 s as nanos → 1 ms and 2.999 s after truncate
    Seq((1L, 1500000L), (2L, 2999999999L))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
      .select(col("event_id"), expr("unix_micros(cast(ts as timestamp))"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1000L, 2L -> 2999000L))
  }

  test("assertSchemas passes on the driver testdata") {
    Tables.assertSchemas(spark, sf)
  }

  test("assertSchemas names a deliberately drifted table and column in " +
      "one readable message") {
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    // order-independence: Tables.table reads events RAW, which needs the
    // nanos-as-long conf against a nanos-generation testdata dir — set it
    // here instead of relying on an earlier test having leaked it into
    // the shared session (ADVICE r8)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // copy the real testdata layout, then corrupt documents: n_chars
    // becomes a string and doc_id disappears
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      if (t == "documents")
        Tables.table(spark, sf, t)
          .select(col("text"), col("lang"), col("source"),
            col("n_chars").cast("string").as("n_chars"))
          .write.parquet(s"$dir/$t.parquet")
      else
        Tables.table(spark, sf, t).limit(1).write.parquet(s"$dir/$t.parquet")
    }
    val e = intercept[IllegalStateException] {
      Tables.assertSchemas(spark, dir)
    }
    assert(e.getMessage.contains("documents.doc_id: missing"))
    assert(e.getMessage.contains("documents.n_chars: type"))
    assert(e.getMessage.contains("FIXTURES.md"))
  }
}
