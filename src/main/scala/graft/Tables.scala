package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central loaders for the driver testdata (TESTDATA.md).
  *
  * All probes read through here so scale-sensitive read settings live in one
  * place. `events.ts` is nanosecond-precision parquet (INT64 TIMESTAMP(NANOS))
  * which Spark cannot read natively; we read it as a long via
  * `spark.sql.legacy.parquet.nanosAsLong` and normalize to a millisecond-
  * truncated TIMESTAMP_NTZ (the determinism rule from SURVEY.md §2.11 — the
  * DuckDB oracle sees `date_trunc('milliseconds', ts)` on its side).
  *
  * NTZ on output everywhere: the oracle compare reads both results as naive
  * timestamps; writing instant-typed (isAdjustedToUTC) parquet would make the
  * engine column tz-aware while the oracle's stays naive.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** events with `ts` normalized to ms-truncated TIMESTAMP_NTZ. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts",
        expr("cast(timestamp_micros((ts div 1000000) * 1000) as timestamp_ntz)"))
  }
}
