package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` keys map 1:1 to SURVEY.md §2.11 probes (Q1–Q26) plus the
  * north-star extension operators (q27+). Every entry with a SQL-expressible
  * semantics also appears in `oracleSql` with IDENTICAL output column names
  * (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    probes.Probes.q25(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    probes.Probes.queries ++ probes.ExtProbes.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    probes.Probes.oracleSql ++ probes.ExtProbes.oracleSql
}
