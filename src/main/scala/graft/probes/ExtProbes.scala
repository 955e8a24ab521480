package graft.probes

import org.apache.spark.sql.{DataFrame, SparkSession}

/** North-star LLM-pipeline extension probes (q27+): dedup family, similarity
  * search, text analysis, multimodal plumbing. Filled incrementally; every
  * SQL-expressible probe carries a DuckDB oracle.
  */
object ExtProbes {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map()
  val oracleSql: Map[String, String] = Map()
}
