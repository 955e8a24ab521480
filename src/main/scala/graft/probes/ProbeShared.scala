package graft.probes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Helpers shared by the probe family objects ([[DedupProbes]],
  * [[AnnProbes]], [[TextProbes]], [[MultimodalProbes]],
  * [[RelationalProbes]], [[IoProbes]]) — split out of the former
  * monolithic ExtProbes so every family can import one definition of the
  * probe signature and the DuckDB word-normalization fragment.
  */
private[probes] object ProbeShared {
  type Q = (SparkSession, String) => DataFrame

  /** Shared normalize/shingle SQL fragment for the DuckDB side. */
  val duckWords =
    "list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '')"

  /** The near-dup probes' planted corpus: every 7th doc gains a mutated
    * copy (id + 100000, text + " zz yy xx") — identically in engine and
    * oracle, so a near-dup probe verifies the operator finds exactly the
    * planted pairs.
    */
  def plantedDocs(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select("doc_id", "text")
    val planted = base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz yy xx")).as("text"))
    base.unionByName(planted)
  }

  /** Temp dir for index-building probes (q122/q127), recursively deleted
    * at JVM exit — a Bench run re-invokes those probes 3×, and bare
    * `createTempDirectory` would leak one parquet index per invocation
    * into /tmp until the machine cleans it.
    */
  def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(p.toFile)
    }))
    p.toString
  }
}
