package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.Archive

/** Partitioned JDBC ingest (OP-7 production path): the reference's
  * `dblink('<dsn>', 'select …')` federated scan becomes
  * `spark.read.jdbc` with range partitioning — N concurrent connections
  * each reading one stride of the key space, instead of one connection
  * streaming everything through the driver.
  *
  * Untestable in this container (no database); the option-building logic is
  * pure and spec-covered, the read call is the one-line standard API.
  */
object Jdbc {

  /** Translate a libpq-style DSN (`hostaddr=x dbname=y user=u …`,
    * db.py:783-788) into a JDBC url + properties. Every parameter other
    * than host/port/dbname passes through as a connection property
    * (pgJDBC understands `sslmode`, `connectTimeout`, `options`, …) —
    * dropping them would silently break SSL-required databases.
    */
  def dsnToJdbc(dsn: String): (String, java.util.Properties) = {
    val kv = Archive.parseDsn(dsn)
    val host = kv.getOrElse("hostaddr", kv.getOrElse("host", "127.0.0.1"))
    val port = kv.getOrElse("port", "5432")
    val db = kv.getOrElse("dbname", "postgres")
    val props = new java.util.Properties()
    (kv -- Seq("hostaddr", "host", "port", "dbname"))
      .foreach { case (k, v) => props.setProperty(k, v) }
    (s"jdbc:postgresql://$host:$port/$db", props)
  }

  /** Range-partitioned read over a numeric key: `numPartitions` parallel
    * scans striding `[lower, upper]` on `partitionColumn`. NOTE Spark's
    * bounds split the key space but do NOT filter rows — everything below
    * `lower` lands in the first partition and everything above `upper` in
    * the last (skewed, not excluded); add a real `WHERE` predicate to the
    * table/query argument to restrict the scan.
    */
  def readPartitioned(spark: SparkSession, dsn: String, table: String,
                      partitionColumn: String, lower: Long, upper: Long,
                      numPartitions: Int): DataFrame = {
    val (url, props) = dsnToJdbc(dsn)
    spark.read
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .jdbc(url, table, props)
  }
}
