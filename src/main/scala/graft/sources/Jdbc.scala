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
    * db.py:783-788) into a JDBC url + properties.
    */
  def dsnToJdbc(dsn: String): (String, java.util.Properties) = {
    val kv = Archive.parseDsn(dsn)
    val host = kv.getOrElse("hostaddr", kv.getOrElse("host", "127.0.0.1"))
    val port = kv.getOrElse("port", "5432")
    val db = kv.getOrElse("dbname", "postgres")
    val props = new java.util.Properties()
    kv.get("user").foreach(props.setProperty("user", _))
    kv.get("password").foreach(props.setProperty("password", _))
    (s"jdbc:postgresql://$host:$port/$db", props)
  }

  /** Range-partitioned read over a numeric key: `numPartitions` parallel
    * scans of `[lower, upper]` strides on `partitionColumn`.
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
